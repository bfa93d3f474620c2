"""Driver-contract smoke tests: entry() + registry integrity."""

import __spark_entry__ as em


def test_registry_shape():
    qs, oracles = em.queries(), em.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)          # every oracle has a query
    assert len(oracles) >= 35               # strong-oracle coverage
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_smoke(spark):
    df = em.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "chave_nfe" in df.columns


def test_sample_query_runs(spark, sf_small):
    df = em.queries()["w1_latest_event_per_user"](spark, sf_small)
    n = df.count()
    assert n > 0
    # one row per user (U2-style invariant)
    assert df.select("user_id").distinct().count() == n
