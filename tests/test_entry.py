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


def test_registry_orders_unproven_before_proven():
    """The driver grades only the first ~50 registered queries, so the
    registry must report every query lacking a green driver row
    (never graded or graded red in any CORRECTNESS_r*.json) BEFORE
    every query that already has one — otherwise proof budget is spent
    re-proving green rows while the backlog starves."""
    from sftp_data_ingestion_spark.queries import (
        QUERIES,
        _green_in_driver_rows,
    )

    green = _green_in_driver_rows()
    order = list(QUERIES)
    if green and len(green) < len(order):
        first_proven = min(i for i, n in enumerate(order) if n in green)
        last_unproven = max(
            i for i, n in enumerate(order) if n not in green
        )
        assert last_unproven < first_proven, (
            f"unproven query {order[last_unproven]} is registered after "
            f"proven query {order[first_proven]}"
        )


def test_no_complex_typed_outputs(spark, sf_small):
    """The driver's canonicalizer sorts results as a pandas frame;
    Array/Map/Struct cells make ``sort_values`` throw ``unhashable
    type`` (r5: m_extract_features, m_png_decode_histogram). Guard the
    whole registry: every graded column must be scalar. Building the
    DataFrame analyzes the plan without running the query for lazy
    queries; the few eager ones (ANN training, streaming foreachBatch)
    run at sf0.001 where they are sub-second."""
    from pyspark.sql import types as T

    bad = []
    for name, fn in em.queries().items():
        schema = fn(spark, sf_small).schema
        for f in schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            ):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"complex-typed graded outputs: {bad}"


def test_sample_query_runs(spark, sf_small):
    df = em.queries()["w1_latest_event_per_user"](spark, sf_small)
    n = df.count()
    assert n > 0
    # one row per user (U2-style invariant)
    assert df.select("user_id").distinct().count() == n
