"""The plan-audit utility (`plans.py`) must flag exactly the
pathologies the repo's plan tests pin — proven by constructing each
offense deliberately, and by dogfooding: every bench headline query's
plan must come back clean."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sftp_data_ingestion_spark import plans
from sftp_data_ingestion_spark import queries as q
from sftp_data_ingestion_spark.queries.registry import table

SF = "/root/testdata/sf0.001"


def rules(findings):
    return {f.rule for f in findings}


def test_flags_cartesian(spark):
    a = table(spark, SF, "nation")
    b = table(spark, SF, "region")
    got = plans.audit(a.crossJoin(b))
    assert "nested_loop_join" in rules(got)
    with pytest.raises(ValueError, match="nested_loop_join"):
        plans.assert_clean(a.crossJoin(b))
    # the allow-list is how deliberate broadcast-NL stages opt out
    plans.assert_clean(a.crossJoin(b), allow=("nested_loop_join",))


def test_flags_row_python_udf(spark):
    from pyspark.sql.functions import udf

    squared = udf(lambda x: x * x, T.LongType(), useArrow=False)
    df = table(spark, SF, "nation").select(squared("n_nationkey"))
    assert "python_row_udf" in rules(plans.audit(df))


def test_flags_unpushable_filter(spark):
    # upper() wraps the column -> parquet reader can't take the
    # predicate; every row is decoded then filtered
    df = table(spark, SF, "orders").where(
        F.upper(F.col("o_orderstatus")) == "O"
    )
    assert "filter_not_pushed" in rules(plans.audit(df))


def test_pushed_filter_is_clean(spark):
    df = table(spark, SF, "orders").where(F.col("o_orderstatus") == "O")
    assert "filter_not_pushed" not in rules(plans.audit(df))


def test_counts_shuffles(spark):
    df = table(spark, SF, "orders").groupBy("o_orderpriority").count()
    info = [f for f in plans.audit(df) if f.rule == "shuffle_exchanges"]
    assert info and info[0].detail == "1"


def test_headline_queries_audit_clean(spark):
    """Dogfood: the bench headline set must carry no error-severity
    plan findings (the ANN pair scorers run under their documented
    broadcast-NL allowance)."""
    import bench

    for name in bench.HEADLINE:
        df = q.QUERIES[name](spark, SF)
        plans.assert_clean(df, allow=("nested_loop_join",))


def test_no_unjustified_session_conf_flips_in_query_bodies():
    """Session-global conf mutations inside query bodies are visible
    to concurrent queries on the shared session, so they are allowed
    ONLY where no DataFrame-level lever exists:

    - streaming queries: `spark.sql.shuffle.partitions` fixes the
      state-store partition count at checkpoint creation (a
      session-conf-only knob);
    - recursive CTEs: no repartition hint can be injected into the
      recursion (measured 14% regression without the flip);
    - `nanosAsLong`: an idempotent read-format set (same value
      always, never restored).

    Every batch query must instead rely on AQE coalescing or
    explicit repartition/coalesce. This pins the allowed set — a new
    conf.set in a query body must either move to a DataFrame-level
    shape or be justified here."""
    import ast
    import glob
    import os

    pkg = os.path.join(
        os.path.dirname(__file__), "..", "sftp_data_ingestion_spark",
        "queries",
    )
    allowed = {
        ("q_analytics.py", "z_stream_mv_merge"),       # streaming state
        ("q_corpus.py", "_stream_ingest_admitted"),    # streaming state
        ("q_corpus.py", "z3_recursive_supplier_reach"),  # recursive CTE
        ("q_streaming.py", "_events_stream"),          # nanosAsLong
        ("q_streaming.py", "_drain"),                  # streaming state
        ("q_streaming.py", "st_stream_cms_topk"),      # streaming state
        # the RocksDB state-store provider is a session-conf-only
        # knob (no writeStream option exists for it); the query sets
        # it in a try/finally that restores the previous value
        ("q_streaming.py", "st_rocksdb_exact_dedup"),  # state provider
        # shuffle.partitions fixes the stateful operator's state-store
        # partition count at checkpoint creation (session-conf-only
        # knob, same justification as _drain/_stream_ingest_admitted);
        # set/restored around the drain
        ("q_streaming.py", "st_stream_ingest_stateful"),  # streaming state
        ("q_warehouse.py", "wh_stream_multibatch_counts"),  # streaming
        ("registry.py", "table"),                      # nanosAsLong
    }
    def _is_conf_set(call):
        # Matches real `.conf.set(...)` calls — the receiver may be an
        # attribute chain (spark.conf.set, self.spark.conf.set) OR a
        # bare name that names a conf handle (`c = spark.conf;
        # c.set(...)` — the alias shape a chain-only matcher would
        # miss). Comments/docstrings can't false-positive (AST walk,
        # not grep); a name-aliased handle NOT literally called `conf`
        # would still escape, so this is a best-effort lint, not a
        # proof.
        f = call.func
        if not (isinstance(f, ast.Attribute) and f.attr == "set"):
            return False
        return (
            isinstance(f.value, ast.Attribute) and f.value.attr == "conf"
        ) or (isinstance(f.value, ast.Name) and f.value.id == "conf")

    found = set()
    for path in glob.glob(os.path.join(pkg, "*.py")):
        src = open(path).read()
        tree = ast.parse(src)
        # Map every node to its innermost enclosing function name
        # (module level → "<module>") by walking scopes explicitly.
        def scan(node, scope):
            for child in ast.iter_child_nodes(node):
                child_scope = scope
                if isinstance(
                    child, (ast.FunctionDef, ast.AsyncFunctionDef)
                ):
                    child_scope = child.name
                if isinstance(child, ast.Call) and _is_conf_set(child):
                    found.add((os.path.basename(path), scope))
                scan(child, child_scope)

        scan(tree, "<module>")
    assert found == allowed, (
        f"unexpected conf.set sites: {found - allowed}; "
        f"stale allowance: {allowed - found}"
    )
