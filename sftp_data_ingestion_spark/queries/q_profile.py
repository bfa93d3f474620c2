"""Data-quality profiling queries (extension surface; the reference
has no profiling step — its quality controls are the header-count gate
and row-level CASE cascades, SURVEY.md §5.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sftp_data_ingestion_spark.operators.profile import profile_columns
from sftp_data_ingestion_spark.queries.registry import query, table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _profile_col_sql(name: str, render: str) -> str:
    return f"""
SELECT '{name}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
       {render.format(v=f"min({name})")} AS min_str,
       {render.format(v=f"max({name})")} AS max_str
FROM orders"""


_PROFILE_ORACLE = " UNION ALL ".join(
    [
        _profile_col_sql("o_orderkey", "CAST({v} AS VARCHAR)"),
        _profile_col_sql("o_custkey", "CAST({v} AS VARCHAR)"),
        _profile_col_sql("o_orderstatus", "CAST({v} AS VARCHAR)"),
        _profile_col_sql("o_orderpriority", "CAST({v} AS VARCHAR)"),
        _profile_col_sql("o_orderdate", "strftime({v}, '%Y-%m-%d %H:%M:%S')"),
    ]
)


@query("g_profile_columns", oracle=_PROFILE_ORACLE)
def g_profile_columns(spark, sf_dir):
    """Per-column quality profile of ``orders`` — null count, exact
    cardinality, native-typed min/max — produced by ONE scan + ONE
    aggregate + inline unpivot (`operators/profile.py`). Timestamps
    render via an explicit format so both engines emit identical
    strings."""
    d = table(spark, sf_dir, "orders")
    return profile_columns(
        d,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            ("o_orderdate", lambda c: F.date_format(c, _TS_FMT)),
        ],
    )


@query(
    "g_drift_chisq",
    oracle="""
WITH med AS (
  SELECT median(event_id) AS m FROM events
), binned AS (
  SELECT CASE WHEN e.event_id < med.m THEN 'ref' ELSE 'cur' END AS half,
         CAST(least(floor(e.value / 10), 9) AS BIGINT) AS bin
  FROM events e, med
  WHERE e.value IS NOT NULL AND e.value >= 0
), counts AS (
  SELECT bin,
         CAST(count(*) FILTER (WHERE half = 'ref') AS DOUBLE) AS n_ref,
         CAST(count(*) FILTER (WHERE half = 'cur') AS DOUBLE) AS n_cur
  FROM binned GROUP BY bin
), tot AS (
  SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts
)
SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       round((n_cur / t_cur - n_ref / t_ref)
             * (n_cur / t_cur - n_ref / t_ref)
             / ((n_ref / t_ref) + 1e-12), 6) AS drift_term
FROM counts, tot
""",
)
def g_drift_chisq(spark, sf_dir):
    """Distribution drift monitor — the data-quality gate a long-lived
    pipeline runs between a reference window and the current one:
    events bucket by value decile-bins, split at the median event id (integer median — exact in both engines, unlike timestamp interpolation),
    and each bin emits its chi-square-style drift term (rational
    arithmetic only, so both engines agree bit-for-bit). Plan: one
    scalar median (broadcast), one scan with a conditional pivot
    aggregation — no join of the two windows."""
    e = table(spark, sf_dir, "events")
    med = e.agg(F.expr("median(event_id)").alias("m"))
    binned = (
        e.where(F.col("value").isNotNull() & (F.col("value") >= 0))
        .crossJoin(F.broadcast(med))
        .select(
            F.when(F.col("event_id") < F.col("m"), "ref").otherwise("cur").alias("half"),
            F.least(F.floor(F.col("value") / 10), F.lit(9)).cast("long").alias("bin"),
        )
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("half") == "ref", 1)).cast("double").alias("n_ref"),
        F.count(F.when(F.col("half") == "cur", 1)).cast("double").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    r = F.col("n_ref") / F.col("t_ref")
    c = F.col("n_cur") / F.col("t_cur")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.round((c - r) * (c - r) / (r + 1e-12), 6).alias("drift_term"),
        )
    )
