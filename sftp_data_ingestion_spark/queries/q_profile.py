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
