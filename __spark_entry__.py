"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual registry lives in ``sftp_data_ingestion_spark.queries``
(one module per operator family); this file is the thin adapter the
driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sftp_data_ingestion_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the stage-3 pedidos slice (41-expression clean ->
    window dedup -> NULL-key gate) over dirty staging rows derived
    from sf0.001 orders."""
    return q.QUERIES["pedidos_pipeline_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + the
    LLM-data extension surface."""
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query; keys absent here (engine-specific
    hashing: MinHash/SimHash/SRP/fingerprint) get rows-only checks."""
    return dict(q.ORACLES)
