"""Key dedup operators (W1, U3) + generic top-k per group.

Reference: ``row_number() OVER (PARTITION BY chave_nfe ORDER BY
data_ultima_ocr_ts DESC NULLS LAST, data_insercao DESC NULLS LAST)``
then keep ``rn = 1`` (``/root/reference/python/03_upsert_dw_pedidos.py:173-181,200-201``).

Scale notes: one shuffle on the partition keys; AQE's skew handling
splits hot keys. For the common "latest row per key by one ordering"
case, ``max_by``-style aggregation would also work but row_number keeps
exact multi-column NULLS LAST semantics and generalizes to top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int = 1,
) -> DataFrame:
    """Keep the first ``k`` rows per key under ``order_by`` (W1 shape).

    ``order_by`` columns should make the ordering explicit about NULLs,
    e.g. ``F.col("ts").desc_nulls_last()`` — PG's ``DESC NULLS LAST``
    spelled out (Spark's ``desc()`` already defaults to NULLS LAST, but
    intent beats defaults).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def dedup_latest_pedidos(df: DataFrame) -> DataFrame:
    """The exact reference dedup: latest occurrence per ``chave_nfe``."""
    return latest_per_key(
        df,
        ["chave_nfe"],
        [
            F.col("data_ultima_ocr").desc_nulls_last(),
            F.col("data_insercao").desc_nulls_last(),
        ],
    )
