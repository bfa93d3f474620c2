"""Scan-parallelism rebalancing for CPU-heavy stages.

At warehouse scale a parquet scan yields at least one split per core
(128 MB splits over TBs of input), so per-row expression work
parallelizes for free and adding an exchange would be pure cost. Small
inputs break that assumption: a single-row-group file plans as ONE
partition, and everything until the first shuffle — shingle explosion,
SRP/IVF assignment, a 41-expression cleaning projection — serializes
on one core no matter how many the cluster has. Splits cannot go below
row-group boundaries, so ``spark.sql.files.maxPartitionBytes`` cannot
fix this (measured: 4 MB splits still planned only 6 partitions over
the sf0.1 fixtures).

:func:`fan_out` closes the gap adaptively: it is a NO-OP whenever the
planned partition count already reaches ``defaultParallelism`` (the
100 TB case), and otherwise inserts one repartition so the downstream
compute stage uses every core. When the caller names key columns the
exchange is hash-partitioned on them, so a downstream groupBy / window
on the same keys satisfies its required distribution from this
exchange instead of adding another — the rebalance then costs zero
extra shuffles over the plan Catalyst would have produced anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread a few-split frame across all cores before per-row-heavy
    work; no-op when the scan already provides enough partitions.

    With ``key_cols``, hash-partitions on them (downstream groupBy /
    window on the same keys reuses the exchange); without, round-robin.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
