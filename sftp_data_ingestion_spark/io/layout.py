"""Clustered (range-sorted) table layout for scan pruning.

At 100 TB the cheapest scan is the one that never happens: parquet
row-group min/max statistics let a filtered scan skip files whose
key range cannot match, but only if the WRITE clustered the data so
key ranges are narrow per file. This module is that write — the
engine's answer to OPTIMIZE ... ZORDER for the single-dimension case
(the reference has no equivalent; PostgreSQL gets the same effect
from CLUSTER/BRIN).

``write_clustered`` range-partitions the frame on the cluster key and
sorts within each partition before writing, so the produced files
hold pairwise-disjoint key ranges: any equality/range predicate on
the key then touches the minimal file set, and parquet's row-group
stats prune within files for free. The swap is atomic via the same
write-aside machinery the compactor uses.

Scale shape: ``repartitionByRange`` samples the key distribution
(one pass) and shuffles once into balanced ranges — skew in the key
lands as more files for the hot range, never as one hot task beyond
the sampler's resolution. The sort is per-partition (spillable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sftp_data_ingestion_spark.io.sinks import atomic_swap_parquet


def clustered(df: DataFrame, cluster_cols: list[str], n_files: int) -> DataFrame:
    """Range-partition + sort a frame so each output file holds a
    disjoint slice of the cluster-key space."""
    return df.repartitionByRange(n_files, *cluster_cols).sortWithinPartitions(
        *cluster_cols
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
) -> int:
    """Rewrite ``path`` (or create it) clustered on ``cluster_cols``
    into ``n_files`` range-disjoint files; returns the row count.
    Atomic: readers see the old layout or the new one, never a mix."""
    return atomic_swap_parquet(clustered(df, cluster_cols, n_files), path)
