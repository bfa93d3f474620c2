"""Partition-pruned upsert: the 100 TB scale path for U1/J4.

:func:`sftp_data_ingestion_spark.operators.merge.upsert_newer_wins`
is exact reference parity (full-outer join over the whole DW) but
rewrites O(DW) per merge — the known scale-killer when the DW is
100 TB and a delta touches 0.1% of keys. The scale path here keeps the
DW as a hash-bucketed partitioned layout and makes each merge
O(affected buckets):

1. **Layout**: DW parquet partitioned by ``dw_bucket =
   pmod(xxhash64(key), num_buckets)``. The bucket is a pure function
   of the merge key, so every key lives in exactly one partition
   directory and bucket counts are balanced by the hash regardless of
   key skew.
2. **Prune**: the delta's affected buckets (≤ ``num_buckets`` values,
   a driver-safe bounded collect) become a partition-filter on the DW
   scan — Spark reads only those directories (``PartitionFilters`` in
   the scan node), never the other 99.9% of the table.
3. **Merge**: the same three-policy ``upsert_newer_wins`` expression
   set over the pruned subset. Bucket residency never changes on
   update (hash of an unchanged key), so the merged output holds
   exactly the affected buckets, complete.
4. **Swap**: merged buckets are written to a scratch dir and swapped
   into the DW directory-by-directory — untouched buckets' files are
   never read, rewritten, or moved.

On a production cluster the swap step is the job of a transactional
table format (Delta/Iceberg ``MERGE INTO`` with the same policy
expressions); the directory swap here has the same at-least-once
semantics as ``operators/archive.py`` and is documented as such.
Reference parity: ``/root/reference/python/03_upsert_dw_pedidos.py:202-246``
(ON CONFLICT upsert); the bucketing has no reference equivalent —
PostgreSQL's btree index plays that role.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.operators.merge import upsert_newer_wins

BUCKET_COL = "dw_bucket"


def bucket_of(key_col: str, num_buckets: int):
    """Stable bucket id for a key: pure Column expression, JVM-side."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


def write_dw_partitioned(
    dw: DataFrame, path: str, key: str = "chave_nfe", num_buckets: int = 64
) -> None:
    """Materialize the DW in the hash-bucketed layout (one-time)."""
    (
        dw.withColumn(BUCKET_COL, bucket_of(key, num_buckets))
        .repartition(BUCKET_COL)  # one writer wave per bucket, no tiny files
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def read_dw(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned DW without the layout column."""
    return spark.read.parquet(path).drop(BUCKET_COL)


def upsert_partitioned(
    spark: SparkSession,
    dw_path: str,
    delta: DataFrame,
    key: str = "chave_nfe",
    newer_col: str = "data_ultima_ocr",
    newer_wins_cols: Sequence[str] = (),
    greatest_cols: Sequence[str] = (),
    set_once_cols: Sequence[str] = (),
    num_buckets: int = 64,
) -> dict:
    """Merge ``delta`` into the bucketed DW at ``dw_path``, touching
    only the buckets the delta's keys hash into.

    Returns run metrics ``{"buckets_touched", "buckets_total",
    "rows_written"}``. The DW at ``dw_path`` must have been written by
    :func:`write_dw_partitioned` with the same ``key``/``num_buckets``.
    """
    delta = delta.where(F.col(key).isNotNull()).withColumn(
        BUCKET_COL, bucket_of(key, num_buckets)
    )
    # bounded driver collect: at most num_buckets distinct values
    touched = sorted(
        r[0] for r in delta.select(BUCKET_COL).distinct().collect()
    )
    if not touched:
        return {
            "buckets_touched": 0,
            "buckets_total": num_buckets,
            "rows_written": 0,
        }

    # partition-pruned scan: only the touched directories are listed/read
    dw_sub = (
        spark.read.parquet(dw_path)
        .where(F.col(BUCKET_COL).isin(touched))
        .drop(BUCKET_COL)
    )
    merged = upsert_newer_wins(
        dw_sub,
        delta.drop(BUCKET_COL),
        key=key,
        newer_col=newer_col,
        newer_wins_cols=newer_wins_cols,
        greatest_cols=greatest_cols,
        set_once_cols=set_once_cols,
    ).withColumn(BUCKET_COL, bucket_of(key, num_buckets))

    # stage the merged buckets, then swap directories; never overwrite
    # the path being read (classic self-overwrite hazard). Production:
    # Delta/Iceberg MERGE INTO commits this atomically.
    scratch = tempfile.mkdtemp(prefix="dw_upsert_")
    try:
        out = os.path.join(scratch, "out")
        obs = Observation()
        (
            merged.observe(obs, F.count(F.lit(1)).alias("n"))
            .repartition(BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out)
        )
        rows_written = obs.get["n"]  # from the write itself, no re-scan (G1)
        for b in touched:
            part = f"{BUCKET_COL}={b}"
            src, dst = os.path.join(out, part), os.path.join(dw_path, part)
            if not os.path.isdir(src):
                continue  # bucket had no rows after merge (empty delta group)
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            shutil.move(src, dst)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.catalog.refreshByPath(dw_path)
    return {
        "buckets_touched": len(touched),
        "buckets_total": num_buckets,
        "rows_written": rows_written,
    }
