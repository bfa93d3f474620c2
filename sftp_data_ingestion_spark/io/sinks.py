"""Sinks: bronze append (S8) + file-routing quarantine (S9).

Reference (``/root/reference/python/02_load_stage_pedidos.py``):

* S8 (:179-196): per-file ``COPY ... FROM STDIN`` into all-varchar
  staging — the bulk path. Spark's bulk path is the parquet writer;
  one append per BATCH (not per file: file parallelism lives inside
  the scan, commit granularity is the batch + ledger).
* S9 (:96-105, 212-233): valid + >0 rows -> copy to ``lidos/``;
  invalid/empty/exception -> copy to ``erros/``; name collisions get a
  ``__dup_{ts}`` suffix. Files are COPIED, never removed from
  ``novos/`` — re-processing is prevented by the ledger (S10), which
  this module records alongside the route.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import DataFrame


def append_bronze(df: DataFrame, bronze_path: str) -> None:
    """S8: bulk-append conformed staging rows. Plain parquet append —
    partition by a load-date column upstream when volumes warrant
    partition pruning on bronze."""
    df.write.mode("append").parquet(bronze_path)


def safe_copy(src: str, dst_dir: str, now: datetime | None = None) -> str:
    """Reference ``safe_copy`` (02:96-105): copy preserving metadata,
    suffixing ``__dup_{YYYYmmddHHMMSS}`` on name collision."""
    os.makedirs(dst_dir, exist_ok=True)
    base = os.path.basename(src)
    dst = os.path.join(dst_dir, base)
    if os.path.exists(dst):
        ts = (now or datetime.now(tz=timezone.utc)).strftime("%Y%m%d%H%M%S")
        name, ext = os.path.splitext(base)
        dst = os.path.join(dst_dir, f"{name}__dup_{ts}{ext}")
    shutil.copy2(src, dst)
    return dst


def route_file(path: str, ok: bool, lidos_dir: str, erros_dir: str) -> str:
    """S9 outcome routing; returns the destination path."""
    return safe_copy(path, lidos_dir if ok else erros_dir)


def recover_interrupted_swap(path: str) -> bool:
    """Repair the one non-atomic window of :func:`atomic_swap_parquet`:
    a crash between the two renames leaves ``<path>.old`` holding the
    only copy while ``path`` is missing. MUST be called before reading
    ``path`` by any caller that treats a missing table as "first run"
    — otherwise that caller silently rebuilds from scratch and the
    table history is lost. Returns True when a recovery happened."""
    old = path + ".old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        return True
    return False


def atomic_swap_parquet(df: DataFrame, path: str) -> int:
    """Near-atomic full-table rewrite on plain parquet: write the new
    result to ``<path>.tmp``, rename the old dir aside, swap the temp
    in, drop the old — the Delta-MERGE-commit equivalent when the
    store is a directory. Returns the new row count (one read of the
    freshly-written files, which doubles as a write verification).

    The swap is two renames, so there IS a crash window between them
    where ``path`` is absent and ``<path>.old`` holds the data;
    :func:`recover_interrupted_swap` repairs it and must run before
    any "missing table == first run" read (both CLI upsert and the
    streaming merge do). Stale ``.tmp``/``.old`` leftovers from a
    crashed earlier run are cleared up front so a retry never fails
    the rename into a non-empty directory. Same-session readers must
    ``spark.catalog.refreshByPath`` (done here) because the swap
    happens behind Spark's file-listing cache.
    """
    spark = df.sparkSession
    recover_interrupted_swap(path)
    tmp = path + ".tmp"
    old = path + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    spark.catalog.refreshByPath(path)
    return n


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions the
    batch contains, leave every other partition's files untouched —
    the daily-reprocess write pattern (re-land one day of a
    date-partitioned table without rewriting the year). Uses Spark's
    ``partitionOverwriteMode=dynamic`` so the partition set to
    replace is discovered from the data, not declared; with the
    default STATIC mode the same ``overwrite`` would wipe the whole
    table — the classic footgun this wrapper exists to fence off.
    The conf is set per-write and restored."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)
