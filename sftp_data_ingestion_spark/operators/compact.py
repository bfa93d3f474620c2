"""Small-file compaction for landing/staging parquet directories.

Every micro-batch append (the reference lands one CSV per SFTP file;
streaming sinks land one file per trigger per partition) accretes
small files, and at scale the file COUNT becomes the bottleneck: open
cost per file, one scan task per file under min-split rules, driver
memory per FileStatus, slow listings. Compaction is the standing
maintenance op every table format runs (Delta OPTIMIZE, Iceberg
rewrite_data_files); this is the plain-parquet form.

Shape: one read of the directory coalesced to ``ceil(total_bytes /
target_bytes)`` output files, written to a scratch directory and
atomically swapped in (same stage-then-swap discipline as
``upsert_partitioned`` — the path being read is never overwritten,
and a crash before the swap leaves the original intact). ``coalesce``
(not ``repartition``) keeps it shuffle-free: output files may vary in
size by input skew, which is exactly the trade OPTIMIZE makes.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files (at least 1). A no-op
    (returning ``{"compacted": False}``) when the directory already
    has fewer than ``min_files`` files or only one output file would
    merely rewrite one input. Returns metrics."""
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(math.ceil(total / target_bytes), 1)
    if len(files) < min_files or n_out >= len(files):
        return {
            "compacted": False,
            "files_before": len(files),
            "bytes": total,
        }
    df = spark.read.parquet(path)
    scratch = tempfile.mkdtemp(prefix="compact_")
    out = os.path.join(scratch, "out")
    try:
        df.coalesce(n_out).write.mode("overwrite").parquet(out)
        old = os.path.join(scratch, "old")
        os.rename(path, old)
        os.rename(out, path)
        shutil.rmtree(old)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    n_after = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    return {
        "compacted": True,
        "files_before": len(files),
        "files_after": n_after,
        "bytes": total,
    }
