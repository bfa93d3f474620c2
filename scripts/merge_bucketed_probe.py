#!/usr/bin/env python
"""A/B the bucketed-DW merge regime at the 100x orders derivation.

`u1_upsert_bucketed` claims the warehouse-side exchange is the merge
cost that a bucketed DW layout deletes. This probe measures it: the
same full-outer policy merge over (A) a plain-parquet DW — both sides
shuffle — and (B) the SAME DW as a k-bucketed catalog table — only
the delta shuffles. The organize-time write is reported separately
(it is paid once per warehouse lay-down, amortized over every later
batch). Auto-broadcast is disabled: at 100 TB neither side fits a
broadcast budget, and at fixture scale AQE would otherwise broadcast
the delta and hide the exchange being measured.

Run after flagship_decompose.py has built /tmp/flagship_100x:
  SPARK_GRAFT_PROBE_COPIES=100 python scripts/merge_bucketed_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from sftp_data_ingestion_spark.operators.bucketed import write_bucketed
from sftp_data_ingestion_spark.operators.merge import upsert_newer_wins
from sftp_data_ingestion_spark.session import get_spark

COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "100"))
DST = f"/tmp/flagship_{COPIES}x"
RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))


def timed(df) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def inputs(spark):
    o = spark.read.parquet(f"{DST}/orders.parquet")
    key = F.col("o_orderkey")
    dw = o.where(key % 2 == 0).select(
        key.cast("string").alias("k"),
        F.col("o_orderdate").alias("ocr"),
        F.col("o_orderstatus").alias("status"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ins"),
        F.col("o_totalprice").cast("decimal(15,2)").cast("string").alias("val"),
    )
    delta = o.where(key % 3 == 0).select(
        key.cast("string").alias("k"),
        (F.col("o_orderdate") + F.expr("INTERVAL 10 DAY")).alias("ocr"),
        F.lit("UPD").alias("status"),
        F.lit("2024-02-01 00:00:00").cast("timestamp").alias("ins"),
        F.col("o_totalprice").cast("decimal(15,2)").cast("string").alias("val"),
    )
    return dw, delta


def merge(dw, delta):
    return upsert_newer_wins(
        dw, delta, key="k", newer_col="ocr",
        newer_wins_cols=("ocr", "status"), greatest_cols=("ins",),
    )


def main() -> None:
    spark = get_spark(app_name="merge-bucketed-probe")
    if not os.path.isdir(DST):
        raise SystemExit(f"run flagship_decompose.py first to build {DST}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    dw, delta = inputs(spark)
    out = {"copies": COPIES, "runs": RUNS, "calib_s": bench._calibrate(spark)}

    # A: plain parquet DW (write once so both regimes read from disk)
    plain_path = f"{DST}/dw_plain.parquet"
    if not os.path.isdir(plain_path):
        dw.write.parquet(plain_path)
    dw_plain = spark.read.parquet(plain_path)
    out["plain_merge_s"] = timed(merge(dw_plain, delta))
    print(f"# plain: {out['plain_merge_s']}s", file=sys.stderr)

    # B: bucketed catalog DW — organize once (timed separately)
    t0 = time.time()
    write_bucketed(dw, "probe_dw_bucketed", "k", 32, f"{DST}/dw_bucketed")
    out["organize_s"] = round(time.time() - t0, 3)
    dw_b = spark.table("probe_dw_bucketed")
    p = merge(dw_b, delta)._jdf.queryExecution().executedPlan().toString()
    out["bucketed_exchanges_on_k"] = p.count("Exchange hashpartitioning(k")
    out["bucketed_merge_s"] = timed(merge(dw_b, delta))
    print(f"# bucketed: {out['bucketed_merge_s']}s "
          f"(organize {out['organize_s']}s)", file=sys.stderr)
    out["calib_post_s"] = bench._calibrate(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
