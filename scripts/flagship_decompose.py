#!/usr/bin/env python
"""Flagship stage decomposition at a COPIES-x orders derivation.

The flagship (`pedidos_pipeline_flagship`) is staging-derive ->
explode -> 41-expression clean -> dedup window -> NULL-key filter ->
two output casts. NOTE: the flagship contains NO merge stage
(`upsert_newer_wins` lives in `run_upsert_pipeline` and is benched by
`u1_upsert_newer_wins`) — s3 is s2 plus two decimal->double casts, so
any large s3-s2 delta is HOST NOISE by construction (the r11 "+merge
delta" was exactly this). This script times the CUMULATIVE stages at
scale so each round can re-answer "what dominates now?" after a perf
change (r9 cut the cleaning cascade 37.7% at 100x; this is the
harness that says where the next lever is).

Each timing materializes the plan end-to-end with a noop write,
min-of-N in one JVM, with bench._calibrate's fixed CPU anchor printed
alongside so readings are comparable across hosts/sessions. Rounds
are INTERLEAVED across stages (s0,s1,s2,s3, s0,s1,... rather than
s0 x N then s1 x N): a slow-host window then inflates every stage's
round equally instead of biasing whichever stage it landed on — the
r11 decompose's +7.3s s2->s3 "merge delta" was exactly such
between-stage drift (a same-JVM follow-up read s2 = s3).

Run: SPARK_GRAFT_PROBE_COPIES=100 python scripts/flagship_decompose.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from sftp_data_ingestion_spark.operators.clean import clean_staging
from sftp_data_ingestion_spark.operators.pipeline import staging_to_delta
from sftp_data_ingestion_spark.queries.q_pipeline import _flagship_staging
from sftp_data_ingestion_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "100"))
DST = f"/tmp/flagship_{COPIES}x"
RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))

DEFAULT_INS = "2020-01-01 00:00:00"


def build_orders(spark) -> None:
    import shutil

    if os.path.isdir(DST):
        if os.environ.get("SPARK_GRAFT_PROBE_REUSE") == "1":
            return  # reuse a previously-built derivation
        shutil.rmtree(DST)
    os.makedirs(DST)
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    step = orders.agg(F.max("o_orderkey")).first()[0] + 1
    parts = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * step))
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.write.parquet(f"{DST}/orders.parquet")


def timed_once(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    from sftp_data_ingestion_spark import queries as q

    spark = get_spark(app_name="flagship-decompose")
    build_orders(spark)
    ins = F.lit(DEFAULT_INS).cast("timestamp")

    stages = {
        "s0_staging": lambda: _flagship_staging(spark, DST),
        "s1_clean": lambda: clean_staging(
            _flagship_staging(spark, DST), default_insercao=ins
        ),
        "s2_dedup_filter": lambda: staging_to_delta(
            _flagship_staging(spark, DST), default_insercao=ins
        ),
        "s3_full_flagship": lambda: q.QUERIES["pedidos_pipeline_flagship"](
            spark, DST
        ),
    }
    out = {"copies": COPIES, "runs": RUNS, "calib_s": bench._calibrate(spark)}
    dfs = {name: fn() for name, fn in stages.items()}
    best = {name: float("inf") for name in dfs}
    for r in range(RUNS):
        for name, df in dfs.items():
            t = timed_once(df)
            best[name] = min(best[name], t)
            print(f"# round {r} {name}: {round(t, 3)}s", file=sys.stderr)
    for name, v in best.items():
        out[name] = round(v, 3)
    out["calib_post_s"] = bench._calibrate(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
