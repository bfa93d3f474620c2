#!/usr/bin/env python
"""Decompose v_cosine_topk_bruteforce's wall (r13 VERDICT #7
measure-first):

  a) corpus scan + norm projection alone (no pairs)
  b) pair scoring without the top-k window (broadcast-NL + dot)
  c) the full expression-engine query (as benched)
  d) the Arrow/BLAS kernel end-to-end (cosine_topk_arrow)

Min-of-N warm runs in one JVM, interleaved rounds. One JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from sftp_data_ingestion_spark.ext import similarity as sim
from sftp_data_ingestion_spark.queries.registry import table
from sftp_data_ingestion_spark.session import get_spark

RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cosine-decompose")
    calib = bench._calibrate(spark)
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 100)

    def scored_no_window():
        dim = 64
        qs = sim._norm_side(q, "vec_id", "embedding", "query_id", "qv", "qn", dim)
        c = sim._norm_side(
            sim.fan_out(e), "vec_id", "embedding", "neighbor_id", "cv", "cn", dim
        )
        return (
            F.broadcast(qs).crossJoin(c)
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                sim._pair_sim(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"), dim
                ).alias("sim_full"),
            )
        )

    stages = {
        "a_norm_scan": lambda: noop(
            sim._norm_side(
                sim.fan_out(e), "vec_id", "embedding", "neighbor_id", "cv", "cn", 64
            )
        ),
        "b_pairs_no_topk": lambda: noop(scored_no_window()),
        "c_full_expr": lambda: noop(sim.cosine_topk(q, e, k=5, dim=64)),
        "d_full_arrow": lambda: noop(sim.cosine_topk_arrow(q, e, k=5)),
    }

    out = {"calib_s": calib, "runs": RUNS}
    best = {k: float("inf") for k in stages}
    for k, fn in stages.items():
        spark.sparkContext.setJobDescription(f"warm {k}")
        fn()
    for _ in range(RUNS):
        for k, fn in stages.items():
            spark.sparkContext.setJobDescription(k)
            t0 = time.time()
            fn()
            best[k] = min(best[k], time.time() - t0)
    out.update({k: round(v, 3) for k, v in best.items()})
    out["calib_post_s"] = bench._calibrate(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
