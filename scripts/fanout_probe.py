#!/usr/bin/env python
"""Measure-first probe (r14): where should the fan_out exchange sit
relative to an Arrow-kernel stage on a few-split scan?

Current shape repartitions BEFORE the kernel (32 sliver batches, 32
Python task round-trips at sf0.1); candidate shape runs the kernel on
the scan's natural splits (one fat batch locally) and spreads AFTER,
which costs the same exchange bytes but crosses the Python boundary
once. At 100 TB both shapes are identical (fan_out no-ops on wide
scans) — this probe quantifies the LOCAL fixed-cost difference only.

Variants, each min-of-N warm noop runs:
  ivf_a  corpus assign, fan_out before kernel (current)
  ivf_b  corpus assign, natural splits, hash-repartition after kernel
  ivf_fa full v_ivf_ann_topk pairing, assign variant a
  ivf_fb full pairing, assign variant b
  cos_a  cosine_topk_arrow with fan_out (current)
  cos_b  cosine_topk_arrow on natural splits
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import Window
from pyspark.sql import functions as F
from sftp_data_ingestion_spark.ext import similarity as sim
from sftp_data_ingestion_spark.queries.registry import table
from sftp_data_ingestion_spark.rebalance import fan_out
from sftp_data_ingestion_spark.session import get_spark


def timed(fn, runs=3):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def ivf_full(e, cents, assign_after):
    dim = 64
    qv = sim.as_double(F.col("embedding"))
    q = sim.ivf_assign(
        e.where(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        cents, "embedding", 16,
    ).select(
        "query_id", qv.alias("qv"),
        sim._checked_norm(qv, dim).alias("qn"), "cell",
    )
    cvec = F.col("__v")
    if assign_after:
        target = e.sparkSession.sparkContext.defaultParallelism
        assigned = sim.kmeans_assign_arrow(
            e.select(F.col("vec_id"), F.col("embedding")),
            cents, "embedding", "vec_id", keep_vec=True,
        ).repartition(target, F.col("id"))
    else:
        assigned = sim.kmeans_assign_arrow(
            fan_out(e).select(F.col("vec_id"), F.col("embedding")),
            cents, "embedding", "vec_id", keep_vec=True,
        )
    c = assigned.select(
        F.col("id").alias("neighbor_id"), cvec.alias("cv"),
        sim._checked_norm(cvec, dim).alias("cn"),
        F.col("cluster_id").alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            sim._pair_sim(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"), dim
            ).alias("sim_full"),
        )
        .withColumn("__nd", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 5)
        .select("query_id", "neighbor_id", F.round("sim_full", 6).alias("sim"))
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fanout-probe")
    calib = bench._calibrate(spark)
    e = table(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_sample(e, k=16)
    out = {"calib_s": calib}

    sc = spark.sparkContext
    sc.setJobDescription("assign arrow, fan_out before (current)")
    out["ivf_a_assign_before"] = timed(lambda: noop(
        sim.kmeans_assign_arrow(
            fan_out(e).select("vec_id", "embedding"),
            cents, "embedding", "vec_id", keep_vec=True,
        )
    ))
    sc.setJobDescription("assign arrow, natural splits + repart after")
    out["ivf_b_assign_after"] = timed(lambda: noop(
        sim.kmeans_assign_arrow(
            e.select("vec_id", "embedding"),
            cents, "embedding", "vec_id", keep_vec=True,
        ).repartition(sc.defaultParallelism, F.col("id"))
    ))
    sc.setJobDescription("ivf full, variant a (current)")
    out["ivf_fa_full_before"] = timed(lambda: noop(
        ivf_full(e, cents, assign_after=False)
    ))
    sc.setJobDescription("ivf full, variant b (after)")
    out["ivf_fb_full_after"] = timed(lambda: noop(
        ivf_full(e, cents, assign_after=True)
    ))

    q = e.where(F.col("vec_id") < 100)
    sc.setJobDescription("cosine arrow, fan_out (current)")
    out["cos_a_fanout"] = timed(lambda: noop(
        sim.cosine_topk_arrow(q, e, k=5)
    ))
    import sftp_data_ingestion_spark.ext.similarity as s2
    real_fan_out = s2.fan_out
    s2.fan_out = lambda df, *k: df
    try:
        sc.setJobDescription("cosine arrow, natural splits")
        out["cos_b_natural"] = timed(lambda: noop(
            sim.cosine_topk_arrow(q, e, k=5)
        ))
    finally:
        s2.fan_out = real_fan_out
    sc.setJobDescription(None)
    out["calib_post_s"] = bench._calibrate(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
