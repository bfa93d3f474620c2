#!/usr/bin/env python
"""Decompose v_ivf_ann_topk's wall into its stages (r13 measure-first):

  a) train_centroids_sample alone (count job + k-row collect)
  b) corpus-side ivf_assign noop (literal-centroid expr engine)
  c) query-side ivf_assign noop (nprobe = n_cells explode)
  d) the full query
  e) full query minus training (centroids passed pre-trained)

Each point is min-of-N warm runs. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F
from sftp_data_ingestion_spark.ext import similarity as sim
from sftp_data_ingestion_spark.queries.registry import table
from sftp_data_ingestion_spark.session import get_spark


def timed(fn, runs=3):
    fn()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ivf-decompose")
    calib = bench._calibrate(spark)
    e = table(spark, sf_dir, "embeddings")
    out = {"calib_s": calib}

    spark.sparkContext.setJobDescription("ivf: train sample")
    out["a_train_sample"] = timed(
        lambda: sim.train_centroids_sample(e, k=16)
    )
    cents = sim.train_centroids_sample(e, k=16)

    spark.sparkContext.setJobDescription("ivf: corpus assign expr")
    out["b_corpus_assign"] = timed(
        lambda: noop(
            sim.ivf_assign(
                e.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
                cents, "embedding", nprobe=1,
            )
        )
    )
    spark.sparkContext.setJobDescription("ivf: query assign expr")
    out["c_query_assign"] = timed(
        lambda: noop(
            sim.ivf_assign(
                e.where(F.col("vec_id") < 100)
                .select(F.col("vec_id").alias("query_id"), "embedding"),
                cents, "embedding", nprobe=16,
            )
        )
    )
    spark.sparkContext.setJobDescription("ivf: full minus training")
    out["e_query_pretrained"] = timed(
        lambda: noop(
            sim.ivf_topk(
                e.where(F.col("vec_id") < 100), e, cents, k=5, nprobe=16
            )
        )
    )
    spark.sparkContext.setJobDescription("ivf: full query")
    out["d_full_query"] = timed(
        lambda: noop(
            sim.ivf_topk(
                e.where(F.col("vec_id") < 100), e,
                sim.train_centroids_sample(e, k=16), k=5, nprobe=16,
            )
        )
    )
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
