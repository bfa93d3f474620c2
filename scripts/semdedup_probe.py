#!/usr/bin/env python
"""SemDeDup scale probe: the k-proportional regime.

v_semdedup's registered operating point (k=8) is honest at fixture
scale but quadratic if k is held fixed while the corpus grows — the
within-cluster pair stage is sum(c_i^2) ~ n^2/k. The 100 TB regime
(the SemDeDup paper's) scales k with the corpus so cluster size stays
bounded; then the pair stage is linear in n and the ASSIGNMENT stage
(n rows x k centroid dots) becomes the dominant term, growing as
n*k ~ n^2/c. This script measures both stages at sf0.1 and at the 10x
derivation (built by scale_probe.py; reused if present) with k scaled
to hold cluster size ~constant, so the reading names the true growing
term instead of the fixture artifact.

Run AFTER scale_probe.py has built /tmp/spark_graft_sf10x:
    SPARK_GRAFT_PROBE_REUSE=1 python scripts/semdedup_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from sftp_data_ingestion_spark.ext import similarity as sim  # noqa: E402
from sftp_data_ingestion_spark.queries.q_similarity import (  # noqa: E402
    _planted_corpus,
)
from sftp_data_ingestion_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "10"))
BIG = f"/tmp/spark_graft_sf{COPIES}x"
# force a fixed k at both scales (e.g. 64 = the graded coarse
# operating point of v_semdedup_coarse_k64) instead of the k-prop
# regime; unset -> k scales with n
K_FIXED = os.environ.get("SPARK_GRAFT_SEMDEDUP_K")


def probe(spark, sf_dir, k):
    corpus = _planted_corpus(spark, sf_dir).localCheckpoint()
    n = corpus.count()
    t0 = time.time()
    cents = sim.kmeans_train(corpus, k=k, n_iters=2)
    t_train = time.time() - t0

    def best_of2(**kw):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            sim.semdedup_survivors(
                corpus, threshold=0.9, dim=64, centroids=cents, **kw
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    return {
        "n": n,
        "k": k,
        "t_train_s": round(t_train, 3),
        "t_dedup_s": best_of2(),
        # the n*k escape: IVF-style assignment, ~3*sqrt(k) dots/row
        "t_dedup_coarse_s": best_of2(coarse=True, nprobe=2),
    }


def main():
    spark = get_spark(app_name="semdedup-probe")
    calib = bench._calibrate(spark)
    k_small = int(K_FIXED) if K_FIXED else 8
    small = probe(spark, SRC, k=k_small)
    out = {"calib_s": calib, "small": small}
    if os.path.isdir(BIG):
        # fixed-k override, else hold cluster size ~constant
        # (k scales with n)
        k_big = int(K_FIXED) if K_FIXED else max(8, 8 * COPIES)
        out["big"] = probe(spark, BIG, k=k_big)
        out["calib_post_s"] = bench._calibrate(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
