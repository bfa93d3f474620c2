#!/usr/bin/env python
"""curation_e2e stage decomposition (r12 VERDICT #2).

curation_e2e is the most expensive headline query (~23% of bench wall)
and the only one that was never stage-profiled. This times its
CUMULATIVE stages — s0 quality gate -> s1 near-dup survivors (incl.
the survivor localCheckpoint) -> s2 decontaminate -> s3 token budget
-> s4 pack+account — at sf0.1 and (with SPARK_GRAFT_PROBE_REUSE=1 and
a built scale_probe dir) the COPIES-x derivation, so the round can
name the dominating stage instead of guessing.

Probe discipline (PERFORMANCE.md / flagship_decompose.py): rounds are
INTERLEAVED across stages, per-stage result is the min over warm
rounds (cold round 0 discarded), calibration anchors bracket the run.
NOTE: each stage timing re-COMPOSES the pipeline prefix (calling
_curation_stages), so s1+ timings include the survivor-checkpoint
materialization — deliberately: that is what the composed query pays.

Run: python scripts/curation_decompose.py
     SPARK_GRAFT_PROBE_REUSE=1 python scripts/curation_decompose.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from sftp_data_ingestion_spark.queries.q_text import (  # noqa: E402
    _curation_stages,
)
from sftp_data_ingestion_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "10"))
BIG = f"/tmp/spark_graft_sf{COPIES}x"
ROUNDS = int(os.environ.get("SPARK_GRAFT_CURATION_ROUNDS", "4"))
STAGES = ["s0_gate", "s1_neardup", "s2_decontaminate", "s3_budget", "s4_pack"]


def probe(spark, sf_dir):
    best: dict[str, float] = {}
    for rnd in range(ROUNDS):
        for name in STAGES:
            t0 = time.time()
            frame = _curation_stages(spark, sf_dir, upto=name)[name]
            frame.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if rnd > 0:
                best[name] = min(best.get(name, float("inf")), dt)
    return {name: round(best[name], 3) for name in STAGES}


def main():
    spark = get_spark(app_name="curation-decompose")
    out = {"calib_pre_s": bench._calibrate(spark), "small": probe(spark, SRC)}
    if os.path.isdir(BIG):
        out["big"] = probe(spark, BIG)
    out["calib_post_s"] = bench._calibrate(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
