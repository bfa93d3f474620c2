#!/usr/bin/env python
"""Targeted per-query timing: bench.py's exact methodology (noop sink,
warm pass then min-of-N) for an arbitrary subset of registry queries —
the measure-first loop of an optimization round without paying for the
whole headline set.

    python scripts/time_queries.py [--sf DIR] [--runs N] q1 q2 ...

Prints one JSON line {"calib_s", "queries": {name: best_s}, "runs"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from sftp_data_ingestion_spark import queries as q
from sftp_data_ingestion_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-calib", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="time-queries")
    calib = None if args.no_calib else bench._calibrate(spark)
    out = {}
    for name in args.names:
        fn = q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
    print(json.dumps(
        {"calib_s": calib, "queries": out, "runs": args.runs, "sf": args.sf}
    ))


if __name__ == "__main__":
    main()
