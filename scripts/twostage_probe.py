#!/usr/bin/env python
"""Does a two-stage projection stop the gate double-eval?

nfe_key_44 / digits_to_int / strip_digits_to_null reference their
regexp_replace result in both the gate condition and the value;
measured (expr_microbench) the regex runs twice per row. Spark's
CollapseProject refuses to merge projects when a NON-CHEAP alias is
referenced more than once, so select(regex.alias(d)) ->
select(when(len(d)==44, d)) should keep one Project per stage (both
inside one WholeStageCodegen) and evaluate the regex once. Verify on
the plan AND the clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sftp_data_ingestion_spark.queries.q_pipeline import _flagship_staging
from sftp_data_ingestion_spark.session import get_spark

COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "100"))
DST = f"/tmp/flagship_{COPIES}x"
RUNS = 3


def timed(df) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="twostage-probe")
    stg = _flagship_staging(spark, DST)

    d = F.regexp_replace(F.col("chave_nfe"), r"\D", "")
    one_stage = stg.select(
        F.when(F.length(d) == 44, d).alias("chave_nfe")
    )
    two_stage = stg.select(d.alias("_d")).select(
        F.when(F.length("_d") == 44, F.col("_d")).alias("chave_nfe")
    )
    out = {}
    for name, df in [("one_stage", one_stage), ("two_stage", two_stage)]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name + "_regex_count"] = plan.count("regexp_replace")
        out[name + "_s"] = timed(df)
        print(f"# {name}: {out[name + '_s']}s "
              f"(regexp_replace x{out[name + '_regex_count']})",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
