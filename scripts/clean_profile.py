#!/usr/bin/env python
"""Per-expression-family profile of the flagship cleaning cascade.

The round-11 decomposition (`scripts/flagship_decompose.py`, 100x:
s0 4.49 s -> s1 29.90 s) says the 41-expression clean stage adds
~25 s of the flagship's 37.7 s. This harness times the SAME staging
scan with each cleaned-column FAMILY added one at a time (baseline =
staging noop write), so the next lever is measured, not guessed.

Run: SPARK_GRAFT_PROBE_COPIES=100 SPARK_GRAFT_PROBE_REUSE=1 \
       python scripts/clean_profile.py
(reuses the derivation `flagship_decompose.py` already built).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from sftp_data_ingestion_spark.functions.cleaning import (
    clean_uf,
    digits_to_int,
    nfe_key_44,
    null_if_blank,
    parse_date_multi,
    parse_decimal,
    parse_timestamp_multi,
    strip_digits_to_null,
)
from sftp_data_ingestion_spark.operators.clean import (
    DATE_COLS,
    TEXT_COLS,
    _parse_data_insercao,
)
from sftp_data_ingestion_spark.queries.q_pipeline import _flagship_staging
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


def main() -> None:
    spark = get_spark(app_name="clean-profile")
    if not os.path.isdir(DST):
        raise SystemExit(f"run flagship_decompose.py first to build {DST}")
    stg = _flagship_staging(spark, DST)

    families = {
        "dates3": lambda d: d.select(
            *[parse_date_multi(F.col(c)).alias(c) for c in DATE_COLS]
        ),
        "ts2": lambda d: d.select(
            parse_timestamp_multi(F.col("data_ultima_ocr"), True).alias("a"),
            parse_timestamp_multi(
                F.col("chegada_transportadora"), False
            ).alias("b"),
        ),
        "insercao": lambda d: d.select(
            F.coalesce(
                _parse_data_insercao(F.col("data_insercao")),
                F.lit("2020-01-01 00:00:00").cast("timestamp"),
            ).alias("a")
        ),
        "decimals2": lambda d: d.select(
            parse_decimal(F.col("valor_nfe"), 15, 2).alias("a"),
            parse_decimal(F.col("peso"), 12, 3).alias("b"),
        ),
        "digits4": lambda d: d.select(
            digits_to_int(F.col("qtd_volumes")).alias("a"),
            digits_to_int(F.col("cod_cd")).alias("b"),
            strip_digits_to_null(F.col("cnpj_cpf_transportadora")).alias("c"),
            strip_digits_to_null(F.col("cpf_destinatario")).alias("d"),
        ),
        "nfe_uf": lambda d: d.select(
            nfe_key_44(F.col("chave_nfe")).alias("a"),
            clean_uf(F.col("uf")).alias("b"),
        ),
        "text27": lambda d: d.select(
            *[null_if_blank(F.col(c)).alias(c) for c in TEXT_COLS]
        ),
    }
    out = {"copies": COPIES, "runs": RUNS, "calib_s": bench._calibrate(spark)}
    out["baseline_scan"] = timed(stg)
    for name, fn in families.items():
        out[name] = timed(fn(stg))
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    out["calib_post_s"] = bench._calibrate(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
