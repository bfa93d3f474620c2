#!/usr/bin/env python
"""Expression-variant microbench over the 100x flagship derivation.

Times candidate reformulations of the heavy cleaning expressions the
round-11 family profile flagged (`scripts/clean_profile.py`: nfe_uf
3.9 s, dates3 4.5 s, decimals2 3.0 s for 30M rows) so the cascade
rewrite is measured, not guessed. Run after flagship_decompose.py has
built /tmp/flagship_100x.
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
    digits_only,
    nfe_key_44,
    parse_date_multi,
    parse_decimal,
)
from sftp_data_ingestion_spark.queries.q_pipeline import _flagship_staging
from sftp_data_ingestion_spark.session import get_spark

COPIES = int(os.environ.get("SPARK_GRAFT_PROBE_COPIES", "100"))
DST = f"/tmp/flagship_{COPIES}x"
RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
DIGITS = "0123456789"


def timed(df) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def nfe_fastpath(c):
    """translate-gated fast path: pure-digit strings skip the regex."""
    d = F.when(F.translate(c, DIGITS, "") == "", c).otherwise(
        F.regexp_replace(c, r"\D", "")
    )
    return F.when(F.length(d) == 44, d).otherwise(F.lit(None).cast("string"))


def date_probe_dispatch(c):
    """parse_date_multi with structural-probe dispatch instead of
    rlike guards (try_to_timestamp is the validator)."""
    from sftp_data_ingestion_spark.functions.cleaning import (
        DATE_SENTINELS,
        _iso_dispatch,
    )

    t = F.trim(c)
    ln = F.length(t)
    dmy = F.try_to_timestamp(
        F.when(t.contains(" "), t).otherwise(F.concat(t, F.lit(" 00:00:00"))),
        F.lit("dd/MM/yyyy HH:mm:ss"),
    ).cast("date")
    iso = _iso_dispatch(F.replace(t, F.lit("T"), F.lit(" "))).cast("date")
    return (
        F.when(t.isin(*DATE_SENTINELS), F.lit(None).cast("date"))
        .when(
            (F.substring(t, 3, 1) == "/") & ln.isin(10, 19), dmy
        )
        .when(
            (F.substring(t, 3, 1) == "-") & (ln == 10),
            F.try_to_timestamp(t, F.lit("dd-MM-yyyy")).cast("date"),
        )
        .when((F.substring(t, 5, 1) == "-") & ln.isin(10, 16, 19), iso)
        .when(
            (ln == 8) & (F.translate(t, DIGITS, "") == ""),
            F.try_to_timestamp(t, F.lit("yyyyMMdd")).cast("date"),
        )
        .otherwise(F.lit(None).cast("date"))
    )


def decimal_contains_dispatch(c, precision, scale):
    """parse_decimal with a contains()-class dispatch: each
    separator class evaluates only its own guards."""
    t = F.trim(c)
    dt = f"decimal({precision},{scale})"
    f = scale
    has_dot = t.contains(".")
    has_comma = t.contains(",")
    ptbr = F.replace(F.replace(t, F.lit("."), F.lit("")), F.lit(","), F.lit("."))
    enus = F.replace(t, F.lit(","), F.lit(""))
    comma = F.replace(t, F.lit(","), F.lit("."))
    strip_dot = F.replace(t, F.lit("."), F.lit(""))
    strip_comma = F.replace(t, F.lit(","), F.lit(""))
    fallback = F.replace(
        F.replace(F.regexp_replace(c, "[^0-9,.-]", ""), F.lit("."), F.lit("")),
        F.lit(","), F.lit("."),
    ).try_cast(dt)
    mixed = (
        F.when(t.rlike(rf"^[+-]?\d{{1,3}}(\.\d{{3}})+,\d{{1,{f}}}$"), ptbr.try_cast(dt))
        .when(t.rlike(rf"^[+-]?\d{{1,3}}(,\d{{3}})+\.\d{{1,{f}}}$"), enus.try_cast(dt))
        .otherwise(fallback)
    )
    comma_only = (
        F.when(t.rlike(rf"^[+-]?\d+,\d{{1,{f}}}$"), comma.try_cast(dt))
        .when(t.rlike(r"^[+-]?\d{1,3}(,\d{3})+$"), strip_comma.try_cast(dt))
        .otherwise(fallback)
    )
    dot_only = (
        F.when(t.rlike(rf"^[+-]?\d+\.\d{{1,{f}}}$"), t.try_cast(dt))
        .when(t.rlike(r"^[+-]?\d{1,3}(\.\d{3})+$"), strip_dot.try_cast(dt))
        .otherwise(fallback)
    )
    neither = (
        F.when(t.rlike(r"^[+-]?\d+$"), t.try_cast(dt)).otherwise(fallback)
    )
    return (
        F.when(c.isNull() | (t == ""), F.lit(None).cast(dt))
        .when(has_dot & has_comma, mixed)
        .when(has_comma, comma_only)
        .when(has_dot, dot_only)
        .otherwise(neither)
    )


def main() -> None:
    spark = get_spark(app_name="expr-microbench")
    if not os.path.isdir(DST):
        raise SystemExit(f"run flagship_decompose.py first to build {DST}")
    stg = _flagship_staging(spark, DST)

    variants = {
        # --- nfe key: is the double regexp_replace real? ---
        "nfe_digits_only": lambda d: d.select(
            digits_only(F.col("chave_nfe")).alias("a")
        ),
        "nfe_current": lambda d: d.select(
            nfe_key_44(F.col("chave_nfe")).alias("a")
        ),
        "nfe_fastpath": lambda d: d.select(
            nfe_fastpath(F.col("chave_nfe")).alias("a")
        ),
        # --- uf ---
        "uf_current": lambda d: d.select(clean_uf(F.col("uf")).alias("a")),
        "uf_single_regex": lambda d: d.select(
            F.when(
                F.col("uf").rlike(r"^[^A-Za-z]*([A-Za-z][^A-Za-z]*){2,3}$"),
                F.upper(F.regexp_replace(F.col("uf"), "[^A-Za-z]", "")),
            ).alias("a")
        ),
        # --- dates ---
        "dates_current": lambda d: d.select(
            *[
                parse_date_multi(F.col(c)).alias(c)
                for c in ("data_nfe", "data_prev_entrega",
                          "data_prev_entrega_original")
            ]
        ),
        "dates_probe": lambda d: d.select(
            *[
                date_probe_dispatch(F.col(c)).alias(c)
                for c in ("data_nfe", "data_prev_entrega",
                          "data_prev_entrega_original")
            ]
        ),
        # --- decimals ---
        "dec_current": lambda d: d.select(
            parse_decimal(F.col("valor_nfe"), 15, 2).alias("a"),
            parse_decimal(F.col("peso"), 12, 3).alias("b"),
        ),
        "dec_contains": lambda d: d.select(
            decimal_contains_dispatch(F.col("valor_nfe"), 15, 2).alias("a"),
            decimal_contains_dispatch(F.col("peso"), 12, 3).alias("b"),
        ),
    }
    out = {"copies": COPIES, "runs": RUNS, "calib_s": bench._calibrate(spark)}
    for name, fn in variants.items():
        out[name] = timed(fn(stg))
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    out["calib_post_s"] = bench._calibrate(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
