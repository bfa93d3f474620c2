"""Robust JSON-lines source: permissive parse + corrupt-row routing.

The reference's ingestion hardening is CSV-shaped (separator sniff,
ragged repair — ``io/csv_robust.py``); JSONL is the other wire format
a landing zone receives, and the same contract applies: NEVER fail
the batch on bad rows — parse what parses, quarantine the rest with
enough context to reprocess (the S9 ok/err routing, reference
``python/01_ingest_sftp_pedidos.py`` error directory).

Design: a TEXT scan + ``from_json`` per line, NOT the native JSON
file source. The native source refuses any query whose pruned
required schema is only the corrupt-record column
(QUERY_ONLY_CORRUPT_RECORD_COLUMN) — which is exactly what an err-side
``count()`` or quarantine write prunes down to, making the split
fragile. With text+from_json the raw line is a real column, every
projection is legal, the same Jackson parser does the work inside
whole-stage codegen, and the scan still parallelizes per file split.
The trade: per-file schema pruning inside Jackson is lost — harmless
for landing-zone ingestion, which reads every declared field anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_COL = "_raw_line"


def read_jsonl_robust(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Permissive JSONL scan: returns the declared columns plus
    ``_raw_line`` (always populated) with parse state recoverable per
    row — a row is corrupt iff every declared field is NULL while its
    raw line is non-blank, or any field failed to cast
    (``from_json`` PERMISSIVE semantics). Use :func:`route_jsonl` for
    the explicit ok/err split."""
    corrupt = "__corrupt"
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt, T.StringType())]
    )
    parsed = (
        spark.read.text(path)
        .where(F.length(F.trim(F.col("value"))) > 0)  # skip blank lines
        .select(
            F.col("value").alias(RAW_COL),
            F.from_json(
                F.col("value"),
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
            ).alias("__j"),
        )
    )
    return parsed.select(
        RAW_COL,
        *[F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields],
        F.col(f"__j.{corrupt}").isNotNull().alias("__is_corrupt"),
    )


def route_jsonl(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a :func:`read_jsonl_robust` frame into (ok, err): ok rows
    carry the declared columns; err rows carry the raw line for the
    quarantine file. Both sides are plain projections — count, write,
    or re-aggregate them freely."""
    ok = df.where(~F.col("__is_corrupt")).drop(RAW_COL, "__is_corrupt")
    err = df.where(F.col("__is_corrupt")).select(
        F.col(RAW_COL).alias("raw_line")
    )
    return ok, err
