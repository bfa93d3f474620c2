"""Header conform: rename / project / gate / lineage (P1, P2, S7, S11).

Reference behavior (``/root/reference/python/02_load_stage_pedidos.py``):

* P1 (:169-173) — strip + de-BOM raw headers, rename via ``DE_PARA``.
* P2 (:174-177) — add missing destination columns as ``""`` (staging's
  missing value is the empty string, not NULL), project to the fixed
  40-column order; unmapped extras are dropped.
* S7 (:163-167) — a file is accepted iff >= 10 raw headers are known.
* S11 (:184) — lineage column ``arquivo_origem`` = source file basename.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.schemas import (
    DE_PARA,
    HEADER_VALID_MIN,
    STG_COLUMNS,
)


def _normalize_header(h: str) -> str:
    return h.strip().replace("﻿", "")


def header_valid(raw_headers: list[str]) -> bool:
    """S7 gate: at least ``HEADER_VALID_MIN`` raw headers map into DE_PARA."""
    return (
        sum(1 for h in raw_headers if _normalize_header(h) in DE_PARA)
        >= HEADER_VALID_MIN
    )


def conform_headers(df: DataFrame) -> DataFrame:
    """P1+P2: rename known raw headers, fill absent staging columns with
    ``""``, project to the fixed staging order (without lineage).

    Header-name work happens on driver-side metadata (``df.columns``),
    so this costs one Project node — no shuffle, no scan amplification.
    """
    renames = {
        c: DE_PARA[_normalize_header(c)]
        for c in df.columns
        if _normalize_header(c) in DE_PARA
    }
    df = df.withColumnsRenamed(renames)
    dest = [c for c in STG_COLUMNS if c != "arquivo_origem"]
    return df.select(
        [
            (F.col(c) if c in df.columns else F.lit("")).alias(c)
            for c in dest
        ]
    )


def with_lineage(df: DataFrame) -> DataFrame:
    """S11: stamp each row with its source file's basename. Uses the
    scan-provided ``input_file_name`` — free, no extra IO."""
    return df.withColumn(
        "arquivo_origem",
        F.element_at(F.split(F.input_file_name(), "/"), -1),
    )
