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
    # Keep the FIRST raw header mapping to each destination; a file that
    # carries two spelling variants of the same logical column (the
    # DE_PARA map folds three variants of "Data Prev. Entrega Original"
    # into one name) must not produce duplicate columns, which would
    # make the projection below fail with AMBIGUOUS_REFERENCE.
    renames: dict[str, str] = {}
    taken: set[str] = set()
    drops: list[str] = []
    for c in df.columns:
        dest_name = DE_PARA.get(_normalize_header(c))
        if dest_name is None:
            continue
        if dest_name in taken:
            drops.append(c)
        else:
            renames[c] = dest_name
            taken.add(dest_name)
    if drops:
        df = df.drop(*drops)
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
    scan-provided ``input_file_name`` — free, no extra IO.

    ``input_file_name()`` yields a percent-encoded URI, so the basename
    is url-decoded to match the reference's ``os.path.basename`` lineage
    (a file named ``relatório 1.csv`` must not surface as
    ``relat%C3%B3rio%201.csv``)."""
    return df.withColumn(
        "arquivo_origem",
        F.url_decode(F.element_at(F.split(F.input_file_name(), "/"), -1)),
    )
