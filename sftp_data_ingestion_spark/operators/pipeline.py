"""End-to-end pipeline composition: staging -> typed DW (stage 3).

The reference's stage 3 is ONE SQL statement
(``/root/reference/python/03_upsert_dw_pedidos.py:21-248``): clean the
whole staging table, rank per ``chave_nfe``, keep ``rn = 1`` and
``chave_nfe IS NOT NULL`` (:200-201), then upsert into the typed DW.
This module chains the four operators into that exact shape, so the
whole run is ONE Catalyst plan: Project (clean, codegen'd) -> Window
(single shuffle on ``chave_nfe``) -> Filter -> full-outer Join (second
shuffle, same key — AQE reuses/broadcasts as sizes allow).

Scale notes (SURVEY.md §4.3): exactly two shuffles, both on
``chave_nfe``; the NULL-key filter runs *after* dedup (reference
ordering — NULL-key rows still consume window slots there) but before
the merge join, so NULL keys never hit the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.operators.clean import clean_staging
from sftp_data_ingestion_spark.operators.dedup import dedup_latest_pedidos
from sftp_data_ingestion_spark.operators.merge import upsert_newer_wins
from sftp_data_ingestion_spark.schemas import NEWER_WINS_COLS, SET_ONCE_COLS


def staging_to_delta(
    staging: DataFrame, default_insercao: Column | None = None
) -> DataFrame:
    """clean (P3) -> drop NULL keys (P4) -> dedup latest per key (W1/U3).

    Output: at most one typed row per non-NULL ``chave_nfe`` — the U3
    precondition ``upsert_newer_wins`` requires.

    The NULL-key filter is stated BEFORE the dedup window (the
    reference places it after — ``rn = 1 AND chave_nfe IS NOT NULL``
    over the ranked CTE — but the window partitions by exactly the
    filter key, so dropping whole partitions before or after ranking
    is provably row-identical; pinned against the after-ordered
    oracle). Physically this is the r14 skew audit's NO-OP finding:
    Catalyst already infers and pushes the key filter below the
    Window all the way into the scan (plans/r14/
    pedidos_pipeline_flagship_before.txt node (2) — identical plan
    both orderings), so the one giant NULL/'BAD-KEY' partition (10%
    of fixture rows; the would-be 100 TB straggler, guide §2.5) never
    reaches the window in either form. Stating the filter first makes
    the shape explicit instead of optimizer-inferred — if a future
    non-deterministic column ever blocks the pushdown, the logical
    plan stays skew-safe by construction.
    """
    typed = clean_staging(staging, default_insercao=default_insercao)
    return dedup_latest_pedidos(typed.where(F.col("chave_nfe").isNotNull()))


def run_upsert_pipeline(
    dw: DataFrame,
    staging: DataFrame,
    default_insercao: Column | None = None,
) -> DataFrame:
    """Full stage-3 run: returns the new DW contents.

    Idempotent: re-running with the same staging batch is a no-op
    (newer-wins comparisons are strict ``>``, fill-the-blanks is
    COALESCE, GREATEST of equals is unchanged) — the reference's
    ON CONFLICT semantics (README.md:117-121).
    """
    delta = staging_to_delta(staging, default_insercao=default_insercao)
    return upsert_newer_wins(
        dw,
        delta,
        key="chave_nfe",
        newer_col="data_ultima_ocr",
        newer_wins_cols=NEWER_WINS_COLS,
        greatest_cols=("data_insercao",),
        set_once_cols=SET_ONCE_COLS,
    )
