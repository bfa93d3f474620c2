"""Incremental materialized-view maintenance for algebraic aggregates.

The reference recomputes its DW state per batch via upsert
(``/root/reference/python/03_upsert_dw_pedidos.py``); the aggregate
counterpart a warehouse needs is a MATERIALIZED VIEW kept current
without re-scanning history: when a batch arrives, aggregate the
batch alone and MERGE the partial result into the stored state.

This works exactly for the algebraic aggregates — sum, count, min,
max, and anything derivable from them (avg = sum/count) — because
their partial states combine associatively. Holistic aggregates
(median, exact distinct) have no bounded mergeable state; maintain
those with a full recompute or a sketch (the engine's
``g_approx_aggregates`` / bloom / HLL surface), not this operator.

Scale shape: per batch, cost is O(batch) + O(|touched groups|) — the
batch partial-aggregates (map-side combine) to one row per group it
touches, then a single outer merge join against the state on the
group key. The state table never re-scans its history; at 100 TB the
MV update is proportional to the day's data, not the decade's. The
merge join broadcasts the batch partial when the touched-group count
is small (the common case: a day touches few groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: supported algebraic aggregate kinds -> (batch partial, state merge)
_KINDS = ("sum", "count", "min", "max")


def aggregate_batch(
    batch: DataFrame, keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Partial-aggregate one batch into MV-state shape.

    ``specs`` maps each OUTPUT state column to ``(kind, input_col)``
    with kind in {sum, count, min, max}; ``count`` counts non-NULL
    values of ``input_col`` (use a literal-1 column for COUNT(*)).
    """
    aggs = []
    for out, (kind, col) in specs.items():
        if kind not in _KINDS:
            raise ValueError(f"non-algebraic aggregate: {kind}")
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[
            kind
        ]
        aggs.append(fn(col).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def merge_mv_state(
    state: DataFrame,
    batch_partial: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge a batch's partial aggregate into the stored MV state.

    Full-outer on the group key: groups only in the batch appear new,
    groups only in the state pass through, shared groups combine
    per-column — sum/count add (NULL-safe: SQL SUM of an all-NULL
    group is NULL, and NULL + x must yield x, not NULL), min/max take
    least/greatest (which ignore NULLs). The result is
    row-identical to re-aggregating history+batch from scratch for
    every algebraic spec — the invariant the oracle query checks.
    """
    s = state.alias("s")
    b = batch_partial.alias("b")
    cond = None
    for k in keys:
        c = F.col(f"s.{k}").eqNullSafe(F.col(f"b.{k}"))
        cond = c if cond is None else cond & c
    merged = s.join(b, cond, "full_outer")
    out = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"b.{k}")).alias(k) for k in keys
    ]
    for col, (kind, _src) in specs.items():
        sc, bc = F.col(f"s.{col}"), F.col(f"b.{col}")
        if kind in ("sum", "count"):
            expr = F.when(
                sc.isNull() & bc.isNull(), F.lit(None)
            ).otherwise(F.coalesce(sc, F.lit(0)) + F.coalesce(bc, F.lit(0)))
        else:  # min / max ignore NULLs like their SQL aggregates
            expr = F.least(sc, bc) if kind == "min" else F.greatest(sc, bc)
        out.append(expr.alias(col))
    return merged.select(*out)


def apply_cdc(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value: str,
    op_col: str = "op",
    prev_col: str = "prev_value",
    sum_col: str = "total",
    n_col: str = "n",
) -> DataFrame:
    """CDC-aware MV maintenance with RETRACTION: apply an
    insert/update/delete changelog to a (keys..., sum, count) state
    without touching history. Additive aggregates retract exactly —

    * I contributes ``(+value, +1)``;
    * D contributes ``(-prev_value, -1)``;
    * U contributes ``(+value - prev_value, 0)`` —

    so one partial aggregate over the changes yields a per-group
    delta, merged into the state with the same outer-join shape as
    :func:`merge_mv_state`. Groups whose count reaches zero are
    dropped (SQL: an empty group is absent, and its residual
    floating-point sum dust must not survive).

    min/max CANNOT retract (deleting the current max needs the
    runner-up, which the state no longer has) — maintain those by
    recomputing the touched groups from source, the same
    partition-pruned shape as ``scd2_incremental``. That split —
    retract the additive, recompute the extremal — is exactly how
    production MV engines divide the work.
    """
    o = F.col(op_col)
    d_sum = (
        F.when(o == "I", F.col(value))
        .when(o == "D", -F.col(prev_col))
        .otherwise(F.col(value) - F.col(prev_col))
    )
    d_n = F.when(o == "I", F.lit(1)).when(o == "D", F.lit(-1)).otherwise(
        F.lit(0)
    )
    delta = changes.groupBy(*keys).agg(
        F.sum(d_sum).alias(sum_col), F.sum(d_n).alias(n_col)
    )
    s, b = state.alias("s"), delta.alias("b")
    cond = None
    for k in keys:
        c = F.col(f"s.{k}").eqNullSafe(F.col(f"b.{k}"))
        cond = c if cond is None else cond & c
    merged = s.join(b, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"s.{k}"), F.col(f"b.{k}")).alias(k)
            for k in keys
        ],
        (
            F.coalesce(F.col(f"s.{sum_col}"), F.lit(0.0))
            + F.coalesce(F.col(f"b.{sum_col}"), F.lit(0.0))
        ).alias(sum_col),
        (
            F.coalesce(F.col(f"s.{n_col}"), F.lit(0))
            + F.coalesce(F.col(f"b.{n_col}"), F.lit(0))
        ).alias(n_col),
    )
    return merged.where(F.col(n_col) > 0)
