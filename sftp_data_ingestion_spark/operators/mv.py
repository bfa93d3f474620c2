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
