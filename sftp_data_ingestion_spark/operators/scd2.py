"""Type-2 slowly-changing-dimension (SCD2) history builder.

The reference's DW keeps only the latest occurrence per NFe key
(``/root/reference/python/03_upsert_dw_pedidos.py`` ON CONFLICT —
newest-state-wins); SCD2 is the warehouse-native extension a user of
that DW asks for next: the FULL validity history of each key's state,
as ``(key, state..., valid_from, valid_to, is_current)`` rows.

Spark shape: one shuffle on the key (window), everything else stays
in whole-stage codegen:

1. order each key's change log by ``(ts, tiebreak)``;
2. keep only rows where the tracked state DIFFERS from the previous
   row's state (``lag`` — consecutive duplicate states collapse, so a
   heartbeat that re-reports the same state does not fragment
   validity intervals);
3. ``lead(ts)`` over the surviving change points yields each
   interval's exclusive end; the last interval per key is open
   (``valid_to`` NULL, ``is_current`` true).

All three windows share one partitioning (the key), so Catalyst plans
a single exchange. At 100 TB this is the standard one-shuffle
history build; for incremental maintenance, union the new batch with
each key's current open row and re-run steps 1-3 on the touched keys
only (the partition-pruned upsert in ``upsert_partitioned.py`` shows
the bucket-pruning pattern to bound that).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    changelog: DataFrame,
    key: str,
    ts: str,
    state_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Parameters: ``key`` the dimension key; ``ts`` the event/change
    timestamp; ``state_cols`` the tracked attributes (a change in ANY
    of them opens a new interval); ``tiebreak`` orders rows that share
    one timestamp deterministically (required when ``(key, ts)`` is
    not unique — without it, same-ts ordering is pick-one).

    Output: ``key, *state_cols, valid_from, valid_to, is_current``
    with ``valid_to`` = next change's ``ts`` (exclusive) or NULL for
    the open interval.
    """
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    state = F.struct(*[F.col(c) for c in state_cols])
    changed = (
        changelog.withColumn("__prev", F.lag(state).over(w))
        # first row per key (lag NULL) always opens an interval; NULL-
        # safe compare so NULL attribute values are changes too
        .where(
            F.col("__prev").isNull() | ~F.col("__prev").eqNullSafe(state)
        )
        .drop("__prev")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return changed.select(
        key,
        *state_cols,
        F.col(ts).alias("valid_from"),
        F.lead(F.col(ts)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_incremental(
    history: DataFrame,
    batch: DataFrame,
    key: str,
    ts: str,
    state_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Incrementally maintain an SCD2 history with an append-only
    batch: only the keys the batch touches are recomputed; every
    other key's history passes through untouched.

    Correctness contract: each batch row's ``ts`` must be strictly
    greater than the key's current ``valid_from`` frontier (append-
    only per key). Under that contract the result is row-identical to
    ``scd2_from_changelog`` over the full concatenated changelog,
    because the collapsed history's change points preserve the state
    that each appended event is compared against. A LATE event (ts
    inside an existing interval) would need the raw changelog of its
    key — collapse drops heartbeats, and a late insert can resurrect
    a dropped heartbeat as a new change point — so late data must go
    through a touched-key rebuild from the bronze log (same
    partition-pruning shape as ``upsert_partitioned``), not this
    fast path.

    Scale shape: the touched-key set is the BATCH's key set — small
    by construction — so both the semi-join (pick touched history)
    and the anti-join (pass untouched history through) broadcast it,
    and the untouched fraction of a 100 TB history is never shuffled,
    re-sorted, or rewritten. The only shuffle over history data is
    the SCD2 window on the touched keys' rows.
    """
    if tiebreak == ts:
        tiebreak = None  # ordering by ts twice adds nothing; avoids a
        # duplicate column in the replay projection below
    touched = batch.select(key).distinct()
    hist_touched = history.join(F.broadcast(touched), key, "semi")
    hist_untouched = history.join(F.broadcast(touched), key, "anti")
    # re-express touched history as a changelog: each interval's
    # change point (valid_from) re-emits its state. valid_from values
    # are strictly increasing and unique per key, and append-only
    # batches sort strictly after them, so a constant tiebreak is
    # order-exact for the replayed rows.
    replay_cols = [F.col(key), F.col("valid_from").alias(ts)] + [
        F.col(c) for c in state_cols
    ]
    batch_cols = [F.col(key), F.col(ts)] + [F.col(c) for c in state_cols]
    if tiebreak:
        replay_cols.append(
            F.lit(-1).cast(batch.schema[tiebreak].dataType).alias(tiebreak)
        )
        batch_cols.append(F.col(tiebreak))
    changelog = hist_touched.select(*replay_cols).unionByName(
        batch.select(*batch_cols)
    )
    rebuilt = scd2_from_changelog(
        changelog, key=key, ts=ts, state_cols=state_cols, tiebreak=tiebreak
    )
    out_cols = [key, *state_cols, "valid_from", "valid_to", "is_current"]
    return hist_untouched.select(*out_cols).unionByName(
        rebuilt.select(*out_cols)
    )


def pit_lookup(
    dim: DataFrame,
    probes: DataFrame,
    key: str,
    probe_ts: str,
) -> DataFrame:
    """Point-in-time lookup: for each probe row, the SCD2 dimension
    state that was valid AT ``probe_ts`` — the join every fact table
    needs against a versioned dimension ("what was this user's state
    when the event happened?").

    ``dim`` must carry ``valid_from`` / ``valid_to`` (exclusive end,
    NULL = open interval) as produced by :func:`scd2_from_changelog`.
    Probes that predate the key's first interval produce no row
    (inner join): there WAS no state then, and fabricating one would
    be a correctness bug.

    Scale shape: an equi-join on ``key`` with the interval
    containment as a residual filter — Catalyst plans a shuffled hash
    join on the key (or a broadcast join when one side is small), and
    each key's candidate set is its version count, typically a
    handful, so the residual never degenerates toward all-pairs the
    way a pure range join would. At 100 TB this is the standard
    fact-to-SCD2 join; if one hot key accumulates thousands of
    versions, AQE's skew-join split bounds the straggler.
    """
    p = F.col(f"p.{probe_ts}")
    return probes.alias("p").join(
        dim.alias("d"),
        (F.col(f"p.{key}") == F.col(f"d.{key}"))
        & (p >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (p < F.col("d.valid_to"))),
        "inner",
    )


def cdc_apply_changes(
    changelog: DataFrame,
    key: str,
    ts: str,
    op_col: str = "op",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an insert/update/delete change log (``op_col`` in
    {'I','U','D'}) into final table state — the merge-on-read CDC
    apply (the reference's ON CONFLICT upsert is this shape without
    deletes; SURVEY §2.8).

    Latest change per key wins (ordered by ``ts`` then ``tiebreak``);
    keys whose latest op is a delete disappear. One shuffle on the
    key — the same WindowGroupLimit ranking as latest_per_key, with
    the delete filter applied AFTER ranking (a delete followed by a
    re-insert correctly resurrects the key)."""
    order = [F.col(ts).desc()] + (
        [F.col(tiebreak).desc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(op_col) != "D"))
        .drop("__rn", op_col)
    )
