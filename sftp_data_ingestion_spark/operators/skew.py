"""Skew-mitigation operators: salted two-stage aggregation and salted
broadcast-side join for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles
most skew at runtime; these explicit forms cover the cases AQE cannot:
single hot GROUP BY keys (AQE splits join partitions, not aggregation
groups) and deliberate pre-salting when the hot-key set is known.

Both are pure compositions — the salted aggregate is the classic
partial/final two-stage shape: shuffle on (key, salt) first (uniform),
then a tiny second shuffle on key over num_salts pre-aggregated rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    num_salts: int = 16,
) -> DataFrame:
    """GROUP BY with a salt stage: equivalent to
    ``df.groupBy(keys).agg(count(*), sum(c)...)`` but immune to a
    single hot key saturating one reducer.

    count/sum/min/max re-aggregate losslessly; avg/distinct need the
    partial-state forms (sum+count / two-level distinct) — extend with
    those shapes rather than reusing this one.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(num_salts)).alias(
        "__salt"
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__cnt").alias("n"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join_hot_keys(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 8,
) -> DataFrame:
    """Equi-join where ``facts.key`` is skewed and ``dim`` is small:
    salt the fact side, replicate the dim side across all salts, join
    on (key, salt). The dim replication is a broadcast anyway, so the
    only cost is num_salts x |dim| broadcast rows — and the hot key's
    rows spread over num_salts tasks instead of one.
    """
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(num_salts))
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return (
        salted_facts.join(F.broadcast(replicated_dim), [key, "__salt"])
        .drop("__salt")
    )


def skew_report(
    df: DataFrame,
    keys: Sequence[str],
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Pre-flight skew diagnosis for a planned shuffle on ``keys``:
    one aggregate pass over the key histogram emitting the numbers an
    operator (or a human) needs to pick a mitigation — total rows,
    distinct keys, the hottest key's share, max/avg ratio, and the
    salt factor that would level the hottest key to
    ``target_rows_per_task`` rows per reducer task.

    Two stages, both bounded: the per-key count is one
    map-side-combined groupBy (uniform, the thing being diagnosed is
    not yet shuffled on), and the stats reduce the COUNTED table —
    cost is O(distinct keys), never a second pass over the data. The
    report is what `salted_count_sum` / `salted_join_hot_keys` /
    AQE-skew thresholds consume; at 100 TB you run it on a sample or
    on yesterday's partition and cache the decision."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_key_rows"),
        F.round(F.max("cnt") / (F.sum("cnt") / F.count(F.lit(1))), 6).alias(
            "max_over_avg"
        ),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("hot_key_share"),
        F.ceil(F.max("cnt") / F.lit(target_rows_per_task))
        .cast("long")
        .alias("recommended_salts"),
    )
