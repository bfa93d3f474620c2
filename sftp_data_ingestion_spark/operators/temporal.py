"""Temporal join operators Spark lacks as built-ins: as-of join and
interval/range join (SURVEY §2.3 notes the reference has none; these
are engine extensions a time-series user expects — expressed as
compositions of existing DataFrame ops, option (a) of the custom-
operator ladder, so Catalyst still optimizes them).

Scale design:

* ``asof_join`` — the generic form is a key-equi join with a range
  predicate + keep-latest window. Spark executes the equi part as a
  shuffled hash/sort-merge join on the key; the range predicate
  filters within key groups, and WindowGroupLimit caps the per-row
  candidate set. For billion-row x billion-row workloads add
  ``tolerance`` (bounds candidates to a time bucket) — with a
  tolerance the join adds a coarse time-bucket equi key, which turns
  the blowup-prone within-key cross product into bucket-local work:
  the standard "bin the time axis" trick.
* ``range_join_overlap`` — interval overlap via the same bucketing:
  each interval replicates to the buckets it spans (explode), the
  probe side joins on its bucket, exact predicate re-checked after.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UNIT_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3600 * 1_000_000,
    "day": 86400 * 1_000_000,
}


def _interval_micros(interval: str) -> int:
    m = re.fullmatch(r"\s*(\d+)\s+(second|minute|hour|day)s?\s*", interval)
    if not m:
        raise ValueError(f"unsupported interval: {interval!r}")
    return int(m.group(1)) * _UNIT_US[m.group(2)]


def _bucket(c: Column, interval: str) -> Column:
    """Floor a timestamp to its interval bucket start. Plain integer
    arithmetic — usable anywhere in a plan, unlike ``F.window`` which
    is restricted to grouping positions (and to one per plan)."""
    us = _interval_micros(interval)
    return F.timestamp_micros(
        (F.unix_micros(c) - F.pmod(F.unix_micros(c), F.lit(us))).cast("long")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``on`` <= left.``on`` (direction='backward'; 'forward' = smallest
    >=), matching on optional ``by`` keys — pandas.merge_asof
    semantics, DuckDB ``ASOF JOIN`` semantics, distributed.

    ``tolerance`` (e.g. "1 hour") drops matches farther than the given
    interval AND bounds the join's candidate set via time-bucket equi
    keys, which is what makes the plan scale-safe.
    """
    by = list(by or [])
    lid = "__asof_lid"
    l = left.withColumn(lid, F.monotonically_increasing_id())
    rsel = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    ron = f"{right_prefix}{on}"

    join_keys: list[Column] = [
        F.col(c) == F.col(f"{right_prefix}{c}") for c in by
    ]
    if direction == "backward":
        range_pred = F.col(ron) <= F.col(on)
        order = F.col(ron).desc()
    elif direction == "forward":
        range_pred = F.col(ron) >= F.col(on)
        order = F.col(ron).asc()
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    conds = join_keys + [range_pred]
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            conds.append(F.col(ron) >= F.col(on) - iv)
        else:
            conds.append(F.col(ron) <= F.col(on) + iv)
        # coarse time-bucket equi key: candidates confined to the
        # bucket pair (b, b-1) — makes the equi-join side selective
        bucket_l = _bucket(F.col(on), tolerance)
        bucket_r = _bucket(F.col(ron), tolerance)
        shift = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            bucket_pred = (bucket_r == bucket_l) | (bucket_r == bucket_l - shift)
        else:
            bucket_pred = (bucket_r == bucket_l) | (bucket_r == bucket_l + shift)
        conds.append(bucket_pred)

    joined = l.join(rsel, _and_all(conds), "left")
    w = Window.partitionBy(lid).orderBy(order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", lid)
    )


def _and_all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def range_join_overlap(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_point: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Join right POINTS into left INTERVALS (start <= point < end).

    Scale path: intervals explode to every time bucket they span;
    points join their bucket (equi shuffle), exact predicate re-checked
    — bucket-local work instead of a broadcast-nested-loop range join.
    """
    lb = F.sequence(
        _bucket(F.col(left_start), bucket),
        _bucket(F.col(left_end), bucket),
        F.expr(f"INTERVAL {bucket}"),
    )
    lx = left.withColumn("__bucket", F.explode(lb))
    rx = right.withColumn("__bucket", _bucket(F.col(right_point), bucket))
    exact = (F.col(right_point) >= F.col(left_start)) & (
        F.col(right_point) < F.col(left_end)
    )
    return lx.join(rx, ["__bucket"]).where(exact).drop("__bucket")
