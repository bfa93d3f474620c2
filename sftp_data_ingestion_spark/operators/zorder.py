"""Z-order (Morton) interleaved sort keys for multi-column data skipping.

Range-partitioning + sorting a table on ONE column gives parquet
row-group min/max stats that prune scans filtered on that column —
and nothing else. Interleaving the bits of two (or more) columns into
a single Morton key before the range sort spreads locality across ALL
interleaved dimensions: a box predicate on any subset of them touches
a bounded set of z-ranges, so min/max skipping keeps working for
multi-dimensional filters. This is the layout trick behind
Delta/Iceberg ``ZORDER BY``; here it is a pure Column expression
(16 shift-mask-or terms per column, whole-stage codegen) plus the
standard ``repartitionByRange(zkey).sortWithinPartitions(zkey)``
write pattern.

Scale note: the z-key is computed per row in the write path only —
readers never see it (drop it after layout). Quantize skewed columns
to their rank/bucket first if value ranges are wildly uneven; the
interleave assumes both inputs use their low ``bits`` meaningfully.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1. Pure integer
    Column arithmetic — replayable in any SQL dialect."""
    xx = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    yy = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = (
            acc
            + F.shiftleft(F.shiftright(xx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return acc


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16
) -> DataFrame:
    """Lay ``df`` out in z-order on (x_col, y_col): range-partition on
    the Morton key, sort within partitions, key dropped. Writing the
    result to parquet yields row-group min/max stats that skip for box
    predicates on either or both columns."""
    z = "__zkey"
    return (
        df.withColumn(z, z_value(F.col(x_col), F.col(y_col), bits))
        .repartitionByRange(F.col(z))
        .sortWithinPartitions(z)
        .drop(z)
    )
