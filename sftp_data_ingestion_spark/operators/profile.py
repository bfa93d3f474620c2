"""Column profiling: per-column data-quality stats in ONE scan.

The pre-merge quality report a pipeline runs over staged data (null
rates, cardinalities, value ranges) — extension surface; the reference
has no profiling step (its quality gates are the header count and the
row-level CASE cascades, SURVEY.md §5.1).

Scale shape: a single aggregate over one scan produces every stat,
then an ``inline`` unpivot emits one row per profiled column — no
per-column scans, no shuffle beyond the one global aggregation.
Exact ``count_distinct`` over several columns plans as Spark's Expand
(input rows x profiled columns before partial aggregation) — the
standard multi-distinct shape; at 100 TB swap
``approx_count_distinct`` in via ``exact_distinct=False`` and the
Expand disappears (HLL sketches merge map-side instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Render = Callable[[Column], Column]


def _str(c: Column) -> Column:
    return c.cast("string")


def profile_columns(
    df: DataFrame,
    cols: list[str | tuple[str, Render]],
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` of ``df`` in one pass.

    Output: one row per column — ``(column_name, n_rows, n_nulls,
    n_distinct, min_str, max_str)``. min/max are computed on the
    NATIVE type (so numeric/date ordering, not lexicographic) and
    rendered to string afterwards; pass ``(name, render)`` to control
    the rendering (e.g. ``date_format`` for timestamps), default is a
    plain string cast. ``n_distinct`` excludes NULLs (SQL
    ``count(DISTINCT ...)`` semantics).
    """
    spec: list[tuple[str, Render]] = [
        (c, _str) if isinstance(c, str) else c for c in cols
    ]
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for name, render in spec:
        c = F.col(name)
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"__nulls_{name}"),
            distinct(c).alias(f"__dist_{name}"),
            render(F.min(c)).alias(f"__min_{name}"),
            render(F.max(c)).alias(f"__max_{name}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__nulls_{name}").alias("n_nulls"),
                F.col(f"__dist_{name}").alias("n_distinct"),
                F.col(f"__min_{name}").alias("min_str"),
                F.col(f"__max_{name}").alias("max_str"),
            )
            for name, _ in spec
        ]
    )
    return wide.select(F.inline(rows))
