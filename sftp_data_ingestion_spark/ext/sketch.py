"""Count-min sketch — mergeable approximate counting.

Heavy-hitter detection over a 100 TB event/token stream cannot afford
an exact per-key groupBy when the key space is unbounded; the classic
answer is a count-min sketch (Cormode & Muthukrishnan 2005): a
``depth x width`` grid of counters, each row indexed by an
independent hash, estimate = min over rows. The sketch is a pure
sum-monoid, so Spark builds it with ONE map-side-combined groupBy on
``(row, col)`` — the shuffled intermediate is at most
``depth * width`` rows PER PARTITION regardless of input size, and
the merged sketch is ``depth * width`` rows total (a few KB), the
same reduction shape a real streaming CMS uses.

Hashes are Knuth/xxhash-style multiplicative primes over a
magnitude-bounded key — plain 64-bit integer arithmetic that is
bit-identical in Spark, DuckDB, and any other engine (no engine
hash() builtin, which would not be portable), and can never overflow:
``key_mod < 2^20`` and ``prime < 2^32`` keep every product under
``2^52`` (DuckDB raises on BIGINT overflow where Java silently
wraps, so staying in-range is correctness, not style).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# public multiplicative-hash constants (Knuth 2654435761; xxhash primes)
CMS_PRIMES = (2654435761, 2246822519, 3266489917, 668265263)
_KEY_MOD = 1000003  # prime; bounds products far below 2^63


def cms_col(key: Column, prime: int, width: int) -> Column:
    """Row-``prime``'s column index for ``key`` — portable integer
    arithmetic, identical in any engine with 64-bit ints. Negative
    keys map to negative "columns": both Spark and DuckDB keep the
    dividend's sign for ``%``, so the buckets stay consistent across
    engines (they are hash buckets, not array offsets — a negative
    label is as good as a positive one)."""
    return ((key % _KEY_MOD) * F.lit(prime)) % F.lit(2**31) % F.lit(width)


def cms_cells(
    df: DataFrame, key_col: str, width: int = 64, depth: int = 4
) -> DataFrame:
    """One ``(row, col)`` cell per key occurrence per hash row — the
    pre-aggregation form. This is what a streaming maintainer feeds
    its per-batch partial count (see ``st_stream_cms_topk``); batch
    callers want :func:`cms_build`, which reduces it."""
    if depth > len(CMS_PRIMES):
        raise ValueError(f"depth <= {len(CMS_PRIMES)} supported")
    key = F.col(key_col)
    cells = F.array(
        *[cms_col(key, p, width) for p in CMS_PRIMES[:depth]]
    )
    return df.where(key.isNotNull()).select(
        F.posexplode(cells).alias("row", "col")
    )


def cms_build(
    df: DataFrame, key_col: str, width: int = 64, depth: int = 4
) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` with one occurrence
    counted per input row. One shuffle of <= depth*width rows per
    map partition (map-side combine does the heavy reduction)."""
    return (
        cms_cells(df, key_col, width, depth)
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate each key in ``keys`` against ``sketch``:
    min over the depth row counters. The sketch side is depth*width
    rows — always broadcast — so the probe never shuffles. Estimates
    are >= the true count by construction (one-sided error).

    The sketch is stored sparsely (empty cells have no row), so the
    probe LEFT-joins and treats an absent cell as 0 — a key the
    sketch never saw estimates 0, the canonical CMS answer for the
    membership/frequency-filter use case (an inner join would either
    drop such keys or, worse, min only over their colliding cells)."""
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(*[cms_col(key, p, width) for p in CMS_PRIMES[:depth]])
        ).alias("row", "col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_col_sql(key_expr: str, prime: int, width: int) -> str:
    """The ANSI-SQL twin of :func:`cms_col`, for building oracles."""
    return f"((({key_expr} % {_KEY_MOD}) * {prime}) % {2**31}) % {width}"


def cms_topk_oracle_sql(
    key: str = "user_id",
    source: str = "SELECT user_id FROM events WHERE user_id IS NOT NULL",
    width: int = 64,
    depth: int = 4,
    k: int = 20,
    include_overestimate: bool = False,
) -> str:
    """One oracle builder for every CMS top-k grading query (batch
    ``z2_cms_heavy_hitters`` and streaming ``st_stream_cms_topk``
    share it), so the hashing scheme, width/depth, and tie-break can
    never drift between the batch and streaming oracles."""
    hash_rows = " UNION ALL ".join(
        f"SELECT {i} AS row, {cms_col_sql(key, p, width)} AS col,"
        f" {key} FROM evt"
        for i, p in enumerate(CMS_PRIMES[:depth])
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {i} AS row, {cms_col_sql(key, p, width)} AS col,"
        f" {key}, exact_cnt FROM topk"
        for i, p in enumerate(CMS_PRIMES[:depth])
    )
    over = (
        f",\n       e.cms_est >= t.exact_cnt AS overestimate"
        if include_overestimate
        else ""
    )
    return f"""
WITH evt AS ({source}),
hashed AS ({hash_rows}),
sketch AS (SELECT row, col, COUNT(*) AS cnt FROM hashed GROUP BY row, col),
exact AS (SELECT {key}, COUNT(*) AS exact_cnt FROM evt GROUP BY {key}),
topk AS (
  SELECT {key}, exact_cnt FROM (
    SELECT {key}, exact_cnt,
           row_number() OVER (ORDER BY exact_cnt DESC, {key}) AS rn
    FROM exact
  ) WHERE rn <= {k}
),
probes AS ({probe_rows}),
est AS (
  SELECT p.{key}, MIN(s.cnt) AS cms_est
  FROM probes p JOIN sketch s ON p.row = s.row AND p.col = s.col
  GROUP BY p.{key}
)
SELECT t.{key}, t.exact_cnt, e.cms_est{over}
FROM topk t JOIN est e ON t.{key} = e.{key}
"""
