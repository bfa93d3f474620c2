r"""Embedding similarity search over ``array<float>`` columns.

Two paths, same API (north star; SURVEY.md §2.11):

* **Brute-force cosine top-k** — exact baseline: query x corpus join
  with an array-expression dot product (``zip_with`` + ``aggregate``,
  JVM-side, no UDF). O(|Q| x |C|): correct at fixture scale, and the
  right tool whenever |Q| is small (point lookups) even at 100 TB
  corpus size IF combined with a pruning index.
* **LSH-bucketed ANN** — random-hyperplane (SRP) signatures bucket
  both sides; only same-bucket pairs are scored. At 100 TB the
  corpus-side signature+bucket is a one-off shuffle; each query probes
  its bucket(s) — candidate cost ~ bucket size, not corpus size.
  Recall is tunable via (n_planes, n_tables).

The hyperplanes for SRP are generated from a fixed seed with a
splitmix-style integer mix in pure Column expressions, so signatures
are deterministic and identical across runs/engines with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product as fold-left over zip_with — element order fixed,
    so results are bit-deterministic for a given pair."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector (excludes self).

    Output: (query_id, neighbor_id, sim) with rank <= k, sim rounded
    to 6 dp AFTER ranking (ranking uses full precision)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("sim_full"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            "query_id", "neighbor_id", F.round("sim_full", 6).alias("sim")
        )
    )


# ---------------------------------------------------------------------------
# SRP-LSH (random hyperplane) bucketing — the 100 TB ANN path
# ---------------------------------------------------------------------------

_MIX_A = 0x9E3779B97F4A7C15


def _plane_component(plane: int, dim_idx: Column, seed: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    integer mix of (seed, plane, dim) -> scaled double. Pure
    expressions — no RNG state, reproducible anywhere."""
    h = F.xxhash64(F.lit(seed), F.lit(plane), dim_idx)
    return h.cast("double") / F.lit(float(2**63))


def srp_signature(
    vec: Column, n_planes: int = 16, seed: int = 42
) -> Column:
    """Sign pattern of the vector against ``n_planes`` fixed random
    hyperplanes, packed into one long."""
    v = as_double(vec)
    idx = F.sequence(F.lit(0), F.size(v) - 1)
    acc = F.lit(0).cast("long")

    def plane_at(p: int):
        # closure, not a default-arg lambda (which would bind transform's
        # index argument and collapse every plane to the same vector)
        return lambda i: _plane_component(p, i, seed)

    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(v, F.transform(idx, plane_at(p)), lambda x, w: x * w),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return acc


def srp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only same-SRP-bucket pairs. Approximate —
    misses neighbors hashed to other buckets (recall grows as
    n_planes shrinks or with multi-probe). Same output shape as
    :func:`cosine_topk`."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
        srp_signature(F.col(vec_col), n_planes, seed).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        srp_signature(F.col(vec_col), n_planes, seed).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("sim_full"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_full").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim_full", 6).alias("sim"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP buckets (the
    embedding-space analogue of MinHash near-dup)."""
    sig = df.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
        srp_signature(F.col(vec_col), n_planes, seed).alias("bucket"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
