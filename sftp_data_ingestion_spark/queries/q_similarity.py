"""Embedding similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F

from sftp_data_ingestion_spark.ext import similarity as sim
from sftp_data_ingestion_spark.queries.registry import query, table

# DuckDB twin of the fold-left dot product: list_dot_product over
# DOUBLE[] (element order matches zip_with+aggregate's left fold).
_COS_SQL = (
    "list_dot_product(a.v, b.v)"
    " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


@query(
    "v_cosine_topk_bruteforce",
    oracle=f"""
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 100),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT query_id, neighbor_id, round(sim_full, 6) AS sim FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_COS_SQL} AS sim_full,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY {_COS_SQL} DESC, b.vec_id ASC
         ) AS rn
  FROM q a, c b WHERE a.vec_id <> b.vec_id
) WHERE rn <= 5
""",
)
def v_cosine_topk_bruteforce(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return sim.cosine_topk(e.where(F.col("vec_id") < 100), e, k=5)


@query(
    "v_centroid_per_label",
    oracle="""
SELECT label, dim, min(x) AS dim_min, max(x) AS dim_max, count(*) AS n
FROM (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS x
  FROM embeddings
) GROUP BY label, dim
""",
)
def v_centroid_per_label(spark, sf_dir):
    """Element-wise per-dimension aggregation over vectors (the
    centroid/bounding-box build shape: explode -> groupBy(label, dim);
    exact min/max values, no float summation)."""
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return (
        e.select("label", F.posexplode(v).alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.min("x").alias("dim_min"),
            F.max("x").alias("dim_max"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_EXACT_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 100),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT query_id, neighbor_id, round(sim_full, 6) AS sim FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_COS_SQL} AS sim_full,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY {_COS_SQL} DESC, b.vec_id ASC
         ) AS rn
  FROM q a, c b WHERE a.vec_id <> b.vec_id
) WHERE rn <= 5
"""


@query("v_srp_ann_topk", oracle=_EXACT_TOPK_ORACLE)
def v_srp_ann_topk(spark, sf_dir):
    """SRP-LSH ANN graded against the EXACT top-k oracle: the
    (n_planes=2, n_tables=16) operating point has empirically-verified
    100% recall on this fixture (natural top-5 sims reach down to
    ~0.3, so per-table collision prob is low and the multi-table union
    does the work — the recall dial production setups use). Candidate
    rescoring is exact, so equality with brute force is the graded
    statement."""
    e = table(spark, sf_dir, "embeddings")
    return sim.srp_topk(
        e.where(F.col("vec_id") < 100), e, k=5, n_planes=2, n_tables=16
    )


@query("v_ivf_ann_topk", oracle=_EXACT_TOPK_ORACLE)
def v_ivf_ann_topk(spark, sf_dir):
    """Inverted-file ANN: mini-k-means coarse centroids, corpus
    bucketed by cell. Graded variant probes ALL cells (nprobe =
    n_cells), which is provably identical to exact search — the full
    assign -> cell-join -> rescore machinery runs under the hash
    oracle. The scale path (nprobe << n_cells, candidate cost ~
    nprobe/n_cells of the corpus) is exercised with recall thresholds
    in tests/test_similarity.py."""
    e = table(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_kmeans(e, k=16, n_iters=2)
    return sim.ivf_topk(
        e.where(F.col("vec_id") < 100), e, cents, k=5, nprobe=16
    )


# Deterministic, engine-portable perturbation: integer-mod pseudo-noise
# (no trig/libm — bit-identical in Spark and DuckDB), amplitude 0.05 ->
# planted pair sims ~0.993 vs natural max ~0.51 on this fixture.
_PLANT_SQL = """
SELECT vec_id, v FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings)
UNION ALL
SELECT vec_id + 100000,
       list_transform(range(64), j -> v[j+1] + 0.05 *
         (CAST(((vec_id*131 + j) * 2654435761) % 1000003 AS DOUBLE)
          / 1000003 - 0.5))
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
"""


@query(
    "v_embedding_near_dup",
    oracle=f"""
WITH u AS ({_PLANT_SQL})
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.9
""",
)
def v_embedding_near_dup(spark, sf_dir):
    """Embedding near-dup over a corpus with PLANTED perturbed
    duplicates (the fixture has no natural high-sim pairs): each
    vector gets a deterministic integer-mod noise copy at sim ~0.993.
    The SRP-bucketed pipeline must find every planted pair at
    threshold 0.9 — (n_planes=8, n_tables=8) has empirically-verified
    100% recall here — and the exact-rescore keeps precision exact,
    so the output equals the all-pairs oracle."""
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    w = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (
            ((F.col("vec_id") * 131 + j) * F.lit(2654435761)) % 1000003
        ).cast("double")
        / 1000003
        - 0.5,
    )
    # perturb BEFORE re-keying: Spark 4 lateral column aliases would
    # resolve the noise lambda's vec_id against the shifted output
    # alias if both lived in one select (observed: constant mod-shift
    # on every element)
    perturbed = e.select(
        "vec_id", F.zip_with(v, w, lambda x, n: x + 0.05 * n).alias("embedding")
    ).select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    planted = e.select("vec_id", v.alias("embedding")).unionAll(perturbed)
    return sim.embedding_near_dup_pairs(
        planted, threshold=0.9, n_planes=8, n_tables=8
    )
