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


@query("v_srp_ann_topk")  # rows-only (bucketing uses engine-specific hash)
def v_srp_ann_topk(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return sim.srp_topk(e.where(F.col("vec_id") < 100), e, k=5, n_planes=6)


@query("v_ivf_ann_topk")  # rows-only (IVF cell assignment is engine-side)
def v_ivf_ann_topk(spark, sf_dir):
    """Inverted-file ANN: deterministic coarse centroids, corpus
    bucketed by cell, queries probe 2 cells — candidate cost
    ~ 2/16 of the corpus per query."""
    e = table(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_sample(e, k=16)
    return sim.ivf_topk(
        e.where(F.col("vec_id") < 100), e, cents, k=5, nprobe=2
    )


@query("v_embedding_near_dup")  # rows-only (engine-specific hash buckets)
def v_embedding_near_dup(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return sim.embedding_near_dup_pairs(e, threshold=0.25, n_planes=4)
