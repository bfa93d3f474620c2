"""Multimodal-column queries over a media table synthesized from the
documents fixture (no binary fixtures ship in the container)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sftp_data_ingestion_spark.ext import multimodal as mm
from sftp_data_ingestion_spark.queries.registry import query, table


@query(
    "m_media_stats",
    oracle="""
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       count(*) AS n,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       round(avg(octet_length(encode(text))), 2) AS avg_bytes
FROM documents GROUP BY 1
""",
)
def m_media_stats(spark, sf_dir):
    """Metadata-only relational work on a media table — the binary
    payload column is pruned out of the scan entirely."""
    docs = table(spark, sf_dir, "documents")
    return mm.media_stats(mm.synthesize_media_table(docs))


@query(
    "m_content_sha_dedup",
    oracle="""
SELECT sha256(text) AS content_sha, count(*) AS n_copies,
       min(doc_id) AS keep_id
FROM documents GROUP BY 1
""",
)
def m_content_sha_dedup(spark, sf_dir):
    """Binary content-hash dedup groups (run BEFORE any decode)."""
    docs = table(spark, sf_dir, "documents")
    media = mm.with_content_sha(mm.synthesize_media_table(docs))
    return media.groupBy("content_sha").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("media_id").alias("keep_id"),
    )


@query("m_extract_features")  # rows-only: Python-side feature kernel
def m_extract_features(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    media = mm.synthesize_media_table(docs)
    return mm.extract_features(media, dim=16)


@query("m_sample_frames")  # rows-only: Python-side frame kernel
def m_sample_frames(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 2)
    media = mm.synthesize_media_table(docs)
    return mm.sample_frames(media, every_n=60)
