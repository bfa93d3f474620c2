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


# The fake decode kernel is deterministic sha256 arithmetic
# (ext/multimodal.py:_fake_features: bytes -> sha256(payload || be32
# counter) stream -> dim floats), so DuckDB can replay it: counter
# bytes via chr(0)/chr(1) (payload = utf-8 text; the fixture is pure
# ASCII so byte ops == char ops), each float = big-endian u32 at hex
# offset (i%8)*8 scaled to [-1, 1) and cast FLOAT.  The graded
# projection is FLATTENED to (media_id, i, value) rows — the driver's
# pandas canonicalizer cannot sort array cells (r5: unhashable list).
_FEATURE_VALUE_SQL = """
  CAST(CAST(concat('0x', substr(
    sha256(text || chr(0) || chr(0) || chr(0)
                || CASE WHEN i < 8 THEN chr(0) ELSE chr(1) END),
    (CAST(i AS INTEGER) % 8) * 8 + 1, 8)) AS UBIGINT) AS DOUBLE)
  / 2147483648 - 1.0"""


@query(
    "m_extract_features",
    oracle=f"""
SELECT doc_id AS media_id, sha256(text) AS content_sha,
       CAST(i AS INTEGER) AS i,
       CAST({_FEATURE_VALUE_SQL} AS FLOAT) AS value
FROM documents, range(16) t(i)
""",
)
def m_extract_features(spark, sf_dir):
    """Arrow-batched mapInPandas decode+featurize, graded end-to-end:
    the fake kernel is deterministic, so the oracle replays the exact
    byte arithmetic in SQL. The real-decoder slot (PIL/libav) stays
    env-gated in ext/multimodal.py. Output is posexploded to one row
    per (media_id, feature index) so every graded column is scalar."""
    docs = table(spark, sf_dir, "documents")
    media = mm.synthesize_media_table(docs)
    feats = mm.extract_features(media, dim=16)
    return feats.select(
        "media_id",
        "content_sha",
        F.posexplode("features").alias("i", "value"),
    )


@query(
    "m_sample_frames",
    oracle="""
SELECT media_id, CAST(k AS INTEGER) AS frame_idx,
       CAST(length(substr(text, CAST(k*step + 1 AS INTEGER),
                          CAST(step AS INTEGER))) AS INTEGER) AS frame_len,
       sha256(substr(text, CAST(k*step + 1 AS INTEGER),
                     CAST(step AS INTEGER))) AS frame_sha
FROM (
  SELECT media_id, text, step, unnest(range(n_frames)) AS k
  FROM (
    SELECT doc_id AS media_id, text,
           greatest(length(text) // 600, 1) AS n_frames,
           greatest(length(text) // greatest(length(text) // 600, 1), 1)
             AS step
    FROM documents WHERE doc_id % 3 = 2
  )
)
""",
)
def m_sample_frames(spark, sf_dir):
    """mapInPandas frame-sampling expansion (one row -> n_frames
    rows), graded by projecting each binary frame to (length, sha256):
    the oracle replays the slicing arithmetic — duration_ms =
    100*len(text), n_frames = max(dur // 60000, 1), step =
    max(len // n_frames, 1), frame k = payload[k*step:(k+1)*step] —
    on the utf-8 text (pure-ASCII fixture: byte slices == char
    slices). Binary payloads stay out of the graded projection only
    because cross-engine BLOB fetch normalization is unspecified."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 2)
    media = mm.synthesize_media_table(docs)
    frames = mm.sample_frames(media, every_n=60)
    return frames.select(
        "media_id",
        "frame_idx",
        F.length("frame_payload").cast("int").alias("frame_len"),
        F.sha2("frame_payload", 256).alias("frame_sha"),
    )


@query(
    "m_resize_images",
    oracle="""
SELECT doc_id AS media_id,
       CAST(least(4096, length(text)) AS INTEGER) AS n_bytes_out,
       CAST(64 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
       sha256(substr(text, 1, 4096)) AS payload_sha
FROM documents WHERE doc_id % 3 = 0
""",
)
def m_resize_images(spark, sf_dir):
    """mapInPandas image resize (normalize-before-embed), graded by
    projecting the resized binary to (length, sha256): the fake kernel
    truncates the payload to width*height bytes, so the oracle replays
    the arithmetic on the utf-8 text (pure-ASCII fixture: byte slices
    == char slices). Only image-typed rows pass the metadata filter —
    payload bytes of other modalities are never touched."""
    docs = table(spark, sf_dir, "documents")
    media = mm.synthesize_media_table(docs).where(
        F.col("meta.media_type") == "image"
    )
    resized = mm.resize_media(media, width=64, height=64)
    return resized.select(
        "media_id",
        F.length("payload").cast("int").alias("n_bytes_out"),
        "width",
        "height",
        F.sha2("payload", 256).alias("payload_sha"),
    )


@query(
    "m_png_decode_histogram",
    oracle="""
SELECT doc_id AS media_id,
       CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
       CAST(b AS INTEGER) AS bin,
       CAST(length(list_filter(range(256), i ->
         least(((299*ascii(substr(text, ((3*i) % length(text)) + 1, 1))
               + 587*ascii(substr(text, ((3*i+1) % length(text)) + 1, 1))
               + 114*ascii(substr(text, ((3*i+2) % length(text)) + 1, 1)))
               // 1000) * 8 // 256, 7) = b
       )) AS DOUBLE) / 256.0 AS mass
FROM documents, range(8) t(b)
WHERE doc_id % 3 = 0
""",
)
def m_png_decode_histogram(spark, sf_dir):
    """REAL stdlib PNG codec graded end-to-end: text bytes become the
    pixels of a 16x16 RGB image, round-trip through a real
    zlib-compressed Paeth-filtered PNG (ext/multimodal.encode_png ->
    decode_png via the production _real_decode_image path), and reduce
    to an 8-bin BT.601 luma histogram. PNG is lossless, so the oracle
    replays the histogram with byte arithmetic on the text (pure-ASCII
    fixture: char codes == bytes); any defect in deflate framing,
    unfiltering, or the luma kernel breaks the hash match. Mass is
    /256 — a power of two, so the division is float-exact in both
    engines. Output is posexploded to one row per (media_id, bin) so
    every graded column is scalar (the driver's pandas canonicalizer
    cannot sort array cells)."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    hist = mm.text_png_histogram(docs, size=16, bins=8)
    return hist.select(
        "media_id",
        "width",
        "height",
        F.posexplode("luma_hist").alias("bin", "mass"),
    )
