"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

Design (north star; no reference equivalent): media NEVER decodes into
Spark rows as raw pixels by default — a binary payload column plus a
typed metadata struct flows through the relational engine (filter,
join, dedup by content hash), and decode/feature steps run as
``mapInPandas`` stages with explicit output schemas so each batch
stays Arrow-columnar.

The container has no image/audio codecs, so the decode kernel is
STUBBED: ``decode=fake`` produces a deterministic feature vector from
the payload bytes (tests + plumbing run for real); ``decode=real``
raises ``NotImplementedError`` naming the dependency (PIL/libav). The
Spark-side contract — schemas, batching, partition sizing — is the
real deliverable and is fully exercised.

Scale notes: payloads dominate partition size, so ``repartition`` by
count (not bytes) before a decode stage, keep
``spark.sql.files.maxPartitionBytes`` small for media tables, and
prefer content-hash dedup BEFORE decode (decode the unique set only).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def with_content_sha(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Content hash on the binary payload (JVM-side sha2) — dedup
    media BEFORE any Python decode stage touches it."""
    return df.withColumn("content_sha", F.sha2(F.col(payload_col), 256))


def media_stats(df: DataFrame) -> DataFrame:
    """Relational work on metadata only — never deserializes payloads
    (column pruning keeps the binary out of the scan)."""
    return df.groupBy(F.col("meta.media_type").alias("media_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.round(F.avg("meta.n_bytes"), 2).alias("avg_bytes"),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoder+embedder: bytes -> sha256
    stream -> dim floats in [-1, 1). Stable across runs/machines."""
    out: list[float] = []
    counter = 0
    seed = payload or b""
    while len(out) < dim:
        h = hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        for i in range(0, len(h) - 3, 4):
            if len(out) >= dim:
                break
            v = int.from_bytes(h[i : i + 4], "big")
            out.append((v / 2**31) - 1.0)
        counter += 1
    return out


def extract_features(
    df: DataFrame, dim: int = 16, decode: str = "fake"
) -> DataFrame:
    """mapInPandas decode+featurize stage (Arrow batches in/out).

    ``decode="real"`` is the production kernel slot — raises with the
    named dependency in this codec-less container."""
    if decode == "real":  # pragma: no cover — env-dependent
        raise NotImplementedError(
            "real media decode needs PIL/torchvision/libav, absent in "
            "this container; plumbing is identical for decode='fake'"
        )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_sha": [
                        hashlib.sha256(p or b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "features": [
                        _fake_features(p, dim) for p in pdf["payload"]
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n: int = 10, decode: str = "fake"
) -> DataFrame:
    """Video frame sampling as a mapInPandas expansion stage: one input
    row -> ceil(duration/every_n) frame rows. Fake kernel slices the
    payload deterministically; the real kernel would seek+decode."""
    if decode == "real":  # pragma: no cover
        raise NotImplementedError("frame decode needs libav/ffmpeg")

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n_frames = max(int((dur or 0) // (every_n * 1000)), 1)
                p = payload or b""
                step = max(len(p) // n_frames, 1)
                for k in range(n_frames):
                    ids.append(mid)
                    idxs.append(k)
                    payloads.append(p[k * step : (k + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return df.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(fn, FRAME_SCHEMA)


def synthesize_media_table(docs: DataFrame) -> DataFrame:
    """Build a media-shaped table from the documents fixture (the
    container ships no binary fixtures): payload = utf-8 text bytes,
    metadata derived deterministically."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
            .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
            .otherwise(F.lit("video"))
            .alias("media_type"),
            F.lit("fake").alias("format"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            (F.length("text") * 100).cast("long").alias("duration_ms"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(
    df: DataFrame, width: int = 64, height: int = 64, decode: str = "fake"
) -> DataFrame:
    """Image resize as a mapInPandas stage: payload in, fixed-dims
    payload out (the normalize-before-embed step of a multimodal
    pipeline). The fake kernel truncates the payload to width*height
    bytes (a 1-byte/px grayscale stand-in — deterministic and
    arithmetic-checkable); ``decode="real"`` is the PIL/torchvision
    kernel slot, absent in this container. Output partition sizing
    note: resized payloads are bounded at width*height bytes, so the
    stage caps per-row memory no matter how large the inputs were."""
    if decode == "real":  # pragma: no cover — env-dependent
        raise NotImplementedError(
            "real image resize needs PIL/torchvision, absent in this "
            "container; plumbing is identical for decode='fake'"
        )
    n_out = width * height

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [(p or b"")[:n_out] for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, RESIZE_SCHEMA)
