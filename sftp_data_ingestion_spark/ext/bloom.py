"""Bloom-filter membership pruning for batch-vs-corpus dedup.

The incremental exact-dedup question — "which incoming docs are NOT
already in the corpus?" — is an anti-join, and at 100 TB the anti-join
shuffles the corpus (or at least its join keys) every batch. A Bloom
filter collapses the corpus side to a few-MB bitmap built ONCE: each
batch then probes the broadcast bitmap locally, and only the
maybe-present minority (true hits + the controlled false-positive
rate) goes through the exact verify join. No false negatives, so
after verification the result is EXACT. This is the same shape as
Spark's own runtime bloom-filter join pruning (``bloom_filter_agg`` /
``might_contain``), which Spark 4 does not expose as public SQL
functions — hence this operator-level implementation.

Determinism/portability: the k probe positions derive from TWO
JVM-side ``xxhash64`` columns (double hashing: ``h1 + i*h2`` mod m —
Kirsch-Mitzenmacher), computed BEFORE any Python stage, so build and
probe see bit-identical hashes and an engine-independent oracle can
reason about the exact output (the bitmap only prunes; exact verify
decides).

Scale notes: the per-partition bitmaps OR-reduce on the driver —
``n_partitions x m/8`` bytes pass through it once (a 1 M-bit filter is
128 KB/partition; size ``m`` for the corpus cardinality x ~10 bits per
element for ~1% FPR). The corpus is scanned once to build; the batch
never joins the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_H1, _H2 = "__bloom_h1", "__bloom_h2"


def _hash_cols(col: Column) -> list[Column]:
    # two independent 64-bit hashes -> k derived positions
    return [
        F.xxhash64(col, F.lit(0x5EED1)).alias(_H1),
        F.xxhash64(col, F.lit(0x5EED2)).alias(_H2),
    ]


def build_bloom(
    corpus: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> bytes:
    """Build the corpus bitmap: one scan, per-partition numpy bitmaps,
    driver-side OR. Returns the ``m_bits``-bit filter as bytes."""
    import numpy as np

    n_bytes = m_bits // 8

    def fn(batches):
        import pandas as pd

        bmp = np.zeros(n_bytes, dtype=np.uint8)
        touched = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            touched = True
            h1 = pdf[_H1].to_numpy(dtype=np.int64).astype(np.uint64)
            h2 = pdf[_H2].to_numpy(dtype=np.int64).astype(np.uint64)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bmp,
                    (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        if touched:
            yield pd.DataFrame({"bmp": [bmp.tobytes()]})

    parts = corpus.select(*_hash_cols(F.col(value_col))).mapInPandas(
        fn, "bmp binary"
    )
    out = np.zeros(n_bytes, dtype=np.uint8)
    # bounded driver work: one n_bytes row per partition, OR-reduced
    for row in parts.collect():
        out |= np.frombuffer(row["bmp"], dtype=np.uint8)
    return out.tobytes()


def might_contain(
    df: DataFrame,
    value_col: str,
    bloom: bytes,
    k: int = 7,
    flag_col: str = "__bloom_maybe",
) -> DataFrame:
    """Add a boolean ``flag_col``: False = DEFINITELY absent from the
    corpus the filter was built on; True = present or false positive.
    The bitmap ships in the task closure (broadcast-equivalent)."""
    import numpy as np

    bmp = np.frombuffer(bloom, dtype=np.uint8)
    m_bits = len(bloom) * 8
    src = df.withColumns(
        {
            _H1: F.xxhash64(F.col(value_col), F.lit(0x5EED1)),
            _H2: F.xxhash64(F.col(value_col), F.lit(0x5EED2)),
        }
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        list(src.schema.fields) + [T.StructField(flag_col, T.BooleanType())]
    )

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h1 = pdf[_H1].to_numpy(dtype=np.int64).astype(np.uint64)
            h2 = pdf[_H2].to_numpy(dtype=np.int64).astype(np.uint64)
            hit = np.ones(len(pdf), dtype=bool)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                bit = (bmp[(pos >> np.uint64(3)).astype(np.int64)]
                       >> (pos & np.uint64(7)).astype(np.uint8)) & 1
                hit &= bit.astype(bool)
            pdf = pdf.copy()
            pdf[flag_col] = hit
            yield pdf

    return src.mapInPandas(fn, schema).drop(_H1, _H2)


def bloom_new_values(
    batch: DataFrame,
    corpus: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """EXACT "which batch rows are new?" via bloom-prune + verify:

    1. corpus -> bitmap (one scan, built once; persist it in a real
       pipeline and rebuild incrementally);
    2. batch probes the bitmap: bloom-negative rows are definitely
       new (no false negatives) and skip the join entirely;
    3. only maybe-present rows anti-join the corpus to weed out the
       false positives.

    Returns the batch rows whose ``value_col`` does not occur in the
    corpus — identical to a plain anti-join, at a fraction of the
    join traffic (the verify side is |hits|, not |batch|)."""
    bloom = build_bloom(corpus, value_col, m_bits, k)
    flagged = might_contain(batch, value_col, bloom, k)
    fresh = flagged.where(~F.col("__bloom_maybe")).drop("__bloom_maybe")
    maybe = flagged.where(F.col("__bloom_maybe")).drop("__bloom_maybe")
    verified_new = maybe.join(
        corpus.select(F.col(value_col)).distinct(), value_col, "left_anti"
    )
    return fresh.unionByName(verified_new)
