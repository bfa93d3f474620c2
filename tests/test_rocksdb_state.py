"""The streaming docstrings claim "on a cluster the same code runs
with a RocksDB state store" — this pins that claim in-repo: a real
micro-batch drain under RocksDBStateStoreProvider (bundled
rocksdbjni), verified both by the result matching the batch answer
and by the engine's own rocksdb metrics + SST files appearing, so the
provider demonstrably engaged rather than silently falling back."""

import os

from pyspark.sql import functions as F

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def test_stateful_agg_under_rocksdb_state_store(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "v long, k long"
    ).write.parquet(src)

    parts_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(parts_key)
    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(parts_key, "4")
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    q = None
    try:
        stream = spark.readStream.schema("v long, k long").parquet(src)
        agg = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocksdb_state_t")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        prog = q.lastProgress
    finally:
        if q is not None:
            q.stop()
        spark.conf.set(parts_key, prev_parts)
        if prev_provider is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev_provider)

    got = {
        r["k"]: r["n"] for r in spark.table("rocksdb_state_t").collect()
    }
    assert got == {0: 10, 1: 10, 2: 10}

    # the provider really ran: rocksdb metrics reported per operator
    metrics = prog["stateOperators"][0]["customMetrics"]
    assert any(k.startswith("rocksdb") for k in metrics)
    # and its SST/zip artifacts exist in the checkpoint state dir
    state_files = [
        f
        for root, _, files in os.walk(os.path.join(ckpt, "state"))
        for f in files
    ]
    assert any(f.endswith((".sst", ".zip")) for f in state_files)


def test_stateful_lsh_admission_under_rocksdb(spark, tmp_path):
    """streaming.stream_ingest_neardup_stateful: admitted LSH
    signatures live in keyed state under the RocksDB provider — the
    planted near-dup pair is rejected ACROSS micro-batches (B in
    batch 2 vs A admitted in batch 0), unrelated docs are admitted,
    the provider's rocksdb metrics report, and the state row count
    equals the number of distinct non-empty band buckets (state size
    tracks admitted docs x bands — the stream-release composition's
    named 1000x term, here disk-backed)."""
    import glob
    import shutil

    from sftp_data_ingestion_spark import streaming as st

    plant_a = " ".join(f"zzqplant{i:02d}" for i in range(1, 21))
    plant_b = " ".join(
        [f"zzqplant{i:02d}" for i in range(1, 19)]
        + ["zzqnovel19", "zzqnovel20"]
    )

    def uniq(tag, n=20):
        return " ".join(f"{tag}tok{i:02d}" for i in range(n))

    batches = [
        [(100000, plant_a), (1, uniq("aaa"))],
        [(2, uniq("bbb")), (3, uniq("ccc"))],
        [(100010, plant_b), (4, uniq("ddd"))],
    ]
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for k, docs in enumerate(batches):
        tmp = str(tmp_path / f"chunk{k}")
        spark.createDataFrame(
            docs, "doc_id long, text string"
        ).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(landing, f"chunk_{k}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + k * 60,) * 2)

    corpus = str(tmp_path / "corpus" / "c")
    ckpt = str(tmp_path / "ckpt")
    parts_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(parts_key)
    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(parts_key, "4")
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    q = None
    try:
        q = st.stream_ingest_neardup_stateful(
            spark, landing, corpus, ckpt, threshold=0.5
        )
        q.processAllAvailable()
        prog = q.lastProgress
    finally:
        if q is not None:
            q.stop()
        spark.conf.set(parts_key, prev_parts)
        if prev_provider is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev_provider)

    got = {
        r["doc_id"]: r["batch_seq"]
        for r in spark.read.parquet(corpus).collect()
    }
    # planted B (near-dup of A, admitted two batches earlier) is the
    # ONLY rejection; everything else admits with its batch id
    assert got == {100000: 0, 1: 0, 2: 1, 3: 1, 4: 2}

    op = prog["stateOperators"][0]
    assert any(k.startswith("rocksdb") for k in op["customMetrics"])
    # 5 admitted docs x 16 bands = 80 bucket entries; buckets collide
    # only on shared bands, and B's clean buckets add SEEN entries —
    # so rows is bounded by (admitted+seen) x bands and must be > 0
    assert 0 < op["numRowsTotal"] <= 6 * 16
