"""Streaming + multimodal tests: file-source landing, watermarked
windows, sessionization, streaming dedup, custom GroupState operator,
mapInPandas media kernels."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from sftp_data_ingestion_spark import streaming as st
from sftp_data_ingestion_spark.ext import multimodal as mm

TS = dt.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_id long, "
        "event_type string, value double"
    )


def _drain(spark, stream, tmp_path, name, mode="update"):
    return st.run_to_memory(stream, name, str(tmp_path / f"ckpt_{name}"), mode)


# ---- streaming landing (file source over the staging schema) ----------------

def test_stream_landing_csv(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    from sftp_data_ingestion_spark.schemas import STG_COLUMNS

    header = ";".join(STG_COLUMNS)
    row = ";".join(["v"] * len(STG_COLUMNS))
    (landing / "f1.csv").write_text(f"{header}\n{row}\n{row}\n")
    stream = st.stream_landing_csv(spark, str(landing))
    assert stream.isStreaming
    out_dir, ckpt = str(tmp_path / "bronze"), str(tmp_path / "ckpt_landing")

    def drain_to_bronze():
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain_to_bronze()
    assert spark.read.parquet(out_dir).count() == 2
    # a second file arriving is picked up incrementally on restart —
    # the checkpoint is the processed-file ledger (S3/S10 for free)
    (landing / "f2.csv").write_text(f"{header}\n{row}\n")
    drain_to_bronze()
    assert spark.read.parquet(out_dir).count() == 3  # exactly one new row


# ---- watermarked tumbling windows -------------------------------------------

def test_windowed_event_counts_stream(spark, tmp_path):
    src = tmp_path / "ev"; src.mkdir()
    df = _events(spark, [
        (TS(2024, 1, 1, 10, 5), 1, 1, "view", 1.0),
        (TS(2024, 1, 1, 10, 55), 1, 2, "view", 2.0),
        (TS(2024, 1, 1, 11, 5), 2, 3, "click", 4.0),
    ])
    df.write.parquet(str(src / "batch1"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    out = _drain(spark, st.windowed_event_counts(stream), tmp_path, "wins")
    got = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
           for r in out.collect()}
    assert got[(TS(2024, 1, 1, 10), "view")] == (2, 3.0)
    assert got[(TS(2024, 1, 1, 11), "click")] == (1, 4.0)


def test_sessionized_activity_stream(spark, tmp_path):
    src = tmp_path / "sess"; src.mkdir()
    df = _events(spark, [
        (TS(2024, 1, 1, 10, 0), 1, 1, "view", 1.0),
        (TS(2024, 1, 1, 10, 10), 1, 2, "view", 1.0),   # same session
        (TS(2024, 1, 1, 12, 0), 1, 3, "view", 1.0),    # new session
    ])
    df.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    # session windows only support append/complete; complete emits
    # in-flight sessions without waiting for watermark expiry
    out = _drain(spark, st.sessionized_activity(stream), tmp_path, "sess_t",
                 mode="complete")
    rows = sorted(out.collect(), key=lambda r: r["session_start"])
    assert len(rows) == 2
    assert rows[0]["n_events"] == 2 and rows[1]["n_events"] == 1


# ---- streaming dedup ---------------------------------------------------------

def test_stream_dedup(spark, tmp_path):
    src = tmp_path / "dd"; src.mkdir()
    df = _events(spark, [
        (TS(2024, 1, 1, 10, 0), 1, 100, "view", 1.0),
        (TS(2024, 1, 1, 10, 1), 1, 100, "view", 1.0),  # dup event_id
        (TS(2024, 1, 1, 10, 2), 2, 200, "view", 1.0),
    ])
    df.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    out = _drain(spark, st.stream_dedup(stream, ["event_id"]), tmp_path,
                 "dd_t", mode="append")
    assert out.count() == 2


# ---- custom stateful operator (GroupState) -----------------------------------

def test_latest_event_per_user_stream(spark, tmp_path):
    src = tmp_path / "st"; src.mkdir()
    _events(spark, [
        (TS(2024, 1, 1, 10, 0), 1, 1, "old", 1.0),
        (TS(2024, 1, 1, 11, 0), 1, 2, "new", 2.0),
    ]).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        "ts timestamp, user_id long, event_id long, event_type string, "
        "value double"
    ).parquet(str(src / "*"))
    collected: list = []

    def drain():
        # foreachBatch: the only update-capable sink that supports
        # checkpoint recovery (memory sink cannot restart)
        q = (
            st.latest_event_per_user_stream(stream)
            .writeStream.foreachBatch(
                lambda df, _eid: collected.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_latest"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    rows = {r["user_id"]: r for r in collected}
    assert rows[1]["event_type"] == "new" and rows[1]["event_id"] == 2
    # restart with an OLDER event in a new file: recovered state must
    # not regress to the stale arrival
    _events(spark, [
        (TS(2024, 1, 1, 9, 0), 1, 3, "stale", 0.5),
    ]).write.mode("append").parquet(str(src / "b2"))
    collected.clear()
    drain()
    upd = {r["user_id"]: r for r in collected}
    assert upd[1]["event_type"] == "new"  # stale arrival kept newest


def test_stream_stream_left_outer_watermark_eviction(spark, tmp_path):
    """A click with no purchase emits null-extended ONLY once the
    global watermark passes click_ts + lookahead; a click still inside
    the horizon at drain time must NOT emit."""
    src = tmp_path / "ev2"; src.mkdir()
    clicks_purchases = _events(spark, [
        # c1 at 00:00, no purchase, horizon 00:00+6h=06:00
        (TS(2024, 1, 1, 0, 0), 1, 1, "click", 0.0),
        # c2 matched by p1 within 6h
        (TS(2024, 1, 1, 1, 0), 2, 2, "click", 0.0),
        (TS(2024, 1, 1, 2, 0), 2, 3, "purchase", 9.0),
        # c3 late click, unmatched but inside horizon at drain
        (TS(2024, 1, 1, 9, 0), 3, 4, "click", 0.0),
        # advance both sides' watermarks: max click 10:00, max purchase
        # 10:30 -> WM = 10:00 - 2h = 08:00 > c1 horizon, < c3 horizon
        (TS(2024, 1, 1, 10, 0), 4, 5, "click", 0.0),
        (TS(2024, 1, 1, 10, 30), 4, 6, "purchase", 1.0),
    ])
    clicks_purchases.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(clicks_purchases.schema).parquet(
        str(src / "*")
    )
    j = st.stream_stream_attribution_join(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    out = _drain(spark, j, tmp_path, "ssj_louter", "append")
    rows = {(r["click_id"], r["purchase_id"]) for r in out.collect()}
    assert (1, None) in rows        # c1: horizon passed -> emits unmatched
    assert (2, 3) in rows           # c2: matched pair emits
    assert (5, 6) in rows           # c4 matched by p2
    assert (4, None) not in rows    # c3: undecided, stays in state
    assert all(cid != 4 for cid, _ in rows)


# ---- multimodal --------------------------------------------------------------

@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return mm.synthesize_media_table(docs.limit(50))


def test_media_schema_and_stats(spark, media):
    assert dict(media.dtypes)["payload"] == "binary"
    stats = {r["media_type"]: r["n"] for r in mm.media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert sum(stats.values()) == 50


def test_extract_features_deterministic(spark, media):
    out = mm.extract_features(media, dim=16)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 50
    assert all(len(r["features"]) == 16 for r in rows.values())
    rows2 = {r["media_id"]: r for r in mm.extract_features(media, dim=16).collect()}
    assert rows[0]["features"] == rows2[0]["features"]  # deterministic
    assert rows[0]["content_sha"] != rows[1]["content_sha"]


def test_real_decode_unsupported_formats_raise(media):
    """decode='real' now genuinely decodes BMP/WAV (stdlib codecs;
    tests/test_multimodal_real.py) and YUV4MPEG2 video streams
    (tests/test_y4m.py), so only formats with no available codec
    raise — the synthesized media table's 'fake' payloads error
    inside the kernel (surfacing as Spark's wrapped
    PythonException), for frame sampling naming the remaining
    libav gate for compressed containers."""
    with pytest.raises(Exception, match="codec"):
        mm.extract_features(media, decode="real").collect()
    with pytest.raises(Exception, match="YUV4MPEG2|libav"):
        mm.sample_frames(media, decode="real").collect()


def test_resize_media_bounds_payload(spark, media):
    imgs = media.where(F.col("meta.media_type") == "image")
    out = mm.resize_media(imgs, width=8, height=8).collect()
    assert len(out) == imgs.count()
    assert all(len(r["payload"] or b"") <= 64 for r in out)
    assert all((r["width"], r["height"]) == (8, 8) for r in out)
    # truncation is a prefix: resized payload == head of the original
    orig = {r["media_id"]: bytes(r["payload"]) for r in imgs.collect()}
    assert all(
        bytes(r["payload"]) == orig[r["media_id"]][:64] for r in out
    )


def test_sample_frames_expansion(spark, media):
    vids = media.where(F.col("meta.media_type") == "video")
    out = mm.sample_frames(vids, every_n=10)
    n_vids = vids.count()
    assert out.count() >= n_vids  # >= one frame per video
    assert out.where(F.col("frame_idx") == 0).count() == n_vids


# ---- streaming queries through the driver contract ---------------------------

def test_streaming_queries_registered_with_oracles(spark, sf_small):
    from sftp_data_ingestion_spark.queries import ORACLES, QUERIES

    names = ["st_windowed_counts", "st_sessionize", "st_latest_per_user",
             "st_stream_dedup_keys"]
    for name in names:
        assert name in QUERIES and name in ORACLES, name
    out = QUERIES["st_latest_per_user"](spark, sf_small)
    n = out.count()
    assert n > 0
    assert out.select("user_id").distinct().count() == n  # one row per key


# ---- continuous incremental pipeline (foreachBatch merge) --------------------

def test_stream_upsert_to_dw_incremental(spark, tmp_path):
    """The cron pipeline as one continuous query: file checkpoint
    tracks processed files (no reprocessing), each micro-batch merges
    through the batch operators, newer-wins holds ACROSS batches."""
    from sftp_data_ingestion_spark.schemas import STG_COLUMNS
    from sftp_data_ingestion_spark.streaming import stream_upsert_to_dw

    landing = tmp_path / "novos"
    landing.mkdir()
    dw = str(tmp_path / "dw")
    ckpt = str(tmp_path / "ckpt")
    hdr = ";".join(STG_COLUMNS)
    k1, k2 = "1" * 44, "2" * 44

    def row(key, pedido, ocr, status=""):
        cells = {c: "" for c in STG_COLUMNS}
        cells.update({
            "id": "1", "chave_nfe": key, "pedido": pedido,
            "data_insercao": "2024-01-05T08:30:00",
            "data_ultima_ocr": ocr, "uf": "SP", "status_prazo": status,
        })
        return ";".join(cells[c] for c in STG_COLUMNS)

    (landing / "f1.csv").write_text(
        f"{hdr}\n{row(k1, 'P-old', '05/01/2024 08:00:00')}\n"
        f"{row(k2, 'P-two', '05/01/2024 09:00:00')}\n"
    )
    q = stream_upsert_to_dw(spark, str(landing), dw, ckpt)
    q.processAllAvailable()
    q.stop()
    got = {r["chave_nfe"]: r["pedido"]
           for r in spark.read.parquet(dw).collect()}
    assert got == {k1: "P-old", k2: "P-two"}

    # second file arrives: restart from the SAME checkpoint — only the
    # new file processes, and its newer occurrence wins over the DW row
    (landing / "f2.csv").write_text(
        f"{hdr}\n{row(k1, 'P-new', '07/01/2024 10:00:00', 'ENTREGUE')}\n"
    )
    q2 = stream_upsert_to_dw(spark, str(landing), dw, ckpt)
    q2.processAllAvailable()
    q2.stop()
    spark.catalog.refreshByPath(dw)
    got2 = {r["chave_nfe"]: r["pedido"]
            for r in spark.read.parquet(dw).collect()}
    assert got2 == {k1: "P-new", k2: "P-two"}  # merged, not replaced
    # an OLDER occurrence arriving later must NOT regress the
    # newer-gated occurrence columns (status_prazo, data_ultima_ocr);
    # fill-the-blanks columns like pedido DO take any non-NULL
    # (reference ON CONFLICT semantics, 03_upsert_dw_pedidos.py)
    (landing / "f3.csv").write_text(
        f"{hdr}\n{row(k1, 'P-late', '01/01/2024 00:00:00', 'STALE')}\n"
    )
    q3 = stream_upsert_to_dw(spark, str(landing), dw, ckpt)
    q3.processAllAvailable()
    q3.stop()
    spark.catalog.refreshByPath(dw)
    r1 = {r["chave_nfe"]: r for r in spark.read.parquet(dw).collect()}[k1]
    assert r1["status_prazo"] == "ENTREGUE"          # newer-gated kept
    assert str(r1["data_ultima_ocr"]).startswith("2024-01-07")
    assert r1["pedido"] == "P-late"                  # coalesce column


def test_stream_stream_join_matches_batch(spark):
    """The drained stream-stream attribution join equals the same
    range join computed in batch (single micro-batch: nothing expires
    before the join sees it)."""
    from sftp_data_ingestion_spark.queries import QUERIES
    from sftp_data_ingestion_spark.queries.registry import table

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in QUERIES["st_stream_stream_join"](spark, sf).collect()}
    e = table(spark, sf, "events")
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    want = {
        tuple(r)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 6 HOURS")),
        )
        .select("click_id", "user_id",
                F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
                "purchase_id",
                F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
                "purchase_value")
        .collect()
    }
    # the streaming side's ts is TIMESTAMP (UTC session) and batch is
    # NTZ — both collect to the same naive datetimes under UTC
    assert got == want


def test_mv_merge_batch_replay_guard_prevents_double_add(spark, tmp_path):
    state = str(tmp_path / "mv_state")
    specs = {"n": ("count", "event_id"), "s": ("sum", "value")}
    b1 = _events(spark, [(TS(2024, 1, 1, 0), 1, 1, "view", 2.0),
                         (TS(2024, 1, 1, 1), 1, 2, "view", 3.0)])
    b2 = _events(spark, [(TS(2024, 1, 1, 2), 2, 3, "view", 5.0)])
    assert st.mv_merge_batch(b1, 0, state, ["event_type"], specs) is True
    assert st.mv_merge_batch(b2, 1, state, ["event_type"], specs) is True
    # crash-replay of batch 1: must be a no-op, not a double add
    assert st.mv_merge_batch(b2, 1, state, ["event_type"], specs) is False
    got = spark.read.parquet(state).collect()[0]
    assert (got["n"], got["s"]) == (3, 10.0)


def test_text_wav_stats_real_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "azaz"), (4, "\x7f\x7f\x7f"), (7, "a")],
        "doc_id long, text string",
    )
    out = {r["media_id"]: r for r in mm.text_wav_stats(docs).collect()}
    # doc 7: all samples = ('a'-100)*256 = -768 -> no crossings
    r = out[7]
    assert r["sum_abs"] == 768 * 256
    assert r["peak"] == 768 and r["zero_crossings"] == 0
    # doc 4: chr(127) -> (127-100)*256 = 6912 everywhere, positive
    assert out[4]["peak"] == 6912 and out[4]["zero_crossings"] == 0
    # doc 1 "azaz": a (97) below the 100 pivot, z (122) above -> crossings
    assert out[1]["zero_crossings"] > 0


# ---------------------------------------------------------------------------
# transformWithStateInPandas (env-gated: needs protobuf for the PySpark
# state-server protocol; fold logic unit-tested dependency-free)
# ---------------------------------------------------------------------------


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_running_count_processor_fold_logic():
    """The processor's per-trigger fold, driven directly: state
    accumulates across calls, batch_seq comes from the rows, one
    emission per touched key per trigger."""
    import pandas as pd

    from sftp_data_ingestion_spark.streaming import RunningCountProcessor

    class FakeValueState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = tuple(v)

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            assert name == "cum"
            return self.state

    p = RunningCountProcessor()
    p.init(FakeHandle())

    def feed(batch_seq, n):
        rows = iter(
            [pd.DataFrame({"batch_seq": [batch_seq] * n, "x": range(n)})]
        )
        (out,) = list(p.handleInputRows((7,), rows, None))
        return (
            int(out["user_id"][0]),
            int(out["batch_seq"][0]),
            int(out["cum_events"][0]),
        )

    assert feed(0, 3) == (7, 0, 3)
    assert feed(1, 2) == (7, 1, 5)   # state carried across triggers
    assert feed(2, 1) == (7, 2, 6)   # and again on a later trigger
    p.close()


def test_running_counts_tws_gate_or_drain(spark, tmp_path):
    """Without protobuf the operator must fail LOUDLY at wiring time
    (never a silent half-configured stream); with it, a real 2-batch
    drain must produce the cumulative emission sequence."""
    import glob as g
    import os

    import pytest as pt

    from sftp_data_ingestion_spark import streaming as stm

    ev = spark.createDataFrame(
        [(1, 0), (1, 0), (2, 0), (1, 1), (2, 1), (2, 1)],
        "user_id long, batch_seq int",
    )
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    for k in range(2):
        tmp = str(tmp_path / f"b{k}")
        ev.where(F.col("batch_seq") == k).coalesce(1).write.parquet(tmp)
        part = g.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"chunk_{k}.parquet")
        os.link(part, dst)
        os.utime(dst, (1_700_000_000 + k * 60,) * 2)
    stream = (
        spark.readStream.schema("user_id long, batch_seq int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    if not _has_protobuf():
        with pt.raises(ImportError, match="protobuf"):
            stm.running_counts_tws(stream)
        return
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    q = None
    try:
        q = (
            stm.running_counts_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        got = sorted(
            (r["user_id"], r["batch_seq"], r["cum_events"])
            for r in spark.table("tws_test").collect()
        )
        assert got == [(1, 0, 2), (1, 1, 3), (2, 0, 1), (2, 1, 3)]
    finally:
        if q is not None:
            q.stop()
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
