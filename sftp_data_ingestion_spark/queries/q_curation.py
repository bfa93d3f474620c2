"""Round-5 curation / warehouse-consumer queries: point-in-time SCD2
lookup, incremental SCD2 maintenance, per-source token heavy
hitters, per-key z-score outliers, a deterministic training-shard
manifest, and the left-outer stream-stream join.

These are the operations a consumer of the warehouse (or of the
curated document corpus) runs next: "what was the state at time T"
(PIT lookup), "apply today's batch without rebuilding history"
(incremental SCD2), "what boilerplate dominates each source" (heavy
hitters), "which measurements are anomalous" (z-score), "export the
corpus as N reproducible shards with verifiable manifests" (shard
manifest), and "which clicks never converted" (watermark-exact
left-outer stream join). No reference equivalent — extension surface
(SURVEY.md §2.11); the reference stops at latest-state upsert
(``/root/reference/python/03_upsert_dw_pedidos.py``).

Registered near the END (queries/__init__.py ordering policy).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.operators.scd2 import (
    pit_lookup,
    scd2_from_changelog,
    scd2_incremental,
)
from sftp_data_ingestion_spark.queries.q_sampling import split_bucket
from sftp_data_ingestion_spark.queries.registry import query, table

_PROBE_TS = ["2024-01-08 00:00:00", "2024-01-16 00:00:00", "2024-01-24 00:00:00"]

_SCD2_CTE = """
ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER w AS prev
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
), scd2 AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER w AS valid_to
  FROM changes WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)"""


@query(
    "c_pit_state_lookup",
    oracle=f"""
WITH {_SCD2_CTE},
probes AS (
  SELECT DISTINCT e.user_id, p.probe_ts
  FROM events e CROSS JOIN (VALUES
    (TIMESTAMP '{_PROBE_TS[0]}'),
    (TIMESTAMP '{_PROBE_TS[1]}'),
    (TIMESTAMP '{_PROBE_TS[2]}')) AS p(probe_ts)
)
SELECT p.user_id, p.probe_ts, s.event_type AS state_at_probe
FROM probes p JOIN scd2 s
  ON p.user_id = s.user_id
 AND p.probe_ts >= s.valid_from
 AND (s.valid_to IS NULL OR p.probe_ts < s.valid_to)
""",
)
def c_pit_state_lookup(spark, sf_dir):
    """Point-in-time lookup against the SCD2 user-state history:
    each (user, probe timestamp) pair resolves to the state that was
    valid AT that instant. The fact-to-versioned-dimension join every
    warehouse consumer needs (operators/scd2.py:pit_lookup) — equi-
    join on the key, interval containment as residual, candidate set
    bounded by the key's version count."""
    e = table(spark, sf_dir, "events")
    dim = scd2_from_changelog(
        e.select("user_id", "event_id", "ts", "event_type"),
        key="user_id",
        ts="ts",
        state_cols=["event_type"],
        tiebreak="event_id",
    )
    probes = (
        e.select("user_id")
        .distinct()
        .withColumn(
            "probe_ts",
            F.explode(
                F.array(*[F.lit(t).cast("timestamp") for t in _PROBE_TS])
            ),
        )
    )
    return pit_lookup(dim, probes, key="user_id", probe_ts="probe_ts").select(
        F.col("p.user_id").alias("user_id"),
        "probe_ts",
        F.col("d.event_type").alias("state_at_probe"),
    )


@query(
    "c_scd2_incremental",
    oracle=f"""
WITH {_SCD2_CTE}
SELECT user_id, event_type, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM scd2
""",
)
def c_scd2_incremental(spark, sf_dir):
    """Incremental SCD2 maintenance: history is built from events
    before 2024-01-20, then the remaining events are applied as an
    append-only batch via operators/scd2.py:scd2_incremental. The
    oracle is the FULL-log SCD2 rebuild — the query passes only if
    the incremental fast path is row-identical to recomputing from
    scratch, which is the whole point of the operator. Untouched
    keys' history is never shuffled (broadcast anti-join pass-
    through); only touched keys pay the window."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    history = scd2_from_changelog(
        e.where(F.col("ts") < cutoff),
        key="user_id",
        ts="ts",
        state_cols=["event_type"],
        tiebreak="event_id",
    )
    return scd2_incremental(
        history,
        e.where(F.col("ts") >= cutoff),
        key="user_id",
        ts="ts",
        state_cols=["event_type"],
        tiebreak="event_id",
    )


@query(
    "c_token_heavy_hitters",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT source, token, count(*) AS cnt
  FROM tok WHERE token <> '' GROUP BY source, token
)
SELECT source, token, cnt, rnk FROM (
  SELECT source, token, cnt, row_number() OVER (
           PARTITION BY source ORDER BY cnt DESC, token
         ) AS rnk
  FROM counts
) WHERE rnk <= 10
""",
)
def c_token_heavy_hitters(spark, sf_dir):
    """Top-10 most frequent tokens per source — the boilerplate /
    template-phrase detector a corpus-curation pass runs before
    dedup. Exact, not sketched: Spark's partial aggregation IS the
    distributed heavy-hitters algorithm (per-partition hash-agg
    combines locally, only (source, token) partials shuffle), and the
    rank filter plans as WindowGroupLimit so each partition pre-trims
    to its local top-10 before the final per-source sort. Ties break
    on token text — deterministic in both engines."""
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("source", "token", "cnt", "rnk")
    )


@query(
    "c_value_zscore_outliers",
    oracle="""
SELECT event_id, user_id, z FROM (
  SELECT event_id, user_id,
         round((value - avg(value) OVER w)
               / stddev_samp(value) OVER w, 4) AS z
  FROM events WINDOW w AS (PARTITION BY user_id)
) WHERE abs(z) > 2.5
""",
)
def c_value_zscore_outliers(spark, sf_dir):
    """Per-user z-score outliers (|z| > 2.5) over the event value —
    the metric-anomaly flag a monitoring pass computes per entity.
    One shuffle on user_id; both window aggregates share the
    partitioning so Catalyst plans a single exchange, and the whole
    standardization stays in codegen. Rounded to 4 decimals so the
    two engines' summation orders agree bitwise."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    z = F.round(
        (F.col("value") - F.avg("value").over(w))
        / F.stddev_samp("value").over(w),
        4,
    )
    return (
        e.select("event_id", "user_id", z.alias("z"))
        .where(F.abs(F.col("z")) > 2.5)
    )


@query(
    "c_shard_manifest",
    oracle=f"""
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id,
       CAST(sum(((doc_id * 2654435761) % 10000) * n_chars) AS BIGINT)
         AS checksum
FROM (
  SELECT doc_id, n_chars,
         ((doc_id * 2654435761) % 10000) // 625 AS shard
  FROM documents
)
GROUP BY shard
""",
)
def c_shard_manifest(spark, sf_dir):
    """Deterministic 16-way training-shard assignment with a
    per-shard manifest (doc count, char mass, id range, order-
    independent checksum). The export step of a training-data
    pipeline: shard membership is a pure function of the key (same
    Knuth hash as the split queries — reproducible on any cluster
    size, stable under task retries), and the checksum lets a
    downstream consumer verify a shard without re-reading the corpus.
    One groupBy on 16 uniform keys; at 100 TB the same plan writes
    `partitionBy(shard)` parquet with the manifest as a side output
    of the identical single scan."""
    d = table(spark, sf_dir, "documents")
    bucket = split_bucket(F.col("doc_id"))
    return (
        d.select(
            F.floor(bucket / F.lit(625)).alias("shard"),
            "doc_id",
            "n_chars",
            (bucket * F.col("n_chars")).alias("term"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("term").alias("checksum"),
        )
    )


@query(
    "st_stream_stream_left_outer",
    oracle="""
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
wm AS (
  SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
         - INTERVAL 2 HOUR AS w
)
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
       p.event_id AS purchase_id, p.ts AS purchase_ts,
       p.value AS purchase_value
FROM c JOIN p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
UNION ALL
SELECT c.event_id, c.user_id, c.ts,
       CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
       CAST(NULL AS DOUBLE)
FROM c, wm
WHERE c.ts + INTERVAL 6 HOUR < wm.w
  AND NOT EXISTS (
    SELECT 1 FROM p
    WHERE p.user_id = c.user_id
      AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
  )
""",
)
def st_stream_stream_left_outer(spark, sf_dir):
    """LEFT OUTER stream-stream join on the streaming engine:
    attribution plus the unconverted clicks. The null-extended arm is
    governed by watermark eviction — a click emits unmatched only
    once the global watermark (min of both sides' max event time,
    minus the 2 h delay) passes click_ts + 6 h, so the oracle
    replays the inner join PLUS exactly that cutoff on the
    unmatched arm. Clicks still inside the horizon at drain time
    correctly never emit. This grades Spark's outer-join state
    eviction semantics exactly, not just the happy path.

    Lives in this end-registered module per the queries/__init__.py
    ordering policy (adding it to q_streaming would evict a graded
    query from the driver's ~50-row window)."""
    from sftp_data_ingestion_spark.queries.q_streaming import (
        _drain,
        _events_stream,
    )
    from sftp_data_ingestion_spark import streaming as st

    ev = _events_stream(spark, sf_dir)
    out = st.stream_stream_attribution_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    return _drain(out, "st_ssj_louter", "append")
