"""Round-5 analytics/lakehouse-consumer queries.

The layer a user of the warehouse builds on top of the event/document
tables: entity resolution (blocked fuzzy join — the shape that avoids
the all-pairs edit-distance scan), time-bounded conversion funnels,
weekly retention cohorts, percent-rank document curation, versioned-
table time travel (`z_time_travel_diff`), materialized-view
maintenance in batch (`z_mv_incremental_sales`), sketch
(`z_mv_distinct_users_hll`) and continuous (`z_stream_mv_merge`)
form, a data-quality expectations audit (`z_dq_audit`), GDPR erasure
(`z_forget_users`), a distributed prefix-scan concurrency gauge
(`z_concurrency_gauge`), BM25 lexical search (`z_bm25_search`), and
the TPC-H Q3/Q18 classics. No reference equivalent — extension
surface (SURVEY.md §2.11).

Registered LAST (queries/__init__.py ordering policy).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.ext import textstats as ts
from sftp_data_ingestion_spark.queries.registry import query, table


@query(
    "z_fuzzy_join_blocked",
    oracle="""
WITH names AS (
  SELECT DISTINCT p_name, string_split(p_name, ' ')[2] AS block
  FROM part
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM names a JOIN names b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
""",
)
def z_fuzzy_join_blocked(spark, sf_dir):
    """Fuzzy self-join with blocking: near-identical part names
    (edit distance <= 3) found WITHOUT the all-pairs scan — candidate
    pairs come from an equi-join on a blocking key (here the noun
    token; production uses q-grams/phonetic keys, same shape), and
    the exact Levenshtein verify runs only inside blocks. Cost is
    O(sum block^2) instead of O(n^2) — the record-linkage scale
    pattern. Names are deduplicated before pairing so the join is
    over entities, not rows."""
    names = (
        table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.split("p_name", " ").getItem(1))
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn(
            "dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
        )
        .where(F.col("dist") <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "dist",
        )
    )


@query(
    "z_funnel_stages",
    oracle="""
WITH s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS v_ts
  FROM events
), s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > v_ts
                 AND ts <= v_ts + INTERVAL 6 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS c_ts
  FROM s1
), s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c_ts
                 AND ts <= c_ts + INTERVAL 6 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS p_ts
  FROM s2
), u AS (SELECT DISTINCT user_id, v_ts, c_ts, p_ts FROM s3)
SELECT CASE WHEN p_ts IS NOT NULL THEN 3
            WHEN c_ts IS NOT NULL THEN 2
            WHEN v_ts IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage,
       CAST(count(*) AS BIGINT) AS n_users
FROM u GROUP BY funnel_stage
""",
)
def z_funnel_stages(spark, sf_dir):
    """Ordered, time-bounded conversion funnel (view -> click within
    6 h -> purchase within 6 h of the click): how many users completed
    each prefix of the sequence. Order AND recency matter — a click
    before the first view, or hours after the window, does not count —
    so each stage's timestamp is the min over events inside the
    previous stage's window. All three stage windows share the user_id
    partitioning: one shuffle, three chained window projections, then
    a tiny stage histogram."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s = (
        e.withColumn(
            "v_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("v_ts"))
                    & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 6 HOURS")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("c_ts"))
                    & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 6 HOURS")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .select("user_id", "v_ts", "c_ts", "p_ts")
        .distinct()
    )
    stage = (
        F.when(F.col("p_ts").isNotNull(), F.lit(3))
        .when(F.col("c_ts").isNotNull(), F.lit(2))
        .when(F.col("v_ts").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        s.select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "z_cohort_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week, date_trunc('week', e.ts) AS activity_week,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY f.cohort_week, activity_week
""",
)
def z_cohort_retention(spark, sf_dir):
    """Weekly retention cohorts: users grouped by first-seen week,
    counted distinct in each later activity week — the retention
    matrix every growth dashboard draws. Two shuffles (first-seen agg
    + cohort/activity agg); the first-seen side is per-user tiny, so
    the join back broadcasts at any corpus scale where the user
    dimension fits (and falls back to a shuffled hash join keyed by
    user when it does not)."""
    e = table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        e.join(first, "user_id")
        .groupBy(
            "cohort_week",
            F.date_trunc("week", F.col("ts")).cast("date").alias("activity_week"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@query(
    "z_quality_top_half",
    oracle=r"""
WITH scored AS (
  SELECT doc_id, source, round(
    0.5 * least(CAST(length(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 50.0, 1.0)
    + 0.3 * least(
        (CAST(length(list_filter(string_split_regex(trim(lower(text)), '\s+'),
              t -> list_contains(['the','a','of','and','is'], t))) AS DOUBLE)
         / greatest(CAST(length(string_split_regex(trim(text), '\s+')) AS DOUBLE), 1.0)) * 5,
        1.0)
    + 0.2 * (1 - least(
        (CAST(length(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
         / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 10,
        1.0)),
    6) AS quality
  FROM documents
)
SELECT doc_id, source, quality FROM (
  SELECT doc_id, source, quality,
         percent_rank() OVER (PARTITION BY source ORDER BY quality) AS pr
  FROM scored
) WHERE pr > 0.5
""",
)
def z_quality_top_half(spark, sf_dir):
    """Keep each source's top half of documents by quality score —
    the percentile-gated curation filter. The gate is RANK-based
    (percent_rank > 0.5), not value-based (quality > median), by
    design: an interpolated median is a float the two engines can
    compute a ulp apart, while percent_rank is a ratio of exact
    integers over the identical rounded quality ordering — the same
    determinism argument that makes the filter retry-stable on a
    cluster. Ties at the boundary share a rank, so they are kept or
    dropped together. One shuffle on source."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", ts.quality_score(F.col("text")).alias("quality")
    )
    pr = F.percent_rank().over(
        Window.partitionBy("source").orderBy("quality")
    )
    return (
        scored.withColumn("pr", pr)
        .where(F.col("pr") > 0.5)
        .select("doc_id", "source", "quality")
    )


@query(
    "z_time_travel_diff",
    oracle="""
WITH early AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
), e1 AS (SELECT user_id, event_type AS old_state FROM early WHERE rn = 1),
whole AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), e2 AS (SELECT user_id, event_type AS new_state FROM whole WHERE rn = 1)
SELECT e2.user_id, e1.old_state, e2.new_state
FROM e2 LEFT JOIN e1 ON e1.user_id = e2.user_id
WHERE e1.old_state IS DISTINCT FROM e2.new_state
""",
)
def z_time_travel_diff(spark, sf_dir):
    """Snapshot diff via the versioned table store (io/versioned.py):
    the latest-state-per-user table is committed at an early cutoff
    (v1) and again over the full log (v2), then both versions are
    time-travel read back and diffed — which users' state changed
    between snapshots. The oracle recomputes both snapshots straight
    from the event log, so this grades the commit/read/time-travel
    path end-to-end: a manifest that dropped, duplicated, or
    misordered a file would hash-mismatch. The diff itself is the
    audit query a versioned warehouse runs after every batch."""
    import tempfile

    from sftp_data_ingestion_spark.io import versioned as vt
    from sftp_data_ingestion_spark.operators.dedup import latest_per_key

    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    order = [F.col("ts").desc_nulls_last(), F.col("event_id").desc_nulls_last()]
    early = latest_per_key(
        e.where(F.col("ts") < cutoff), ["user_id"], order
    ).select("user_id", "event_type")
    whole = latest_per_key(e, ["user_id"], order).select(
        "user_id", "event_type"
    )
    root = tempfile.mkdtemp(prefix="ttdiff_")
    vt.commit(early, root)
    vt.commit(whole, root)
    d1 = vt.read(spark, root, version=1).withColumnRenamed(
        "event_type", "old_state"
    )
    d2 = vt.read(spark, root, version=2).withColumnRenamed(
        "event_type", "new_state"
    )
    return (
        d2.join(d1, "user_id", "left")
        .where(~F.col("old_state").eqNullSafe(F.col("new_state")))
        .select("user_id", "old_state", "new_state")
    )


@query(
    "z_snapshot_expiry_travel",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       TRUE AS expired_read_fails,
       TRUE AS expired_files_deleted,
       TRUE AS retained_files_intact,
       CAST(2 AS INTEGER) AS versions_left
FROM orders GROUP BY o_orderstatus
""",
)
def z_snapshot_expiry_travel(spark, sf_dir):
    """AGE-based snapshot retention graded end-to-end
    (io/versioned.expire_snapshots): three overwrite commits land
    with INJECTED retention clocks (day 1, day 2, day 40 — the
    manifest's committed_at_ms, so the query is wall-clock-free),
    then expiry runs with a day-30 cutoff and keep_last=2. That
    exercises BOTH retention rules at once: v1 expires by age, v2 is
    just as old but survives on the keep_last floor, v3 is young.
    The graded rows are the HEAD snapshot read back after expiry
    (oracle recomputes the same aggregate straight from orders — a
    manifest sweep that deleted a still-referenced file would
    hash-mismatch or fail the scan), and the flags pin the contract:
    time travel to the expired version raises, the expired version's
    data files are physically gone, and every file of the RETAINED
    old version survived the sweep (the reader-safety invariant).
    The table root is deterministic per (sf_dir, user) and rebuilt
    from scratch each call — repeated grading sweeps stay idempotent
    and strand nothing."""
    import getpass
    import hashlib
    import os
    import shutil
    import tempfile

    from sftp_data_ingestion_spark.io import versioned as vt

    o = table(spark, sf_dir, "orders")

    def agg(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )

    tag = hashlib.sha1(
        f"{sf_dir}|{getpass.getuser()}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"z_expiry_{tag}")
    if os.path.isdir(root):
        shutil.rmtree(root)
    day = 86_400_000
    t0 = 1_700_000_000_000
    cut95 = F.lit("1995-01-01").cast("date")
    cut97 = F.lit("1997-01-01").cast("date")
    vt.commit(
        agg(o.where(F.col("o_orderdate") < cut95)), root,
        committed_at_ms=t0 + 1 * day,
    )
    vt.commit(
        agg(o.where(F.col("o_orderdate") < cut97)), root,
        committed_at_ms=t0 + 2 * day,
    )
    vt.commit(agg(o), root, committed_at_ms=t0 + 40 * day)
    r = vt.expire_snapshots(root, t0 + 30 * day, keep_last=2)
    try:
        vt.read(spark, root, version=1)
        expired_read_fails = False
    except FileNotFoundError:
        expired_read_fails = True
    retained_files_intact = all(
        os.path.isfile(os.path.join(root, f))
        for v in r["retained"]
        for f in vt.files_for(root, v)
    )
    return vt.read(spark, root).select(
        "o_orderstatus",
        "n_orders",
        "total_price",
        F.lit(expired_read_fails).alias("expired_read_fails"),
        F.lit(len(r["deleted_files"]) > 0).alias("expired_files_deleted"),
        F.lit(retained_files_intact).alias("retained_files_intact"),
        F.lit(len(r["retained"])).cast("int").alias("versions_left"),
    )


@query(
    "z_mv_incremental_sales",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS total_price,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders,
       min(o_orderdate) AS first_order,
       max(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderstatus, o_orderpriority
""",
)
def z_mv_incremental_sales(spark, sf_dir):
    """Incrementally-maintained sales materialized view: the stored
    state is built from orders before 1998-01-01, the rest arrives as
    a batch, and operators/mv.py merges the batch's partial aggregate
    into the state WITHOUT re-scanning history. The oracle is the
    full recompute over all orders — the query passes only if the
    algebraic state merge (sum/count add, min/max least/greatest) is
    row-identical to aggregating from scratch. Per-batch cost is
    O(batch) + one outer merge on the touched groups; the decade of
    history is never re-read."""
    from sftp_data_ingestion_spark.operators.mv import (
        aggregate_batch,
        merge_mv_state,
    )

    o = table(spark, sf_dir, "orders")
    keys = ["o_orderstatus", "o_orderpriority"]
    specs = {
        "total_price": ("sum", "o_totalprice"),
        "n_orders": ("count", "o_orderkey"),
        "first_order": ("min", "o_orderdate"),
        "last_order": ("max", "o_orderdate"),
    }
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    state = aggregate_batch(o.where(F.col("o_orderdate") < cutoff), keys, specs)
    batch = o.where(F.col("o_orderdate") >= cutoff)
    merged = merge_mv_state(state, aggregate_batch(batch, keys, specs), keys, specs)
    return merged.withColumn("total_price", F.round("total_price", 2))


@query(
    "z_mv_distinct_users_hll",
    oracle="""
SELECT CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS est_within_5pct
FROM events
""",
)
def z_mv_distinct_users_hll(spark, sf_dir):
    """Mergeable distinct counting — the non-algebraic aggregate the
    plain MV merge (operators/mv.py) correctly refuses: COUNT
    DISTINCT has no bounded additive state, but its HLL SKETCH does.
    One sketch per day is the stored MV state; refreshing the total
    is hll_union over the daily sketches — O(days x 1.5 KB), history
    never re-scanned, exactly the sketch-MV pattern a 100 TB events
    table needs for daily-active/total-active dashboards. Graded as a
    bounded-error boolean (estimate within 5% of exact; HLL lgK=12 is
    ~1.6% rel. err. and deterministic for fixed input), the same
    engine-portable gating used for the ANN recall queries."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rolled = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = e.agg(F.count_distinct("user_id").alias("exact_users"))
    return rolled.crossJoin(exact).select(
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("est_within_5pct"),
    )


@query(
    "z_dq_audit",
    oracle="""
WITH t AS (
  SELECT CASE WHEN o_orderkey % 89 = 0 THEN NULL ELSE o_orderkey END AS o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN -1 ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 83 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 79 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice
  FROM orders
), corrupted AS (
  SELECT * FROM t
  UNION ALL SELECT * FROM t WHERE o_orderkey % 101 = 0
)
SELECT 'orderkey_not_null' AS rule,
       CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_violations
FROM corrupted
UNION ALL
SELECT 'status_in_set',
       CAST(count(*) FILTER (WHERE o_orderstatus IS NOT NULL
             AND o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
FROM corrupted
UNION ALL
SELECT 'price_in_range',
       CAST(count(*) FILTER (WHERE o_totalprice IS NOT NULL
             AND (o_totalprice < 0 OR o_totalprice > 1000000000)) AS BIGINT)
FROM corrupted
UNION ALL
SELECT 'orderkey_unique',
       CAST(coalesce(sum(n - 1), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM corrupted GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'custkey_fk',
       CAST(count(*) AS BIGINT)
FROM corrupted
WHERE o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o_custkey)
""",
)
def z_dq_audit(spark, sf_dir):
    """Data-quality expectations suite over a deterministically
    corrupted orders variant (planted NULL keys, bad statuses,
    negative prices, orphan FK values, duplicated keys — clean data
    would grade every rule at zero and prove nothing). All row rules
    (not_null / in_set / in_range) aggregate in ONE scan — adding a
    rule adds an expression, not a pass; uniqueness is a groupBy on
    the key; the FK check is a broadcast anti-join against the
    customer dimension. operators/expectations.py is the generalized
    form of the reference's ad-hoc gates (header gate, NULL-key
    filter, NFe-digit gate)."""
    from sftp_data_ingestion_spark.operators import expectations as ex

    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    t = o.select(
        F.when(k % 89 == 0, F.lit(None)).otherwise(k).alias("o_orderkey"),
        F.when(k % 97 == 0, F.lit(-1)).otherwise(F.col("o_custkey")).alias("o_custkey"),
        F.when(k % 83 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        F.when(k % 79 == 0, -F.col("o_totalprice")).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    corrupted = t.unionByName(t.where(F.col("o_orderkey") % 101 == 0))
    rules = [
        ex.not_null("orderkey_not_null", "o_orderkey"),
        ex.in_set("status_in_set", "o_orderstatus", ("O", "F", "P")),
        ex.in_range("price_in_range", "o_totalprice", 0, 1_000_000_000),
        ex.unique("orderkey_unique", "o_orderkey"),
        ex.foreign_key(
            "custkey_fk",
            "o_custkey",
            table(spark, sf_dir, "customer"),
            "c_custkey",
        ),
    ]
    return ex.check_expectations(corrupted, rules)


@query(
    "z_stream_mv_merge",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS total_value,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
GROUP BY event_type
""",
)
def z_stream_mv_merge(spark, sf_dir):
    """Continuous MV maintenance: the events fixture arrives as four
    range-partitioned files drained one per trigger, and each micro-
    batch is partial-aggregated and merged into the parquet MV state
    by streaming.stream_mv_merge (foreachBatch + atomic swap + batch-
    id replay guard). The final state must equal the batch GROUP BY
    over all events — the oracle — proving the algebraic merge holds
    across real micro-batch boundaries, not just the two-frame unit
    case. Per-trigger cost is O(batch + touched groups)."""
    import tempfile

    from sftp_data_ingestion_spark import streaming as st

    e = table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )
    chunk_dir = tempfile.mkdtemp(prefix="mv_chunks_")
    e.repartitionByRange(4, "ts").write.mode("overwrite").parquet(chunk_dir)
    state_path = tempfile.mkdtemp(prefix="mv_state_") + "/state"
    ckpt = tempfile.mkdtemp(prefix="mv_ckpt_")
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, "4")
    q = None
    try:
        q = st.stream_mv_merge(
            spark,
            chunk_dir,
            state_path,
            ckpt,
            keys=["event_type"],
            specs={
                "n": ("count", "event_id"),
                "total_value": ("sum", "value"),
                "first_ts": ("min", "ts"),
                "last_ts": ("max", "ts"),
            },
            max_files_per_trigger=1,
        )
        q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()  # stop on failure too — no orphaned stream
        spark.conf.set(key, prev)
    return (
        spark.read.parquet(state_path)
        .select(
            "event_type",
            "n",
            F.round("total_value", 4).alias("total_value"),
            "first_ts",
            "last_ts",
        )
    )


@query(
    "z_forget_users",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events WHERE user_id % 37 <> 0
GROUP BY event_type
""",
)
def z_forget_users(spark, sf_dir):
    """GDPR erasure end-to-end: a deterministic forget-set of users
    is purged from events by broadcast anti-join
    (operators/forget.py), the purged table is COMMITTED to the
    versioned store, and the audit aggregate is computed from the
    committed version read back — so the grade covers the purge, the
    commit, and the read, not just the join. The pre-purge version
    remains for audit until vacuum; the vacuum horizon is the
    compliance knob (see operators/forget.py docstring)."""
    import tempfile

    from sftp_data_ingestion_spark.io import versioned as vt
    from sftp_data_ingestion_spark.operators.forget import forget_keys

    e = table(spark, sf_dir, "events")
    forget = (
        e.select("user_id")
        .distinct()
        .where(F.col("user_id") % 37 == 0)
    )
    purged = forget_keys({"events": (e, "user_id")}, forget, "user_id")[
        "events"
    ]
    root = tempfile.mkdtemp(prefix="forget_")
    vt.commit(e, root)          # v1: pre-purge (audit)
    vt.commit(purged, root)     # v2: erased
    return (
        vt.read(spark, root)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@query(
    "z_concurrency_gauge",
    oracle="""
WITH m AS (
  SELECT ts AS t, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT ts + INTERVAL 30 MINUTE, -1, event_id FROM events
), r AS (
  SELECT t, sum(delta) OVER (
           ORDER BY t, delta, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS gauge
  FROM m
)
SELECT CAST(date_trunc('day', t) AS DATE) AS day,
       CAST(max(gauge) AS BIGINT) AS peak_concurrency
FROM r GROUP BY day
""",
)
def z_concurrency_gauge(spark, sf_dir):
    """Peak concurrency per day: every event opens a 30-minute
    presence interval, +1/-1 markers are prefix-scanned over the
    GLOBAL time order, and the daily max of the running gauge is the
    classic max-overlap sweep. The scan uses the distributed two-pass
    prefix sum (operators/prefix.py: range partition -> local cumsum
    -> P-total offset broadcast), NOT a keyless window — a naive
    Window.orderBy with no partition key would serialize the 100 TB
    marker stream into one task. Ties order (t, delta, event_id):
    the -1 marker sorts before +1 at the same instant, so touching
    intervals don't double-count (half-open semantics)."""
    from sftp_data_ingestion_spark.operators.prefix import (
        global_running_sum,
    )

    e = table(spark, sf_dir, "events")
    starts = e.select(
        F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = e.select(
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    markers = starts.unionByName(ends)
    scanned = global_running_sum(
        markers, ["t", "delta", "event_id"], "delta", out="gauge"
    )
    return (
        scanned.groupBy(
            F.date_trunc("day", F.col("t")).cast("date").alias("day")
        )
        .agg(F.max("gauge").alias("peak_concurrency"))
    )


@query(
    "z_bm25_search",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         (SELECT avg(dl) FROM dl) AS avgdl
  FROM documents
), dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf
  WHERE term IN ('join', 'hash', 'merge') GROUP BY term
), scored AS (
  SELECT t.doc_id,
         round(sum(
           ((s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (t.tf * 2.2)
           / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
         ), 6) AS score
  FROM tf t
  JOIN dfreq f ON t.term = f.term
  JOIN dl d ON t.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT doc_id, score, rnk FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= 10
""",
)
def z_bm25_search(spark, sf_dir):
    """BM25 ranked retrieval for the query {join, hash, merge}: the
    lexical search engine a document corpus needs beside the ANN
    family. k1=1.2, b=0.75, and the same RATIONAL idf as the TF-IDF
    operator — (N - df + 0.5)/(df + 0.5), no logarithm — so every
    per-term score is the identical arithmetic expression in both
    engines; the per-doc sum is rounded to 6 before ranking so
    summation order can't flip ties. Scale shape: tf/df/dl are
    uniform-key aggregates, the query-term filter prunes the tf table
    to |Q| terms before any join, df and corpus stats broadcast, and
    the final top-10 is a
    TakeOrderedAndProject (per-partition top-k, driver merge) with the
    rank assigned over the 10 survivors only."""
    d = table(spark, sf_dir, "documents")
    # scoring lives in ext/textstats.bm25_scored (shared with the RRF
    # fusion query); k1=1.2, b=0.75 reproduce the constants verbatim
    # (1.2+1.0 == 2.2 bit-exactly, checked)
    scored = ts.bm25_scored(d, ["join", "hash", "merge"])
    # global top-k via TakeOrderedAndProject (per-partition top-10 +
    # driver merge), NOT a keyless rank window over every scored doc —
    # the rank is assigned after the limit, over 10 rows
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "doc_id", "score", "rnk"
    )


@query(
    "z_shipping_priority_q3",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
""",
)
def z_shipping_priority_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority) adapted to the fixture columns:
    unshipped-revenue top-10 for one market segment. The canonical
    3-table join + agg + top-k benchmark shape: both date filters and
    the segment filter push to the scans, the customer side reduces
    to keys-only before joining (column pruning), and the top-10
    plans as TakeOrderedAndProject after partial aggregation."""
    c = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    cut = F.lit("1998-03-15 00:00:00").cast("timestamp")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cut)
    l = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cut)
    return (
        c.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
    )


@query(
    "z_large_orders_q18",
    oracle="""
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       CAST(t.sum_qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 25
) t
JOIN orders o ON o.o_orderkey = t.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
""",
)
def z_large_orders_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers) adapted to the fixture: the
    HAVING-on-aggregate semi-reduction shape. The lineitem table
    collapses to one row per qualifying order BEFORE joining orders
    and customer — the aggregate acts as its own semi-join filter, so
    the expensive fact table crosses the join already reduced."""
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 25)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "z_wav_decode_stats",
    oracle="""
WITH s AS (
  SELECT doc_id,
         list_transform(range(256), i ->
           (ascii(substr(text, (i % length(text)) + 1, 1)) - 100) * 256
         ) AS smp
  FROM documents WHERE doc_id % 3 = 1
)
SELECT doc_id AS media_id,
       CAST(256 AS INTEGER) AS n_samples,
       CAST(list_sum(list_transform(smp, x -> abs(x))) AS BIGINT) AS sum_abs,
       CAST(list_max(list_transform(smp, x -> abs(x))) AS INTEGER) AS peak,
       CAST(length(list_filter(range(255), i ->
         smp[i + 1] * smp[i + 2] < 0)) AS INTEGER) AS zero_crossings
FROM s
""",
)
def z_wav_decode_stats(spark, sf_dir):
    """REAL stdlib WAV codec graded end-to-end (the audio analogue of
    m_png_decode_histogram): text bytes become int16 PCM samples,
    round-trip through a real RIFF/WAVE file via the production
    encode/decode path, and reduce to integer magnitude/peak/zero-
    crossing stats the oracle replays with pure byte arithmetic — no
    float tolerance anywhere. Lives here, not q_multimodal, per the
    queries/__init__.py ordering policy."""
    from sftp_data_ingestion_spark.ext import multimodal as mm

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 1)
    return mm.text_wav_stats(docs)


_SHARED_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("z_sql_text_interface", oracle=_SHARED_SQL)
def z_sql_text_interface(spark, sf_dir):
    """SQL-text entry path: ONE shared ANSI string is executed
    verbatim by BOTH engines — Spark parses it with its own SQL
    parser over a registered temp view (`spark.sql`), DuckDB runs the
    identical text as the oracle. This grades the engine's SQL
    surface itself (parser -> Catalyst -> same plan as the DataFrame
    API), not just the DataFrame builders every other query uses; a
    user of the reference who writes raw SQL can run it unchanged."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SHARED_SQL)


@query(
    "z_seasonal_naive_eval",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day
), f AS (
  SELECT event_type, day, n,
         lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS fcst
  FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days_scored,
       round(avg(abs(n - fcst)), 4) AS mae
FROM f WHERE fcst IS NOT NULL
GROUP BY event_type
""",
)
def z_seasonal_naive_eval(spark, sf_dir):
    """Forecast-baseline evaluation: the seasonal-naive forecast
    (today = same weekday last week, lag 7 over per-type daily
    counts) scored by MAE per event type — the sanity baseline every
    time-series monitoring pipeline keeps beside its real model. One
    shuffle to daily counts, one per-type window, one tiny agg; at
    100 TB only the first aggregate touches raw events."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    f = daily.withColumn("fcst", F.lag("n", 7).over(w)).where(
        F.col("fcst").isNotNull()
    )
    return f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.round(F.avg(F.abs(F.col("n") - F.col("fcst"))), 4).alias("mae"),
    )


@query(
    "z_token_bigrams",
    oracle=r"""
WITH docs2 AS (
  SELECT string_split(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS l
  FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, length(l)),
                               i -> {'a': l[i], 'b': l[i + 1]})) AS p
  FROM docs2
), counted AS (
  SELECT p.a AS term, p.b AS nxt, CAST(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY term, nxt
)
SELECT term, nxt, n, rnk FROM (
  SELECT term, nxt, n,
         row_number() OVER (ORDER BY n DESC, term, nxt) AS rnk
  FROM counted
) WHERE rnk <= 20
""",
)
def z_token_bigrams(spark, sf_dir):
    """Corpus-wide top-20 token bigrams — the (context, next-token)
    pair extraction a language-model data pipeline runs for n-gram
    statistics and boilerplate detection. posexplode keeps token
    positions, lead() pairs each token with its successor inside the
    document (never across documents), partial counts combine map-
    side, and the global top-20 plans as TakeOrderedAndProject with
    the rank assigned over the 20 survivors."""
    d = table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    toks = d.select(
        "doc_id", F.posexplode(F.split(norm, " ")).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.withColumn("nxt", F.lead("term").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy("term", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = pairs.orderBy(
        F.col("n").desc(), F.col("term"), F.col("nxt")
    ).limit(20)
    w2 = Window.orderBy(F.col("n").desc(), F.col("term"), F.col("nxt"))
    return top.withColumn("rnk", F.row_number().over(w2)).select(
        "term", "nxt", "n", "rnk"
    )


_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) o
WHERE c.c_custkey < 100
"""


@query("z_sql_lateral_topk", oracle=_LATERAL_SQL)
def z_sql_lateral_topk(spark, sf_dir):
    """LATERAL correlated subquery with per-row ORDER BY ... LIMIT —
    the second shared-SQL-text query (same string, both parsers): the
    top-2-orders-per-customer ask phrased as a lateral join instead
    of a rank window. Catalyst decorrelates it into a join +
    per-group limit rather than executing the subquery per row, which
    is exactly what must happen for this shape to survive 100 TB."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


@query(
    "z_entity_resolution",
    oracle="""
WITH RECURSIVE names AS (
  SELECT DISTINCT p_name, string_split(p_name, ' ')[2] AS block
  FROM part
), pairs AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM names a JOIN names b
    ON a.block = b.block AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 3
), edges AS (
  SELECT name_a AS src, name_b AS dst FROM pairs
  UNION ALL SELECT name_b, name_a FROM pairs
), reach(id, r) AS (
  SELECT p_name, p_name FROM names
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
)
SELECT id AS name, min(r) AS canonical,
       (min(r) = id) AS is_canonical
FROM reach GROUP BY id
""",
)
def z_entity_resolution(spark, sf_dir):
    """Entity resolution end-to-end: the blocked fuzzy join's match
    pairs become edges, connected components assign every name
    variant to a canonical entity (min name reachable — transitive,
    because similarity alone is not), and the survivor flag marks the
    canonical spelling. Composition of z_fuzzy_join_blocked and the
    min-label-propagation CC operator (ext/dedup.py) running on
    STRING ids; graded against a DuckDB recursive-CTE transitive
    closure. The canonical-id assignment is what record linkage
    actually ships — pair lists alone are not actionable."""
    from sftp_data_ingestion_spark.ext.dedup import connected_components

    names = (
        table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.split("p_name", " ").getItem(1))
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(
            F.col("a.p_name").alias("id_a"), F.col("b.p_name").alias("id_b")
        )
    )
    comp = connected_components(
        names.select(F.col("p_name").alias("id")), pairs
    )
    return comp.select(
        F.col("id").alias("name"),
        F.col("component").alias("canonical"),
        (F.col("component") == F.col("id")).alias("is_canonical"),
    )


@query(
    "z_pruned_scan_agg",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts < TIMESTAMP '2024-01-12 00:00:00'
GROUP BY event_type
""",
)
def z_pruned_scan_agg(spark, sf_dir):
    """Manifest-level file skipping graded end-to-end: events are
    committed to the versioned store clustered on epoch seconds (so
    per-file time ranges are disjoint and footer stats land in the
    manifest), then a two-day aggregate reads ONLY the overlapping
    files via read(prune=...) plus the row-level filter. The oracle
    is the plain filtered aggregate over all events — if pruning
    dropped a needed file or kept a wrong range, the hash breaks.
    The query asserts real skipping happened (pruned file set is a
    strict subset) before returning."""
    import tempfile

    from sftp_data_ingestion_spark.io import versioned as vt

    e = table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.unix_timestamp("ts")
    )
    root = tempfile.mkdtemp(prefix="prune_")
    from sftp_data_ingestion_spark.io.layout import clustered

    # repartitionByRange with an EXPLICIT partition count is exempt
    # from AQE coalescing (REPARTITION_BY_NUM shuffle origin), so the
    # 8-file layout is honored without any session conf flip
    # (verified: 8 part files under coalescePartitions=true)
    vt.commit(clustered(e, ["ts_sec"], 8), root, stats_cols=["ts_sec"])
    lo = F.lit("2024-01-10 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-12 00:00:00").cast("timestamp")
    lo_s = 1704844800  # 2024-01-10 00:00:00 UTC
    hi_s = 1705017600  # 2024-01-12 00:00:00 UTC
    kept = vt.files_for(root, prune=("ts_sec", lo_s, hi_s - 1))
    assert len(kept) < len(vt.files_for(root)), "no files were skipped"
    return (
        vt.read(spark, root, prune=("ts_sec", lo_s, hi_s - 1))
        .where((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@query(
    "z_mv_cdc_retraction",
    oracle="""
WITH base AS (
  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
), final AS (
  SELECT event_type,
         CASE WHEN event_id % 13 = 0 AND event_id % 11 <> 0
              THEN value + 10 ELSE value END AS value
  FROM base WHERE event_id % 11 <> 0
  UNION ALL
  SELECT event_type, value FROM events
  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS total
FROM final GROUP BY event_type
""",
)
def z_mv_cdc_retraction(spark, sf_dir):
    """CDC-aware MV maintenance with retraction: the per-type sum/
    count state is built from pre-cutoff events, then a changelog of
    inserts (post-cutoff), deletes (11-divisible ids, retracting
    their old value) and updates (13-divisible ids, +10, contributing
    only the difference) folds in via operators/mv.py:apply_cdc. The
    oracle recomputes the final aggregate from the reconstructed row
    set — the retraction path must land on the same numbers as a full
    rebuild without ever re-reading history."""
    from sftp_data_ingestion_spark.operators.mv import apply_cdc

    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    e = table(spark, sf_dir, "events")
    base = e.where(F.col("ts") < cutoff)
    state = base.groupBy("event_type").agg(
        F.sum("value").alias("total"), F.count(F.lit(1)).alias("n")
    )
    inserts = e.where(F.col("ts") >= cutoff).select(
        "event_type",
        F.lit("I").alias("op"),
        F.col("value"),
        F.lit(None).cast("double").alias("prev_value"),
    )
    deletes = base.where(F.col("event_id") % 11 == 0).select(
        "event_type",
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("value"),
        F.col("value").alias("prev_value"),
    )
    updates = (
        base.where(
            (F.col("event_id") % 13 == 0) & (F.col("event_id") % 11 != 0)
        )
        .select(
            "event_type",
            F.lit("U").alias("op"),
            (F.col("value") + 10).alias("value"),
            F.col("value").alias("prev_value"),
        )
    )
    changes = inserts.unionByName(deletes).unionByName(updates)
    out = apply_cdc(state, changes, ["event_type"], "value")
    return out.select(
        "event_type", "n", F.round("total", 4).alias("total")
    )


@query(
    "z_pseudonymized_join",
    oracle="""
WITH ev AS (
  SELECT sha256('u' || CAST(user_id AS VARCHAR)) AS user_token, event_type
  FROM events
), latest AS (
  SELECT sha256('u' || CAST(user_id AS VARCHAR)) AS user_token,
         max(ts) AS last_seen
  FROM events GROUP BY user_id
)
SELECT e.user_token, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types,
       l.last_seen
FROM ev e JOIN latest l ON e.user_token = l.user_token
GROUP BY e.user_token, l.last_seen
""",
)
def z_pseudonymized_join(spark, sf_dir):
    """Privacy-preserving analytics: the raw user id never appears in
    the output — both sides tokenize it with the same deterministic
    keyed digest (sha2 over a salted rendering; swap in HMAC with a
    managed key in production) and JOIN ON THE TOKEN, proving
    pseudonyms stay consistent across tables so analytics survive the
    masking. The complement of z_forget_users on the GDPR surface:
    erasure removes, pseudonymization lets the rest keep working."""
    e = table(spark, sf_dir, "events")
    token = F.sha2(
        F.concat(F.lit("u"), F.col("user_id").cast("string")), 256
    ).alias("user_token")
    ev = e.select(token, "event_type")
    latest = e.groupBy("user_id").agg(F.max("ts").alias("last_seen")).select(
        token, "last_seen"
    )
    return (
        ev.join(latest, "user_token")
        .groupBy("user_token", "last_seen")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
        )
        .select("user_token", "n_events", "n_types", "last_seen")
    )


@query(
    "z_rolling_active_users",
    oracle="""
WITH presence AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
), anchors AS (SELECT DISTINCT day FROM presence)
SELECT a.day,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau
FROM anchors a JOIN presence p
  ON p.day BETWEEN a.day - 6 AND a.day
GROUP BY a.day
""",
)
def z_rolling_active_users(spark, sf_dir):
    """Trailing-7-day active users per day (WAU curve): raw events
    reduce to a (day, user) presence set FIRST — the expensive
    distinct happens once, at day granularity — and the rolling
    window is then a bounded 7x fan-out join over that tiny presence
    table, never over raw events. Exact distinct across a sliding
    window cannot use a plain window function (distinct doesn't
    decompose); this anchor-join shape is the standard exact form,
    with HLL sketch union (z_mv_distinct_users_hll) as the
    approximate alternative when even presence is too big."""
    e = table(spark, sf_dir, "events")
    presence = e.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "user_id",
    ).distinct()
    anchors = presence.select("day").distinct().select(
        F.col("day").alias("anchor_day")
    )
    return (
        anchors.join(
            presence,
            (F.col("day") >= F.date_sub(F.col("anchor_day"), 6))
            & (F.col("day") <= F.col("anchor_day")),
        )
        .groupBy(F.col("anchor_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@query(
    "z_chunk_documents",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         string_split(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS l
  FROM documents
)
SELECT doc_id, u.i AS chunk_idx,
       array_to_string(l[u.i * 12 + 1 : u.i * 12 + 16], ' ') AS chunk,
       CAST(length(l[u.i * 12 + 1 : u.i * 12 + 16]) AS INTEGER)
         AS n_tokens
FROM t, unnest(range(greatest(1,
         CAST(ceil((length(l) - 4) / 12.0) AS BIGINT)))) AS u(i)
""",
)
def z_chunk_documents(spark, sf_dir):
    """Overlapping-window document chunking (size 16, stride 12 —
    4-token overlap): the retrieval/embedding prep step that sits
    between raw documents and the ANN index. Pure Column work — one
    tokenize, one sequence explode, one slice per chunk; no shuffle
    at all, so chunking runs at scan speed and parallelism at any
    corpus size. Short documents still emit their single (possibly
    sub-size) chunk; chunk_idx makes downstream embedding rows
    addressable back to (doc, offset)."""
    d = table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    t = d.select("doc_id", F.split(norm, " ").alias("l"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("l") - F.lit(4)) / F.lit(12.0)).cast("long"),
    )
    return (
        t.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_chunks - 1)
            ).alias("chunk_idx"),
            "l",
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice(
                    "l", (F.col("chunk_idx") * 12 + 1).cast("int"), 16
                ),
                " ",
            ).alias("chunk"),
            F.size(
                F.slice(
                    "l", (F.col("chunk_idx") * 12 + 1).cast("int"), 16
                )
            ).alias("n_tokens"),
        )
    )


def _probe_vec() -> list[float]:
    """The query vector: the same deterministic sha256 featurizer the
    multimodal kernel uses (ext/multimodal._fake_features), computed
    in plain Python over a fixed probe string — identical literals
    reach both engines."""
    from sftp_data_ingestion_spark.ext.multimodal import _fake_features

    return _fake_features(b"retrieval probe: join order hash", 16)


_CHUNK_FEATURE_SQL = """CAST(CAST(CAST(concat('0x', substr(
    sha256(chunk || chr(0) || chr(0) || chr(0)
                 || CASE WHEN i < 8 THEN chr(0) ELSE chr(1) END),
    (i % 8) * 8 + 1, 8)) AS UBIGINT) AS DOUBLE) / 2147483648 - 1.0
  AS FLOAT)"""


@query(
    "z_rag_retrieval",
    oracle=rf"""
WITH t AS (
  SELECT doc_id,
         string_split(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS l
  FROM documents
), chunks AS (
  SELECT doc_id, u.i AS chunk_idx,
         array_to_string(l[u.i * 12 + 1 : u.i * 12 + 16], ' ') AS chunk
  FROM t, unnest(range(greatest(1,
           CAST(ceil((length(l) - 4) / 12.0) AS BIGINT)))) AS u(i)
), scored AS (
  SELECT doc_id, chunk_idx,
         round(list_sum(list_transform(range(16), i ->
           ({{probe}})[i + 1] * {_CHUNK_FEATURE_SQL})), 6) AS score
  FROM chunks
)
SELECT doc_id, chunk_idx, score, rnk FROM (
  SELECT doc_id, chunk_idx, score,
         row_number() OVER (ORDER BY score DESC, doc_id, chunk_idx) AS rnk
  FROM scored
) WHERE rnk <= 10
""".replace("{probe}", "[" + ", ".join(repr(v) for v in _probe_vec()) + "]"),
)
def z_rag_retrieval(spark, sf_dir):
    """RAG retrieval end-to-end: documents are chunked (same 16/12
    windows as z_chunk_documents), each chunk is embedded with the
    deterministic sha256 featurizer (the multimodal kernel's math as
    pure Column expressions — JVM-side, no Python in the scoring
    path), and the fixed probe vector retrieves the top-10 chunks by
    dot product. One scan, zero shuffles until the TakeOrdered top-k;
    at scale the exact scorer swaps for the ANN family
    (ext/similarity) over the same chunk features — this query grades
    the glue: chunking offsets, embedding math, and ranking all
    hash-checked against the oracle's independent replay."""
    probe = _probe_vec()
    d = table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    t = d.select("doc_id", F.split(norm, " ").alias("l"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("l") - F.lit(4)) / F.lit(12.0)).cast("long"),
    )
    chunks = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
        "l",
    ).select(
        "doc_id",
        "chunk_idx",
        F.array_join(
            F.slice("l", (F.col("chunk_idx") * 12 + 1).cast("int"), 16), " "
        ).alias("chunk"),
    )

    def feature(i: int):
        counter = "\x00" if i < 8 else "\x01"
        hexstr = F.sha2(
            F.encode(
                F.concat(
                    F.col("chunk"), F.lit("\x00\x00\x00" + counter)
                ),
                "utf-8",
            ),
            256,
        )
        v = F.conv(
            F.substring(hexstr, (i % 8) * 8 + 1, 8), 16, 10
        ).cast("double")
        return (v / F.lit(2147483648.0) - 1.0).cast("float")

    score = F.lit(0.0)
    for i in range(16):
        score = score + F.lit(probe[i]) * feature(i).cast("double")
    scored = chunks.select(
        "doc_id", "chunk_idx", F.round(score, 6).alias("score")
    )
    top = scored.orderBy(
        F.col("score").desc(), "doc_id", "chunk_idx"
    ).limit(10)
    w = Window.orderBy(F.col("score").desc(), "doc_id", "chunk_idx")
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "doc_id", "chunk_idx", "score", "rnk"
    )


@query(
    "z_last_touch_attribution",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts FROM (
    SELECT user_id, ts, row_number() OVER (
             PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
), purchases AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
), joined AS (
  SELECT p.ts, p.value,
         CASE WHEN c.ts >= p.ts - INTERVAL 6 HOUR THEN c.ts END AS click_ts
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       round(sum(CASE WHEN click_ts IS NOT NULL THEN value ELSE 0 END), 4)
         AS attributed_revenue,
       round(sum(CASE WHEN click_ts IS NULL THEN value ELSE 0 END), 4)
         AS unattributed_revenue,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM joined GROUP BY day
""",
)
def z_last_touch_attribution(spark, sf_dir):
    """Last-touch marketing attribution: each purchase credits the
    user's most recent click within a 6-hour lookback (the as-of join
    running purchase->click, the mirror of the attribution stream
    join), rolled up to attributed vs unattributed revenue per day.
    Same union-sort as-of engine — one shuffle on user_id, no join
    node, tolerance as post-filter — against DuckDB's native ASOF
    LEFT JOIN as the oracle."""
    from sftp_data_ingestion_spark.operators.temporal import asof_join

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        e.where(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "ts")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_join(
        purchases, clicks, on="ts", by=["user_id"], tolerance="6 hours"
    )
    attributed = F.col("r_ts").isNotNull()
    return (
        j.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .agg(
            F.round(
                F.sum(F.when(attributed, F.col("value")).otherwise(0)), 4
            ).alias("attributed_revenue"),
            F.round(
                F.sum(F.when(~attributed, F.col("value")).otherwise(0)), 4
            ).alias("unattributed_revenue"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
    )


@query(
    "z_deletion_vector_read",
    oracle="""
WITH live AS (
  SELECT * FROM orders
  WHERE o_orderkey % 7 <> 0 AND o_orderkey % 1000 <> 3
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_before_delete
FROM live GROUP BY o_orderstatus
""",
)
def z_deletion_vector_read(spark, sf_dir):
    """Merge-on-read deletion vectors graded end-to-end
    (io/versioned.commit_delete): commit orders, apply TWO delete
    commits (keys ≡ 0 mod 7, then ≡ 3 mod 1000 — DVs must
    accumulate), and read the head — the scan anti-joins the
    broadcast key set against the ORIGINAL untouched data files, so
    a delete costs O(|keys|) at any table size. The graded columns
    carry the post-delete aggregate AND the pre-delete row count via
    time travel to v1 — proving the DV lives in the manifest, not
    the data (a rewrite-style delete would break the time-travel
    count; a missed DV would break the aggregate). Root is
    deterministic per (sf_dir, user), rebuilt each call."""
    import getpass
    import hashlib
    import os
    import shutil
    import tempfile

    from sftp_data_ingestion_spark.io import versioned as vt

    o = table(spark, sf_dir, "orders")
    tag = hashlib.sha1(
        f"{sf_dir}|{getpass.getuser()}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"z_dv_{tag}")
    if os.path.isdir(root):
        shutil.rmtree(root)
    v1 = vt.commit(o, root, committed_at_ms=1)
    vt.commit_delete(
        o.where(F.col("o_orderkey") % 7 == 0).select("o_orderkey"),
        root, "o_orderkey", committed_at_ms=2,
    )
    vt.commit_delete(
        o.where(F.col("o_orderkey") % 1000 == 3).select("o_orderkey"),
        root, "o_orderkey", committed_at_ms=3,
    )
    head = vt.read(spark, root)
    n_before = vt.read(spark, root, version=v1).count()
    return head.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.lit(n_before).cast("long").alias("n_before_delete"),
    )


@query(
    "z_dv_reinsert_scope",
    oracle="""
WITH live AS (
  SELECT o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey % 7 <> 0 AND o_orderkey % 1000 <> 3
  UNION ALL
  SELECT o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey % 14 = 0 AND o_orderkey % 1000 <> 3
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM live GROUP BY o_orderstatus
""",
)
def z_dv_reinsert_scope(spark, sf_dir):
    """Deletion-vector SCOPING graded end-to-end (the r12 semantics
    fix in io/versioned): a DV applies only to data files present at
    its commit version, so a key RE-INSERTED by a later append is not
    erased by the older delete — while a NEWER delete covers the
    appended file too. Sequence: commit orders (v1); delete keys
    ≡0 mod 7 (v2); APPEND the ≡0 mod 14 half of them back (v3 —
    re-insertion, must survive v2's DV); delete keys ≡3 mod 1000
    (v4 — must erase matching rows in BOTH the original and the
    appended files). The oracle derives the surviving multiset
    independently; the pre-fix reader (one DV anti-join over ALL
    files) would silently drop every re-inserted row and
    hash-mismatch. Root deterministic per (sf_dir, user), rebuilt
    each call."""
    import getpass
    import hashlib
    import os
    import shutil
    import tempfile

    from sftp_data_ingestion_spark.io import versioned as vt

    o = table(spark, sf_dir, "orders")
    tag = hashlib.sha1(
        f"{sf_dir}|{getpass.getuser()}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"z_dvscope_{tag}")
    if os.path.isdir(root):
        shutil.rmtree(root)
    vt.commit(o, root, committed_at_ms=1)
    vt.commit_delete(
        o.where(F.col("o_orderkey") % 7 == 0).select("o_orderkey"),
        root, "o_orderkey", committed_at_ms=2,
    )
    vt.commit(
        o.where(F.col("o_orderkey") % 14 == 0), root,
        mode="append", committed_at_ms=3,
    )
    vt.commit_delete(
        o.where(F.col("o_orderkey") % 1000 == 3).select("o_orderkey"),
        root, "o_orderkey", committed_at_ms=4,
    )
    return vt.read(spark, root).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "z_expiry_dv_compose",
    oracle="""
WITH live AS (
  SELECT o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey % 14 = 0
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       TRUE AS expired_files_deleted,
       TRUE AS dv_survives_expiry,
       TRUE AS expired_read_fails
FROM live GROUP BY o_orderstatus
""",
)
def z_expiry_dv_compose(spark, sf_dir):
    """Snapshot expiry × deletion vectors, COMPOSED (both shipped
    r11, never exercised together): v1 is a small overwrite snapshot
    (day 1), v2 overwrites with the full orders table (day 2), v3
    deletes keys ≡0 mod 7 merge-on-read (day 3), v4 appends the
    ≡0 mod 14 half back (day 40, re-insertion under the scoped DV).
    Age-based expiry (cutoff day 30, keep_last=3) must then expire
    ONLY v1 — deleting v1's private files while keeping every file
    the retained manifests reference, INCLUDING the v3 deletion-
    vector file (the sweep walks dv_entries; dropping the DV file
    would resurrect the deleted keys). Graded output: the head read
    after expiry (scoped-DV semantics intact) + flags pinning that
    v1's files are physically gone, the DV file physically survives,
    and time travel to v1 raises."""
    import getpass
    import hashlib
    import os
    import shutil
    import tempfile

    from sftp_data_ingestion_spark.io import versioned as vt

    o = table(spark, sf_dir, "orders")
    tag = hashlib.sha1(
        f"{sf_dir}|{getpass.getuser()}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"z_expdv_{tag}")
    if os.path.isdir(root):
        shutil.rmtree(root)
    day = 86_400_000
    t0 = 1_700_000_000_000
    vt.commit(
        o.where(F.col("o_orderkey") < 100), root,
        committed_at_ms=t0 + 1 * day,
    )
    vt.commit(o, root, committed_at_ms=t0 + 2 * day)
    v3 = vt.commit_delete(
        o.where(F.col("o_orderkey") % 7 == 0).select("o_orderkey"),
        root, "o_orderkey", committed_at_ms=t0 + 3 * day,
    )
    vt.commit(
        o.where(F.col("o_orderkey") % 14 == 0), root,
        mode="append", committed_at_ms=t0 + 40 * day,
    )
    dv_files = vt._read_manifest(root, v3)["dv_entries"][-1]["files"]
    r = vt.expire_snapshots(root, t0 + 30 * day, keep_last=3)
    dv_survives = all(
        os.path.isfile(os.path.join(root, f)) for f in dv_files
    )
    try:
        vt.read(spark, root, version=1)
        expired_read_fails = False
    except FileNotFoundError:
        expired_read_fails = True
    return vt.read(spark, root).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    ).select(
        "*",
        F.lit(len(r["deleted_files"]) > 0).alias("expired_files_deleted"),
        F.lit(dv_survives).alias("dv_survives_expiry"),
        F.lit(expired_read_fails).alias("expired_read_fails"),
    )
