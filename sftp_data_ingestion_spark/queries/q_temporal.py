"""Temporal joins + advanced relational breadth: as-of join (checked
against DuckDB's native ASOF JOIN), bucketed range join, pivot,
running-window frames, array ops, batch sessionization (checked
against a gaps-and-islands formulation)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.operators.temporal import (
    asof_join,
    range_join_overlap,
)
from sftp_data_ingestion_spark.queries.registry import query, table
from sftp_data_ingestion_spark.rebalance import fan_out

# deduped purchases: at most one right row per (user_id, ts) so the
# as-of pick is deterministic in both engines
_PURCHASES = """
SELECT user_id, ts, value FROM (
  SELECT user_id, ts, value, row_number() OVER (
           PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
) WHERE rn = 1
"""


def _purchases_df(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    return (
        e.where(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )


@query(
    "a_asof_join_backward",
    oracle=f"""
WITH purchases AS ({_PURCHASES}),
clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS last_purchase_ts,
       r.value AS last_purchase_value
FROM clicks l ASOF LEFT JOIN purchases r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def a_asof_join_backward(spark, sf_dir):
    """Latest purchase at-or-before each click, per user — the classic
    as-of shape (pandas merge_asof / DuckDB ASOF JOIN), as a Spark
    composition (equi+range join -> keep-latest window)."""
    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        clicks, _purchases_df(spark, sf_dir), on="ts", by=["user_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("r_ts").alias("last_purchase_ts"),
        F.col("r_value").alias("last_purchase_value"),
    )


@query(
    "a_asof_join_tolerance",
    oracle=f"""
WITH purchases AS ({_PURCHASES}),
clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT l.event_id, l.user_id, l.ts,
       CASE WHEN r.ts >= l.ts - INTERVAL 6 HOUR THEN r.ts END AS last_purchase_ts,
       CASE WHEN r.ts >= l.ts - INTERVAL 6 HOUR THEN r.value END AS last_purchase_value
FROM clicks l ASOF LEFT JOIN purchases r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def a_asof_join_tolerance(spark, sf_dir):
    """Same, bounded to a 6 h lookback — the tolerance both defines the
    semantics and bounds the join's candidate buckets (the 100 TB
    path). Oracle: unbounded ASOF with matches outside tolerance
    nulled — equivalent, since the closest match is in-tolerance iff
    any match is."""
    e = table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        clicks,
        _purchases_df(spark, sf_dir),
        on="ts",
        by=["user_id"],
        tolerance="6 hours",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("r_ts").alias("last_purchase_ts"),
        F.col("r_value").alias("last_purchase_value"),
    )


@query(
    "a_asof_keyless_global",
    oracle="""
WITH r AS (SELECT ts, max(event_id) AS event_id FROM events GROUP BY ts),
l AS (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders)
SELECT l.o_orderkey, l.ts, r.ts AS r_ts, r.event_id AS r_event_id
FROM l ASOF LEFT JOIN r ON l.ts >= r.ts
""",
)
def a_asof_keyless_global(spark, sf_dir):
    """KEYLESS (empty ``by``) global as-of: every order matched to the
    latest event tick at-or-before its order date — the global
    mark-to-market shape (one reference time series, no join key).
    Exercises the range-partitioned time axis + boundary carry-over
    path in :func:`operators.temporal.asof_join` (a naive keyless
    window would serialize the union through ONE sort partition; see
    tests/test_plans.py::test_keyless_asof_range_partitions_time_axis).
    The right side pre-aggregates to one row per timestamp so the
    as-of pick is deterministic under ties."""
    e = table(spark, sf_dir, "events")
    ticks = e.groupBy("ts").agg(F.max("event_id").alias("event_id"))
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("timestamp").alias("ts")
    )
    return asof_join(orders, ticks, on="ts", by=[]).select(
        "o_orderkey", "ts", "r_ts", "r_event_id"
    )


@query(
    "a_range_join_signup_window",
    oracle="""
WITH signups AS (
  SELECT user_id, ts AS signup_ts, ts + INTERVAL 1 DAY AS window_end
  FROM events WHERE event_type = 'signup' AND user_id % 10 = 0
)
SELECT s.user_id AS signup_user, s.signup_ts,
       e.event_id, e.event_type, e.ts
FROM signups s
JOIN events e ON e.ts >= s.signup_ts AND e.ts < s.window_end
""",
)
def a_range_join_signup_window(spark, sf_dir):
    """Points-in-interval join: all events inside the 1-day window
    after each signup, via the bucketed range-join operator. The
    signup side is restricted to a deterministic 1-in-10 user subset:
    the unrestricted join emits ~660k rows at sf0.01, which costs the
    correctness gate an order of magnitude more compare time than any
    other query while exercising the identical bucketed-join plan."""
    e = table(spark, sf_dir, "events")
    signups = e.where(
        (F.col("event_type") == "signup") & (F.col("user_id") % 10 == 0)
    ).select(
        F.col("user_id").alias("signup_user"),
        F.col("ts").alias("signup_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("window_end"),
    )
    points = e.select("event_id", "event_type", "ts")
    out = range_join_overlap(
        signups, points, "signup_ts", "window_end", "ts", bucket="1 day"
    )
    return out.select(
        "signup_user", "signup_ts", "event_id", "event_type", "ts"
    )


@query(
    "p_pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority
""",
)
def p_pivot_status_by_priority(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )


@query(
    "p_unpivot_lineitem_metrics",
    oracle="""
SELECT metric,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS total,
       round(min(value), 4) AS vmin,
       round(max(value), 4) AS vmax
FROM (
  UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax
           FROM lineitem)
  ON l_quantity, l_extendedprice, l_discount, l_tax
  INTO NAME metric VALUE value
)
GROUP BY metric
""",
)
def p_unpivot_lineitem_metrics(spark, sf_dir):
    """UNPIVOT (melt) — the inverse of the pivot operator: four
    numeric lineitem measures melt to (metric, value) rows and
    aggregate per metric. Spark's native `unpivot` plans as a
    generator expand (no shuffle before the final groupBy), matching
    DuckDB's UNPIVOT."""
    li = table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )
    return melted.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


@query(
    "w_ntile_percent_rank",
    oracle="""
SELECT o_orderkey,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(o_totalprice AS DECIMAL(15,2)), o_orderkey)
""",
)
def w_ntile_percent_rank(spark, sf_dir):
    """Distribution-analytic window battery: ntile quartiles,
    percent_rank, cume_dist per order-priority partition — the
    remaining analytic window family beyond rank/lag/frames (the
    DECIMAL order key avoids float-comparison ties diverging between
    engines)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").cast("decimal(15,2)"), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "w_running_frames",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DECIMAL(18,2)) AS DOUBLE) AS running_total,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS DECIMAL(18,2)) AS DOUBLE) AS moving_sum3,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
                    o_orderkey) AS price_rank
FROM orders
""",
)
def w_running_frames(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # DECIMAL inside the frames: float prefix sums land on round-
    # boundary ULP disagreements between engines; decimal sums are exact.
    # DOUBLE only at the output boundary (DECIMAL columns hash
    # differently across the driver's fetch paths).
    price = F.col("o_totalprice").cast("decimal(15,2)")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(price)
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("running_total"),
        F.sum(price)
        .over(wo.rowsBetween(-2, Window.currentRow))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("moving_sum3"),
        F.rank()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                F.col("o_totalprice").desc(), F.col("o_orderkey")
            )
        )
        .alias("price_rank"),
    )


@query(
    "t_array_ops",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       array_to_string(list_sort(string_split(text, ' '))[1:3], '|') AS first3_sorted,
       list_contains(string_split(text, ' '), 'spark') AS mentions_spark,
       list_position(string_split(text, ' '), 'spark') IS NOT NULL
         AND list_position(string_split(text, ' '), 'spark') > 0 AS found_flag
FROM documents
""",
)
def t_array_ops(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.concat_ws("|", F.slice(F.array_sort(toks), 1, 3)).alias(
            "first3_sorted"
        ),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        (F.array_position(toks, "spark") > 0).alias("found_flag"),
    )


@query(
    "s_sessionize_batch",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         -- strictly > : session_window merges while ts <= prev_end
         -- (verified empirically: an exact-30-min gap MERGES;
         -- gap + 1s splits), matching this gaps-and-islands rule
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM marked
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_no
""",
)
def s_sessionize_batch(spark, sf_dir):
    """Native session_window in batch mode, hash-checked against the
    classic gaps-and-islands SQL formulation — proves the built-in
    operator's semantics relationally.

    The session aggregation's partial pass (per-user ts sort + session
    merge) is the query's real compute; on a few-split scan it ran in
    ONE task (driver task-time probe: 0.67 s task time ~= wall at 32
    cores). fan_out by user_id pre-spreads it — the aggregate's
    ClusteredDistribution(user_id) reuses the exchange, so the plan
    keeps exactly one Exchange (r14: 0.57 -> 0.45 s at sf0.1; no-op at
    scale where the scan is already wide)."""
    e = fan_out(table(spark, sf_dir, "events"), "user_id")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
