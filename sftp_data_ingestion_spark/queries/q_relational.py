"""Relational breadth (SURVEY §2.11): joins, aggregates, grouping
sets/rollup/cube, set ops, semi/anti joins, sorts/top-k, approx
aggregates, JSON scalar work — all Spark built-ins, declared so the
driver's oracle exercises them.

Float discipline: aggregate outputs over DOUBLE inputs are rounded in
BOTH dialects (same literal digits) so the order-insensitive value
hash is immune to summation-order ULP drift; raw pass-through doubles
are left untouched (bit-identical in parquet).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sftp_data_ingestion_spark.queries.registry import query, table


def _views(spark, sf_dir, *names):
    out = []
    for n in names:
        df = table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out.append(df)
    return out


# ---------------------------------------------------------------------------
# G — aggregations
# ---------------------------------------------------------------------------


@query(
    "g_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def g_q1_pricing_summary(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "g_distinct_and_counts",
    oracle="""
SELECT o_orderstatus,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderstatus
""",
)
def g_distinct_and_counts(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "g_approx_aggregates",
    oracle="""
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_users_ok,
       round(quantile_cont(value, 0.5), 6) AS p50_exact,
       TRUE AS p50_ok,
       round(quantile_cont(value, 0.95), 6) AS p95_exact,
       TRUE AS p95_ok
FROM events
""",
)
def g_approx_aggregates(spark, sf_dir):
    """Approximate aggregates graded by bounded error: the sketch
    results (HLL++, KLL) are engine-specific, so the query emits the
    exact values plus booleans asserting the approximation landed
    within tolerance — rel. 5% for the distinct count, between the
    p45/p55 (p93/p97) exact quantiles for the percentile sketches.
    The oracle computes the exact values and TRUE."""
    e = table(spark, sf_dir, "events")
    agg = e.agg(
        F.approx_count_distinct("user_id").alias("au"),
        F.countDistinct("user_id").alias("exact_users"),
        F.percentile_approx("value", 0.5).alias("ap50"),
        F.percentile_approx("value", 0.95).alias("ap95"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.45)").alias("p45"),
        F.expr("percentile(value, 0.55)").alias("p55"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("percentile(value, 0.93)").alias("p93"),
        F.expr("percentile(value, 0.97)").alias("p97"),
    )
    return agg.select(
        "exact_users",
        (
            F.abs(F.col("au") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("approx_users_ok"),
        F.round("p50", 6).alias("p50_exact"),
        F.col("ap50").between(F.col("p45"), F.col("p55")).alias("p50_ok"),
        F.round("p95", 6).alias("p95_exact"),
        F.col("ap95").between(F.col("p93"), F.col("p97")).alias("p95_ok"),
    )


@query(
    "g_exact_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90
FROM events GROUP BY event_type
""",
)
def g_exact_percentiles(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube
# ---------------------------------------------------------------------------


@query(
    "g_rollup_region_nation",
    oracle="""
SELECT r_name, n_name, count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def g_rollup_region_nation(spark, sf_dir):
    c, n, r = _views(spark, sf_dir, "customer", "nation", "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "g_cube_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def g_cube_status_priority(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "g_grouping_sets",
    oracle="""
SELECT c_mktsegment, c_nationkey, count(*) AS n
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
""",
)
def g_grouping_sets(spark, sf_dir):
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, count(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


# ---------------------------------------------------------------------------
# J — joins (inner multi-way, broadcast, semi, anti, outer)
# ---------------------------------------------------------------------------


@query(
    "j_revenue_by_nation",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def j_revenue_by_nation(spark, sf_dir):
    l, o, c, n = _views(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "j_semi_join_active_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
""",
)
def j_semi_join_active_customers(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "j_anti_join_inactive_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def j_anti_join_inactive_customers(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "j_outer_join_order_counts",
    oracle="""
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
""",
)
def j_outer_join_order_counts(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


@query(
    "s_union_distinct",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
""",
)
def s_union_distinct(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@query(
    "s_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 0
""",
)
def s_intersect(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 0).select("c_custkey")
    return a.intersect(b)


@query(
    "s_except_all",
    oracle="""
SELECT o_custkey FROM orders
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def s_except_all(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select("o_custkey").exceptAll(
        o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    )


# ---------------------------------------------------------------------------
# sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "s_top10_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
)
def s_top10_orders(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# JSON / analytic windows over events
# ---------------------------------------------------------------------------


@query(
    "e_json_extract",
    oracle="""
SELECT event_id, CAST(json_extract(props, '$.k') AS VARCHAR) AS k_raw,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
FROM events
""",
)
def e_json_extract(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_raw"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
    )


@query(
    "e_lag_lead_sessions",
    oracle="""
SELECT event_id, user_id, ts,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       round(value - lag(value) OVER w, 6) AS value_delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def e_lag_lead_sessions(spark, sf_dir):
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


@query(
    "e_hourly_windowed_agg",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
""",
)
def e_hourly_windowed_agg(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "e_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS src, next_type AS dst, count(*) AS c
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT src, sum(c) AS t FROM pairs GROUP BY src
)
SELECT p.src, p.dst, CAST(p.c AS BIGINT) AS n_transitions,
       round(p.c * 1.0 / t.t, 6) AS p_transition
FROM pairs p JOIN tot t USING (src)
""",
)
def e_transition_matrix(spark, sf_dir):
    """Per-user event-type transition matrix (the Markov building
    block under attribution / next-event prediction): order each
    user's events by time, pair each with its successor, and
    row-normalize the transition counts. One window partitioned by
    user (never global — sessions sort within their own key), one
    partial-aggregating groupBy on the (src, dst) pair whose
    cardinality is |event types|², corpus-size independent; the
    row totals broadcast back onto that tiny matrix."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    pairs = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pairs.groupBy("src").agg(F.sum("c").alias("t"))
    return (
        pairs.join(F.broadcast(tot), "src")
        .select(
            "src", "dst", F.col("c").alias("n_transitions"),
            F.round(F.col("c") * 1.0 / F.col("t"), 6).alias("p_transition"),
        )
    )
