"""Additional relational breadth: salted aggregation (skew path),
correlated/scalar subqueries, conditional aggregation, arg-max
(max_by), string-function battery, date part extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from sftp_data_ingestion_spark.operators.skew import salted_count_sum
from sftp_data_ingestion_spark.queries.registry import query, table


@query(
    "g_salted_agg_skew",
    oracle="""
SELECT l_returnflag, count(*) AS n,
       CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2))), 2)
            AS DECIMAL(25,2)) AS DOUBLE) AS sum_l_extendedprice
FROM lineitem GROUP BY l_returnflag
""",
)
def g_salted_agg_skew(spark, sf_dir):
    """Salted two-stage aggregation over a 3-value (maximally skewed)
    key — result identical to a plain GROUP BY, which is exactly what
    the oracle checks. Decimal sum keeps cross-engine exactness; the
    final DOUBLE cast is only the output boundary (DECIMAL columns hash
    differently across the driver's fetch paths)."""
    l = table(spark, sf_dir, "lineitem").withColumn(
        "l_extendedprice", F.col("l_extendedprice").cast("decimal(15,2)")
    )
    out = salted_count_sum(
        l, keys=["l_returnflag"], sum_cols=["l_extendedprice"]
    )
    return out.select(
        "l_returnflag",
        "n",
        F.col("sum_l_extendedprice")
        .cast("decimal(25,2)")
        .cast("double")
        .alias("sum_l_extendedprice"),
    )


@query(
    "j_scalar_subquery_above_avg",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
""",
)
def j_scalar_subquery_above_avg(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        """
    )


@query(
    "j_correlated_exists",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 400000)
""",
)
def j_correlated_exists(spark, sf_dir):
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
        """
    )


@query(
    "g_conditional_agg",
    oracle="""
SELECT o_custkey,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(15,2)))
            FILTER (WHERE o_orderpriority LIKE '1%'), 2) AS DECIMAL(25,2))
            AS DOUBLE) AS urgent_total
FROM orders GROUP BY o_custkey
""",
)
def g_conditional_agg(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(15,2)")
    return o.groupBy("o_custkey").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.sum(F.when(F.col("o_orderpriority").like("1%"), price))
        .cast("decimal(25,2)")
        .cast("double")
        .alias("urgent_total"),
    )


@query(
    "g_argmax_per_group",
    oracle="""
SELECT o_custkey,
       arg_max(o_orderstatus, o_orderkey) AS latest_status,
       arg_min(o_orderpriority, o_orderkey) AS first_priority,
       max(o_orderkey) AS max_key
FROM orders GROUP BY o_custkey
""",
)
def g_argmax_per_group(spark, sf_dir):
    """max_by/min_by on a UNIQUE ordering key (o_orderkey) so the
    arg-extremum is deterministic in both engines."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderstatus", "o_orderkey").alias("latest_status"),
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "f6_string_battery",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS up, lower(c_mktsegment) AS lo,
       substr(c_name, 1, 8) AS prefix,
       strpos(c_name, '#') AS hash_pos,
       replace(c_name, 'Customer', 'Cliente') AS replaced,
       lpad(CAST(c_custkey AS VARCHAR), 10, '*') AS padded,
       reverse(c_mktsegment) AS rev,
       length(c_name) AS n_chars,
       concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS joined,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated
FROM customer
""",
)
def f6_string_battery(spark, sf_dir):
    """F6 string-surgery helpers as a battery (upper/lower/substr/
    instr/replace/lpad/reverse/length/concat_ws/translate)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cliente")).alias(
            "replaced"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "*").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.length("c_name").alias("n_chars"),
        F.concat_ws(
            "-", "c_mktsegment", F.col("c_nationkey").cast("string")
        ).alias("joined"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translated"),
    )


@query(
    "f7_date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(day(o_orderdate) AS INTEGER) AS d,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
            AS INTEGER) AS days_since_95
FROM orders
""",
)
def f7_date_parts(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_95"),
    )


@query(
    "j_salted_join_hot_key",
    oracle="""
SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders
FROM (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1
              ELSE o_custkey % 25 + 1 END AS hot_key
  FROM orders
) f JOIN nation ON nation.n_nationkey = f.hot_key
GROUP BY n_name
""",
)
def j_salted_join_hot_key(spark, sf_dir):
    """Salted broadcast join on a DELIBERATELY skewed fact key (a
    third of all orders map to key 1 — a single reducer's worth under
    a plain shuffle join): fact side salts, dim replicates across
    salts inside the broadcast, and the hot key's rows spread over
    num_salts tasks. Result must equal the plain join, which is
    exactly what the oracle computes."""
    from sftp_data_ingestion_spark.operators.skew import salted_join_hot_keys

    o = table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("o_custkey") % 25 + 1)
        .cast("long")
        .alias("n_nationkey")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join_hot_keys(o, n, key="n_nationkey")
    return joined.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_orders"))
