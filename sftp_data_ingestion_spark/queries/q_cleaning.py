r"""Cleaning-expression queries (F1-F14) with DuckDB oracles.

The fixture tables carry no pedidos-shaped dirty strings, so each
query first DERIVES a dirty string deterministically from fixture
values (same derivation spelled in both dialects), then applies the
cleaning operator under test. The oracle applies the ``*_sql`` twin
from :mod:`sftp_data_ingestion_spark.functions.cleaning` to the same
derived string, so a hash match proves branch-for-branch parity of
the cascade (reference: /root/reference/python/03_upsert_dw_pedidos.py:22-171).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sftp_data_ingestion_spark.functions import cleaning as cl
from sftp_data_ingestion_spark.queries.registry import query, table

# ---------------------------------------------------------------------------
# F1 — trim-to-NULL
# ---------------------------------------------------------------------------

_F1_DERIVE = "CASE WHEN c_custkey % 7 = 0 THEN '   ' ELSE '  ' || c_name || '  ' END"


@query(
    "f1_null_if_blank",
    oracle=f"""
SELECT c_custkey, {cl.null_if_blank_sql(_F1_DERIVE)} AS cleaned
FROM customer
""",
)
def f1_null_if_blank(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    raw = F.when(F.col("c_custkey") % 7 == 0, F.lit("   ")).otherwise(
        F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))
    )
    return c.select("c_custkey", cl.null_if_blank(raw).alias("cleaned"))


# ---------------------------------------------------------------------------
# F2 — digit extraction (+ CNPJ/CPF strip-to-null shape)
# ---------------------------------------------------------------------------

_F2_DERIVE = "'a-' || CAST(c_custkey AS VARCHAR) || '/' || CAST(c_nationkey AS VARCHAR)"


@query(
    "f2_digits_only",
    oracle=f"""
SELECT c_custkey,
       {cl.digits_only_sql(_F2_DERIVE)} AS digits,
       {cl.strip_digits_to_null_sql("CASE WHEN c_custkey % 11 = 0 THEN '-/.' ELSE " + _F2_DERIVE + " END")} AS cnpj
FROM customer
""",
)
def f2_digits_only(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    raw = F.concat(
        F.lit("a-"),
        F.col("c_custkey").cast("string"),
        F.lit("/"),
        F.col("c_nationkey").cast("string"),
    )
    cnpj_raw = F.when(F.col("c_custkey") % 11 == 0, F.lit("-/.")).otherwise(raw)
    return c.select(
        "c_custkey",
        cl.digits_only(raw).alias("digits"),
        cl.strip_digits_to_null(cnpj_raw).alias("cnpj"),
    )


# ---------------------------------------------------------------------------
# F3 — 44-digit NFe key gate
# ---------------------------------------------------------------------------

_F3_DERIVE = (
    "CASE WHEN o_orderkey % 2 = 0 THEN lpad(CAST(o_orderkey AS VARCHAR), 44, '0') "
    "ELSE lpad(CAST(o_orderkey AS VARCHAR), 43, '0') END"
)


@query(
    "f3_nfe_key_44",
    oracle=f"""
SELECT o_orderkey, {cl.nfe_key_44_sql(_F3_DERIVE)} AS chave_nfe
FROM orders
""",
)
def f3_nfe_key_44(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    raw = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.lpad(F.col("o_orderkey").cast("string"), 44, "0"),
    ).otherwise(F.lpad(F.col("o_orderkey").cast("string"), 43, "0"))
    return o.select("o_orderkey", cl.nfe_key_44(raw).alias("chave_nfe"))


# ---------------------------------------------------------------------------
# F4 — UF validation
# ---------------------------------------------------------------------------

_F4_DERIVE = (
    "CASE WHEN c_custkey % 5 = 0 "
    "THEN substr(c_mktsegment, 1, 1 + c_custkey % 4) || '9' "
    "ELSE ' ' || substr(c_mktsegment, 1, 1 + c_custkey % 4) || ' ' END"
)


@query(
    "f4_clean_uf",
    oracle=f"""
SELECT c_custkey, {cl.clean_uf_sql(_F4_DERIVE)} AS uf
FROM customer
""",
)
def f4_clean_uf(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    frag = F.substring(F.col("c_mktsegment"), F.lit(1), (F.col("c_custkey") % 4) + 1)
    raw = F.when(
        F.col("c_custkey") % 5 == 0, F.concat(frag, F.lit("9"))
    ).otherwise(F.concat(F.lit(" "), frag, F.lit(" ")))
    return c.select("c_custkey", cl.clean_uf(raw).alias("uf"))


# ---------------------------------------------------------------------------
# F7 — multi-format DATE parser (all 5 branch families + sentinel)
# ---------------------------------------------------------------------------

_F7_DERIVE = """CASE o_orderkey % 6
  WHEN 0 THEN strftime(o_orderdate, '%d/%m/%Y')
  WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
  WHEN 2 THEN strftime(o_orderdate, '%d-%m-%Y')
  WHEN 3 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M')
  WHEN 4 THEN strftime(o_orderdate, '%Y%m%d')
  ELSE '00/00/0000' END"""


@query(
    "f7_parse_date_multi",
    oracle=f"""
SELECT o_orderkey, {cl.parse_date_multi_sql(_F7_DERIVE)} AS parsed
FROM orders
""",
)
def f7_parse_date_multi(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 6
    d = F.col("o_orderdate")
    raw = (
        F.when(k == 0, F.date_format(d, "dd/MM/yyyy"))
        .when(k == 1, F.date_format(d, "dd/MM/yyyy HH:mm:ss"))
        .when(k == 2, F.date_format(d, "dd-MM-yyyy"))
        .when(k == 3, F.date_format(d, "yyyy-MM-dd'T'HH:mm"))
        .when(k == 4, F.date_format(d, "yyyyMMdd"))
        .otherwise(F.lit("00/00/0000"))
    )
    return o.select("o_orderkey", cl.parse_date_multi(raw).alias("parsed"))


# ---------------------------------------------------------------------------
# F8 — multi-format TIMESTAMP parser (both reference shapes)
# ---------------------------------------------------------------------------

_F8_DERIVE = """CASE event_id % 4
  WHEN 0 THEN strftime(date_trunc('second', ts), '%d/%m/%Y %H:%M:%S')
  WHEN 1 THEN strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%S') || 'Z'
  WHEN 2 THEN strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M')
  ELSE strftime(date_trunc('second', ts), '%d/%m/%Y') END"""


@query(
    "f8_parse_timestamp_multi",
    oracle=f"""
SELECT event_id,
       {cl.parse_timestamp_multi_sql(_F8_DERIVE, iso_extras=True)} AS parsed_ocr,
       {cl.parse_timestamp_multi_sql(_F8_DERIVE, iso_extras=False)} AS parsed_chegada,
       {cl.null_if_blank_sql(_F8_DERIVE)} AS raw_kept
FROM events
""",
)
def f8_parse_timestamp_multi(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    k = F.col("event_id") % 4
    t = F.date_trunc("second", F.col("ts"))
    raw = (
        F.when(k == 0, F.date_format(t, "dd/MM/yyyy HH:mm:ss"))
        .when(k == 1, F.concat(F.date_format(t, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")))
        .when(k == 2, F.date_format(t, "yyyy-MM-dd HH:mm"))
        .otherwise(F.date_format(t, "dd/MM/yyyy"))
    )
    return e.select(
        "event_id",
        cl.parse_timestamp_multi(raw, iso_extras=True).alias("parsed_ocr"),
        cl.parse_timestamp_multi(raw, iso_extras=False).alias("parsed_chegada"),
        # F9: raw retention rides along, as in the reference (:84)
        cl.null_if_blank(raw).alias("raw_kept"),
    )


# ---------------------------------------------------------------------------
# F12 — locale-aware decimal parser (6 derivation branches)
# ---------------------------------------------------------------------------

# en-US grouped "1,234.56" built from integer grouping + the decimal
# string's own 2 fraction digits (DuckDB's fmt rejects {:,.2f} on
# floats; this stays exact decimal arithmetic in both engines)
_ENUS_GROUPED = (
    "format('{:,}', CAST(floor(o_totalprice) AS BIGINT)) || '.' || "
    "right(CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR), 2)"
)

_F12_DERIVE = f"""CASE o_orderkey % 6
  WHEN 0 THEN CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR)
  WHEN 1 THEN replace(CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR), '.', ',')
  WHEN 2 THEN CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR)
  WHEN 3 THEN 'R$ ' || replace(CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR), '.', ',')
  WHEN 4 THEN translate({_ENUS_GROUPED}, '.,', ',.')
  ELSE {_ENUS_GROUPED} END"""


@query(
    "f12_parse_decimal",
    oracle=f"""
SELECT o_orderkey, CAST({cl.parse_decimal_sql(_F12_DERIVE, 15, 2)} AS DOUBLE) AS valor
FROM orders
""",
)
def f12_parse_decimal(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 6
    dec = F.col("o_totalprice").cast("decimal(15,2)")
    s = dec.cast("string")
    comma = F.replace(s, F.lit("."), F.lit(","))
    grouped = F.format_number(dec, 2)  # en-US 1,234.56
    raw = (
        F.when(k == 0, s)
        .when(k == 1, comma)
        .when(k == 2, F.floor(F.col("o_totalprice")).cast("bigint").cast("string"))
        .when(k == 3, F.concat(F.lit("R$ "), comma))  # fallback-branch input
        .when(k == 4, F.translate(grouped, ".,", ",."))  # pt-BR 1.234,56
        .otherwise(grouped)  # en-US grouped
    )
    # Final output cast to DOUBLE: DECIMAL-typed result columns hash
    # differently across the driver's DuckDB/Spark fetch paths (scale-2
    # "1234.50" vs float64 "1234.5") even when values are exactly equal.
    # The parse itself stays DECIMAL(15,2) for exact locale semantics.
    return o.select(
        "o_orderkey", cl.parse_decimal(raw, 15, 2).cast("double").alias("valor")
    )


# ---------------------------------------------------------------------------
# F13 — digits -> INT
# ---------------------------------------------------------------------------

_F13_DERIVE = (
    "CASE WHEN o_orderkey % 9 = 0 THEN 'abc' "
    "ELSE CAST(CAST(floor(o_totalprice / 100) AS BIGINT) AS VARCHAR) || ' un' END"
)


@query(
    "f13_digits_to_int",
    oracle=f"""
SELECT o_orderkey, {cl.digits_to_int_sql(_F13_DERIVE)} AS qtd
FROM orders
""",
)
def f13_digits_to_int(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    raw = F.when(F.col("o_orderkey") % 9 == 0, F.lit("abc")).otherwise(
        F.concat(
            F.floor(F.col("o_totalprice") / 100).cast("bigint").cast("string"),
            F.lit(" un"),
        )
    )
    return o.select("o_orderkey", cl.digits_to_int(raw).alias("qtd"))


# ---------------------------------------------------------------------------
# F5 — regex predicate dispatch (rlike guards as first-class output)
# ---------------------------------------------------------------------------

_F5_DERIVE = """CASE o_orderkey % 3
  WHEN 0 THEN strftime(o_orderdate, '%d/%m/%Y')
  WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
  ELSE o_orderpriority END"""


@query(
    "f5_regex_dispatch",
    oracle=f"""
SELECT o_orderkey,
       regexp_matches(TRIM({_F5_DERIVE}), '{cl.RE_DMY_OPT_TIME}') AS is_dmy,
       regexp_matches(TRIM({_F5_DERIVE}), '{cl.RE_ISO_OPT_TIME}') AS is_iso
FROM orders
""",
)
def f5_regex_dispatch(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 3
    raw = (
        F.when(k == 0, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .when(k == 1, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.col("o_orderpriority"))
    )
    t = F.trim(raw)
    return o.select(
        "o_orderkey",
        t.rlike(cl.RE_DMY_OPT_TIME).alias("is_dmy"),
        t.rlike(cl.RE_ISO_OPT_TIME).alias("is_iso"),
    )


# ---------------------------------------------------------------------------
# F11 — typed -> string demotion (with F14 GREATEST riding along)
# ---------------------------------------------------------------------------


@query(
    "f11_demote_formats",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS ts_demoted,
       strftime(o_orderdate, '%d/%m/%Y') AS date_demoted,
       strftime(o_orderdate, '%H:%M:%S') AS time_demoted,
       greatest(o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS greatest_ts
FROM orders
""",
)
def f11_demote_formats(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    from sftp_data_ingestion_spark.functions.cleaning import (
        demote_date,
        demote_time,
        demote_timestamp,
    )

    return o.select(
        "o_orderkey",
        demote_timestamp(F.col("o_orderdate")).alias("ts_demoted"),
        demote_date(F.col("o_orderdate")).alias("date_demoted"),
        demote_time(F.col("o_orderdate")).alias("time_demoted"),
        F.greatest(
            F.col("o_orderdate"), F.lit("1998-01-01 00:00:00").cast("timestamp")
        ).alias("greatest_ts"),
    )
