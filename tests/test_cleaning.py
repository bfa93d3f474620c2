"""Table-driven branch tests for the cleaning expression library.

Every CASE branch / sentinel / NULL path of the reference's coercion CTE
(``/root/reference/python/03_upsert_dw_pedidos.py:22-171``) becomes a
row here, per FIXTURES.md §B.2.
"""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.functions import cleaning as C


def _run_one(spark, builder, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(builder(F.col("v")).alias("out")).collect()[0]["out"]


# ---- F1 null_if_blank ------------------------------------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [("  x  ", "x"), ("   ", None), ("", None), (None, None), ("a b", "a b")],
)
def test_null_if_blank(spark, raw, expected):
    assert _run_one(spark, C.null_if_blank, raw) == expected


# ---- F2/F3 digits / NFe key ------------------------------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1234567890123456789012345678901234567890.1234",
         "12345678901234567890123456789012345678901234"),  # 44 digits after strip
        ("1" * 44, "1" * 44),
        ("1" * 43, None),
        ("1" * 45, None),
        ("", None),
        (None, None),
    ],
)
def test_nfe_key_44(spark, raw, expected):
    assert _run_one(spark, C.nfe_key_44, raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("12", 12), ("12 un", 12), ("abc", None), ("", None), (None, None),
     ("9" * 15, None)],  # overflow -> NULL via try_cast, not job failure
)
def test_digits_to_int(spark, raw, expected):
    assert _run_one(spark, C.digits_to_int, raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("123.456.789-01", "12345678901"), ("", None), (None, None), ("abc", None)],
)
def test_strip_digits_to_null(spark, raw, expected):
    assert _run_one(spark, C.strip_digits_to_null, raw) == expected


# ---- F4 UF -----------------------------------------------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [("SP", "SP"), (" sp ", "SP"), ("S1P", "SP"), ("ABCD", None), ("X", None),
     ("", None), (None, None), ("rj!", "RJ")],
)
def test_clean_uf(spark, raw, expected):
    assert _run_one(spark, C.clean_uf, raw) == expected


# ---- F7 multi-format DATE --------------------------------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("", None),
        ("00/00/0000", None),
        ("00/00/0000 00:00:00", None),
        ("0000-00-00", None),
        ("25/12/2024", dt.date(2024, 12, 25)),
        ("25/12/2024 13:45:00", dt.date(2024, 12, 25)),
        (" 25/12/2024 ", dt.date(2024, 12, 25)),
        ("25-12-2024", dt.date(2024, 12, 25)),
        ("2024-12-25", dt.date(2024, 12, 25)),
        ("2024-12-25 13:45", dt.date(2024, 12, 25)),
        ("2024-12-25T13:45:00", dt.date(2024, 12, 25)),
        ("20241225", dt.date(2024, 12, 25)),
        ("31/02/2024", None),  # regex passes, calendar-invalid -> try_* NULL
        ("31/02/x", None),
        ("garbage", None),
        (None, None),
    ],
)
def test_parse_date_multi(spark, raw, expected):
    assert _run_one(spark, C.parse_date_multi, raw) == expected


# ---- F8 multi-format TIMESTAMP ---------------------------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("25/12/2024 13:45:00", dt.datetime(2024, 12, 25, 13, 45)),
        ("2024-12-25T13:45:00", dt.datetime(2024, 12, 25, 13, 45)),
        ("2024-12-25 13:45", dt.datetime(2024, 12, 25, 13, 45)),
        ("2024-12-25T13:45:00.123", dt.datetime(2024, 12, 25, 13, 45)),
        ("2024-12-25T13:45:00Z", dt.datetime(2024, 12, 25, 13, 45)),
        ("2024-12-25T13:45:00+03:00", dt.datetime(2024, 12, 25, 13, 45)),
        ("25/12/2024", dt.datetime(2024, 12, 25, 0, 0)),
        ("", None),
        ("garbage", None),
        (None, None),
    ],
)
def test_parse_timestamp_extras(spark, raw, expected):
    assert _run_one(spark, lambda c: C.parse_timestamp_multi(c, True), raw) == expected


def test_parse_timestamp_plain_rejects_offset(spark):
    # chegada_transportadora's cascade has no fractional/offset branch
    assert _run_one(spark, lambda c: C.parse_timestamp_multi(c, False),
                    "2024-12-25T13:45:00+03:00") is None
    assert _run_one(spark, lambda c: C.parse_timestamp_multi(c, False),
                    "2024-12-25 13:45:00") == dt.datetime(2024, 12, 25, 13, 45)


# ---- F12 locale decimal ----------------------------------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1.234,56", Decimal("1234.56")),
        ("1,234.56", Decimal("1234.56")),
        ("123,45", Decimal("123.45")),
        ("123.45", Decimal("123.45")),
        ("1.234", Decimal("1234.00")),     # thousands-only
        ("1,234", Decimal("1234.00")),
        ("123", Decimal("123.00")),
        ("-1.234,56", Decimal("-1234.56")),
        ("R$ 1.234,56", Decimal("1234.56")),  # fallback junk-strip
        ("", None),
        (None, None),
        ("1-2", None),  # PG fallback would raise; we choose NULL (documented)
    ],
)
def test_parse_decimal_scale2(spark, raw, expected):
    got = _run_one(spark, lambda c: C.parse_decimal(c, 15, 2), raw)
    assert got == expected


def test_parse_decimal_scale3(spark):
    assert _run_one(spark, lambda c: C.parse_decimal(c, 12, 3), "1.234,567") == Decimal("1234.567")
    assert _run_one(spark, lambda c: C.parse_decimal(c, 12, 3), "12,345") == Decimal("12.345")


def test_iso_dispatch_equals_coalesce_chain(spark):
    """_iso_dispatch replaced the COALESCE(try ss, try mm, try date)
    chain for performance (each FAILED try_to_timestamp costs a Java
    exception; date-only inputs paid two per row — measured 6.51s ->
    3.82s on the full 6M-row cascade). Under the regex guard the two
    are pointwise equal because length determines the only format
    that can parse; pin that on every shape plus invalid-calendar
    and unguarded-garbage inputs."""
    from pyspark.sql import functions as F

    from sftp_data_ingestion_spark.functions.cleaning import _iso_dispatch

    rows = [
        ("2024-01-15",),           # len 10 -> date-only
        ("2024-01-15 10:30",),     # len 16 -> minutes
        ("2024-01-15 10:30:45",),  # len 19 -> seconds
        ("2024-02-30",),           # invalid calendar -> NULL both ways
        ("2024-13-01 10:30",),     # invalid month -> NULL
        ("garbage",),              # unguarded -> NULL both ways
        (None,),
    ]
    df = spark.createDataFrame(rows, "s string")
    old = F.coalesce(
        F.try_to_timestamp(F.col("s"), F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(F.col("s"), F.lit("yyyy-MM-dd HH:mm")),
        F.try_to_timestamp(F.col("s"), F.lit("yyyy-MM-dd")),
    )
    got = df.select(
        _iso_dispatch(F.col("s")).alias("new"), old.alias("old")
    ).collect()
    for r in got:
        assert r["new"] == r["old"], r
    # the time-mandatory variant (timestamp parsers): len 16/19 only
    old2 = F.coalesce(
        F.try_to_timestamp(F.col("s"), F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(F.col("s"), F.lit("yyyy-MM-dd HH:mm")),
    )
    got2 = df.where(F.length("s") != 10).select(
        _iso_dispatch(F.col("s"), with_date_only=False).alias("new"),
        old2.alias("old"),
    ).collect()
    for r in got2:
        assert r["new"] == r["old"], r
