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


# Adversarial inputs for the probe-dispatch equivalence pins: every
# format class, every sentinel, plus malformed strings that PASS the
# structural probes (char@2/char@4 + length) but fail the regex
# guards — the exact inputs where probe-then-try-parse could diverge
# from guard-then-parse if try_to_timestamp were laxer than the regex.
_PROBE_ADVERSARIAL = [
    # well-formed, one per class
    "15/01/2024", "15/01/2024 10:30:45", "15-01-2024", "2024-01-15",
    "2024-01-15 10:30", "2024-01-15 10:30:45", "2024-01-15T10:30:45",
    "20240115",
    # sentinels
    "", "00/00/0000", "00/00/0000 00:00:00", "0000-00-00",
    # probe-passing but regex-failing: parse must reject
    "ab/cd/efgh",            # '/'@2, len 10, non-digits
    "15/01/2024 10:30",      # '/'@2, len 16 (time missing :ss)
    "15/01/2024T10:30:45",   # '/'@2, len 19, 'T' separator
    "1/2/2020",              # len 8, '/'@1 — not all digits
    "ab-cd-efgh",            # '-'@2, len 10
    "15-01-20245",           # '-'@2, len 11
    "2024-1-150",            # '-'@4, len 10, 1-digit month
    "2024-01-15 10:3:45",    # '-'@4, len 18 -> no probe class
    "2024-01-15 103:045",    # '-'@4, len 18
    "2024-01-15X10:30:45",   # '-'@4, len 19, bad separator
    "20241315",              # len 8 digits, month 13 (calendar)
    "99999999",              # len 8 digits, nonsense calendar
    "31/02/2024",            # valid shape, invalid calendar
    "12345-01-01",           # 5-digit year
    "01/02/20200 00:00:00",  # 5-digit year DMY (len 20 -> no class)
    "2024-02-30",            # invalid calendar ISO
    "  15/01/2024  ",        # trim path
    "garbage", "2024", "15/01", None,
    # timestamp-parser extras: fractional seconds / offsets
    "2024-01-15 10:30:45.123", "2024-01-15T10:30:45Z",
    "2024-01-15 10:30:45+02:00", "2024-01-15 10:30:45+0200",
    "2024-01-15 10:30:45Z+02:00",  # both suffixes -> reject
    "2024-01-15 10:30.123",        # frac on minutes shape
    "2024-",                       # '-'@4, tiny
    # cast-leniency traps (r12 fast-cast rewrite): Spark's native
    # string->date/timestamp cast accepts year-only / year-month /
    # short-field / trailing-junk / timezone forms the strict
    # formatter rejects — each must still come back NULL because the
    # _pin separator-position + digit-purity checks refuse the shape
    "2024-1-2 3",            # short fields + junk tail, len 10 iso probe
    "2024-01 -2",            # displaced '-', len 10
    "2024-1-150",            # short month, all else digits
    "12/04/2 24",            # space inside year field (date branch)
    "12/4/20240 03:04:05",   # '/'@5 — misaligned but nd == '// ::'
    "12/04/2024 03:04+05",   # timezone instead of :ss, len 19
    "2024-01-02 03:04+05",   # same on the iso branch
    "12/04/2024 0x:04:05",   # letter in time field
    "2024-01-02 03:04:05999",  # digit tail, len 22
    # calendar/range edges where cast and formatter must agree
    "01/01/0000", "01/01/0000 00:00:00", "0000-01-02", "0001-01-01",
    "2024-01-02 23:59:60",   # leap second
    "2024-01-02 24:00:00",   # hour 24
    "12/04/2024 23:59:60", "29/02/2024", "29/02/2023", "00000000",
]


def _fuzz_strings(n=2000, seed=1107):
    """Deterministic fuzz corpus over the parsers' alphabet — every
    separator/digit/letter combination at the lengths the probes key
    on, so the equivalence pins cover shapes nobody thought to
    enumerate."""
    import random

    rng = random.Random(seed)
    alphabet = "0123456789/-: .TZz+abX"
    out = []
    for _ in range(n):
        ln = rng.choice((8, 10, 11, 16, 18, 19, 20, 3, 25))
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    return out


def test_date_probe_dispatch_equals_regex_guards(spark):
    """parse_date_multi replaced its four rlike guards with
    structural probes (char@2/char@4 + length; try_to_timestamp is
    the validator) — measured -29% on the three flagship date columns
    at the 100x derivation. Pin pointwise equality against the
    original regex-guard form on every class + adversarial
    probe-passing inputs."""
    df = spark.createDataFrame(
        [(s,) for s in _PROBE_ADVERSARIAL + _fuzz_strings()], "s string"
    )
    t = F.trim(F.col("s"))
    dmy = F.try_to_timestamp(
        F.when(t.contains(" "), t).otherwise(F.concat(t, F.lit(" 00:00:00"))),
        F.lit("dd/MM/yyyy HH:mm:ss"),
    ).cast("date")
    iso = C._iso_dispatch(F.replace(t, F.lit("T"), F.lit(" "))).cast("date")
    old = (
        F.when(t.isin(*C.DATE_SENTINELS), F.lit(None).cast("date"))
        .when(t.rlike(C.RE_DMY_OPT_TIME), dmy)
        .when(
            t.rlike(C.RE_DMY_DASH),
            F.try_to_timestamp(t, F.lit("dd-MM-yyyy")).cast("date"),
        )
        .when(t.rlike(C.RE_ISO_OPT_TIME), iso)
        .when(
            t.rlike(C.RE_COMPACT_DATE),
            F.try_to_timestamp(t, F.lit("yyyyMMdd")).cast("date"),
        )
        .otherwise(F.lit(None).cast("date"))
    )
    # compare JVM-side: a year-0000 date is VALID in Spark (pattern
    # 'y' maps to 'u' — both forms agree) but cannot convert to a
    # Python datetime.date, so collecting the raw dates would explode
    # on exactly the rows that prove the equivalence
    bad = (
        df.select(
            F.col("s"),
            C.parse_date_multi(F.col("s")).alias("new"),
            old.alias("old"),
        )
        .where(~F.col("new").eqNullSafe(F.col("old")))
        .select("s", F.col("new").cast("string"), F.col("old").cast("string"))
        .collect()
    )
    assert bad == [], bad


def test_ts_probe_dispatch_equals_regex_guards(spark):
    """Same pin for parse_timestamp_multi, both iso_extras variants,
    against the original rlike-guard chain."""
    df = spark.createDataFrame(
        [(s,) for s in _PROBE_ADVERSARIAL + _fuzz_strings()], "s string"
    )
    t = F.trim(F.col("s"))
    for extras in (True, False):
        iso_re = C.RE_TS_ISO_EXTRAS if extras else C.RE_TS_ISO_PLAIN
        iso_in = F.replace(t, F.lit("T"), F.lit(" "))
        if extras:
            iso_in = F.regexp_replace(iso_in, C.RE_TS_SUFFIX, "")
        iso = C._iso_dispatch(iso_in, with_date_only=False)
        old = (
            F.when(
                t.rlike(C.RE_TS_DMY),
                F.try_to_timestamp(t, F.lit("dd/MM/yyyy HH:mm:ss")),
            )
            .when(t.rlike(iso_re), iso)
            .when(
                t.rlike(C.RE_DMY_BARE),
                F.try_to_timestamp(
                    F.concat(t, F.lit(" 00:00:00")),
                    F.lit("dd/MM/yyyy HH:mm:ss"),
                ),
            )
            .otherwise(F.lit(None).cast("timestamp"))
        )
        # JVM-side compare (see the date test: year-0000 timestamps
        # are valid in Spark but not convertible to datetime)
        bad = (
            df.select(
                F.col("s"),
                C.parse_timestamp_multi(
                    F.col("s"), iso_extras=extras
                ).alias("new"),
                old.alias("old"),
            )
            .where(~F.col("new").eqNullSafe(F.col("old")))
            .select(
                "s",
                F.col("new").cast("string"),
                F.col("old").cast("string"),
            )
            .collect()
        )
        assert bad == [], (extras, bad)


def test_decimal_contains_dispatch_equals_flat_chain(spark):
    """parse_decimal replaced the flat seven-rlike chain with a
    contains()-class dispatch (separator presence partitions the
    guards; -38% measured). Pin pointwise equality against the flat
    chain on every branch + boundary/garbage inputs."""
    vals = [
        "1.234,56", "12.345.678,9", "1,234.56", "12,345,678.9",
        "123,45", "123,456",  # comma: frac vs thousands (scale 2)
        "123.45", "123.456",  # dot: frac vs thousands
        "1.234", "1,234",     # pure thousands either side
        "123", "+123", "-123", "0",
        "1.23.45", "1,23,45",     # malformed groupings -> fallback
        "12.34,5.6", "abc", "R$ 1.234,56", "1 234,56",
        "--5", "5-", ".5", ",5", "5.", "5,",
        "99999999999999999999,99",  # overflows decimal(15,2) -> NULL
        "", "   ", None,
    ]
    vals = vals + _fuzz_strings(seed=1108)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    for precision, scale in ((15, 2), (12, 3)):
        t = F.trim(F.col("v"))
        dt = f"decimal({precision},{scale})"

        def xform(tag):
            if tag == "ptbr":
                return F.replace(
                    F.replace(t, F.lit("."), F.lit("")), F.lit(","), F.lit(".")
                )
            if tag == "enus":
                return F.replace(t, F.lit(","), F.lit(""))
            if tag == "comma":
                return F.replace(t, F.lit(","), F.lit("."))
            if tag == "strip_dot":
                return F.replace(t, F.lit("."), F.lit(""))
            if tag == "strip_comma":
                return F.replace(t, F.lit(","), F.lit(""))
            return t

        old = F.when(F.col("v").isNull() | (t == ""), F.lit(None).cast(dt))
        for guard, tag in C._decimal_branches(scale):
            old = old.when(t.rlike(guard), xform(tag).try_cast(dt))
        fallback = F.replace(
            F.replace(
                F.regexp_replace(F.col("v"), "[^0-9,.-]", ""),
                F.lit("."), F.lit(""),
            ),
            F.lit(","), F.lit("."),
        )
        old = old.otherwise(fallback.try_cast(dt))
        got = df.select(
            F.col("v"),
            C.parse_decimal(F.col("v"), precision, scale).alias("new"),
            old.alias("old"),
        ).collect()
        for r in got:
            assert r["new"] == r["old"], (precision, r["v"], r["new"], r["old"])
