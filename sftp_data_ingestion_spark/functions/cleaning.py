r"""String -> typed cleaning expressions (reference operators F1-F14).

The reference's semantic heart is one 41-expression SQL projection
(``/root/reference/python/03_upsert_dw_pedidos.py:22-171``): CASE/regex
cascades that coerce all-varchar staging columns into typed warehouse
columns. Here each cascade is a reusable builder with two emitters:

* ``<name>(col)``     -> a PySpark ``Column`` (pure Catalyst expression,
  rides whole-stage codegen — the single biggest perf lever vs a Python
  UDF port; see SURVEY.md §4.3),
* ``<name>_sql(expr)`` -> the equivalent DuckDB SQL text, used to build
  the driver's correctness oracles from the same branch structure.

Intentional deltas from PostgreSQL (documented per SURVEY.md §7.4):

* bad input in a cast position yields NULL (``try_cast`` /
  ``try_to_timestamp``) instead of raising — PG's fallback decimal
  branch can still raise on garbage like ``"1-2"``.
* PG ``to_timestamp`` tolerates missing trailing format fields and
  ignores trailing input; we reproduce that with explicit multi-format
  coalescing and by stripping fractional-seconds/offsets the reference
  matches-but-ignores (naive-timestamp semantics,
  ``python/03_upsert_dw_pedidos.py:67-68``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# regex guards (shared verbatim between dialects; PG POSIX, Java and
# DuckDB RE2 agree on these constructs: \d, classes, anchors, groups)
# ---------------------------------------------------------------------------

DATE_SENTINELS: tuple[str, ...] = (
    "", "00/00/0000", "00/00/0000 00:00:00", "0000-00-00",
)

RE_DMY_OPT_TIME = r"^\d{2}/\d{2}/\d{4}( \d{2}:\d{2}:\d{2})?$"
RE_DMY_DASH = r"^\d{2}-\d{2}-\d{4}$"
RE_ISO_OPT_TIME = r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2})?)?$"
RE_COMPACT_DATE = r"^\d{8}$"
RE_TS_DMY = r"^\d{2}/\d{2}/\d{4} \d{2}:\d{2}:\d{2}$"
RE_TS_ISO_EXTRAS = (
    r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}(:\d{2})?(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"
)
RE_TS_ISO_PLAIN = r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}(:\d{2})?$"
RE_DMY_BARE = r"^\d{2}/\d{2}/\d{4}$"
# fractional seconds / UTC offset suffix, matched-but-ignored by the
# reference's naive parse (python/03_upsert_dw_pedidos.py:67-68)
RE_TS_SUFFIX = r"(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"

_NOT_DIGIT = r"\D"
_NOT_ALPHA = "[^A-Za-z]"


# ---------------------------------------------------------------------------
# F1 — trim-to-NULL (python/03_upsert_dw_pedidos.py:24,131-159)
# ---------------------------------------------------------------------------

def null_if_blank(c: Column) -> Column:
    """``NULLIF(TRIM(c), '')`` — staging's empty-string "missing" -> NULL."""
    return F.nullif(F.trim(c), F.lit(""))


def null_if_blank_sql(e: str) -> str:
    return f"NULLIF(TRIM({e}), '')"


# ---------------------------------------------------------------------------
# F2 — digit extraction (python/03_upsert_dw_pedidos.py:26-27,127-128)
# ---------------------------------------------------------------------------

def digits_only(c: Column) -> Column:
    """Strip every non-digit (Spark regexp_replace is global by default)."""
    return F.regexp_replace(c, _NOT_DIGIT, "")


def digits_only_sql(e: str) -> str:
    return f"regexp_replace({e}, '\\D', '', 'g')"


def strip_digits_to_null(c: Column) -> Column:
    """``NULLIF(TRIM(regexp_replace(c,'\\D','')), '')`` — CNPJ/CPF columns
    (python/03_upsert_dw_pedidos.py:138,156)."""
    return F.nullif(F.trim(digits_only(c)), F.lit(""))


def strip_digits_to_null_sql(e: str) -> str:
    return f"NULLIF(TRIM({digits_only_sql(e)}), '')"


# ---------------------------------------------------------------------------
# F3 — 44-digit NFe access-key gate (python/03_upsert_dw_pedidos.py:26-27)
# ---------------------------------------------------------------------------

def nfe_key_44(c: Column) -> Column:
    d = digits_only(c)
    return F.when(F.length(d) == 44, d).otherwise(F.lit(None).cast("string"))


def nfe_key_44_sql(e: str) -> str:
    d = digits_only_sql(e)
    return f"CASE WHEN length({d}) = 44 THEN {d} ELSE NULL END"


# ---------------------------------------------------------------------------
# F13 — digits -> INT (python/03_upsert_dw_pedidos.py:127-128)
# ---------------------------------------------------------------------------

def digits_to_int(c: Column) -> Column:
    """``NULLIF(regexp_replace(c,'\\D',''),'')::int`` with try-cast so a
    >2^31 digit string degrades to NULL instead of failing the job."""
    return F.nullif(digits_only(c), F.lit("")).try_cast("int")


def digits_to_int_sql(e: str) -> str:
    return f"TRY_CAST(NULLIF({digits_only_sql(e)}, '') AS INTEGER)"


# ---------------------------------------------------------------------------
# F4 — UF (state code) validation (python/03_upsert_dw_pedidos.py:151-152)
# ---------------------------------------------------------------------------

def clean_uf(c: Column) -> Column:
    x = F.upper(F.regexp_replace(c, _NOT_ALPHA, ""))
    return F.when(F.length(x).between(2, 3), x).otherwise(
        F.lit(None).cast("string")
    )


def clean_uf_sql(e: str) -> str:
    x = f"upper(regexp_replace({e}, '[^A-Za-z]', '', 'g'))"
    return (
        f"CASE WHEN length({x}) BETWEEN 2 AND 3 THEN {x} ELSE NULL END"
    )


# ---------------------------------------------------------------------------
# F7 — multi-format DATE parser (python/03_upsert_dw_pedidos.py:30-61)
# ---------------------------------------------------------------------------

def _iso_dispatch(iso_t: Column, with_date_only: bool = True) -> Column:
    """Parse an ISO string whose SHAPE is already pinned by a regex
    guard (``yyyy-MM-dd[ HH:mm[:ss]]`` after T->space): dispatch on
    LENGTH so exactly ONE ``try_to_timestamp`` runs and succeeds.

    Pointwise equal (under the guard) to the
    ``COALESCE(try ss, try mm, try date)`` form the DuckDB oracles
    keep — the guard means length fully determines which format can
    parse — but ~6.6x faster (measured, 6M rows: 1.52 s -> 0.23 s):
    each failed ``try_to_timestamp`` in a coalesce chain costs a Java
    exception throw/catch, and date-only inputs paid TWO per row."""
    mm = F.try_to_timestamp(iso_t, F.lit("yyyy-MM-dd HH:mm"))
    ss = F.try_to_timestamp(iso_t, F.lit("yyyy-MM-dd HH:mm:ss"))
    if not with_date_only:
        return F.when(F.length(iso_t) == 16, mm).otherwise(ss)
    return (
        F.when(F.length(iso_t) == 10,
               F.try_to_timestamp(iso_t, F.lit("yyyy-MM-dd")))
        .when(F.length(iso_t) == 16, mm)
        .otherwise(ss)
    )


_DIGITS = "0123456789"


def parse_date_multi(c: Column) -> Column:
    """Sentinels -> NULL; then first matching format wins:
    ``DD/MM/YYYY[ HH:MM:SS]``, ``DD-MM-YYYY``, ISO (space or T, optional
    time, optional seconds), compact ``YYYYMMDD``; else NULL.

    Dispatch is by STRUCTURAL PROBE (separator char at index 2/4 +
    length), not the regex guards the branch semantics were specified
    with (``RE_DMY_OPT_TIME`` etc. — the DuckDB twin keeps them):
    the four format classes are pairwise-disjoint on (char@2, char@4,
    length), and within a class the strict java.time parse accepts
    EXACTLY the guard regex's shape (2-digit fields, 4-digit year
    pinned by the length probe, calendar validity) — so
    probe-then-try-parse is pointwise equal to guard-then-parse, with
    the parse itself as the validator. Pinned branch-by-branch
    against the regex-guard form (incl. malformed-but-probe-passing
    inputs, 5-digit years, wrong separators, sentinels, NULLs) in
    tests/test_cleaning.py::test_date_probe_dispatch_equals_regex_guards.
    Measured on the 100x flagship derivation (30M rows, min-of-3):
    5.28 s -> 3.77 s for the three date columns (-29%) — an anchored
    alternation regex per branch is the single hottest expression
    class in the cascade, and the probes replace up to four of them
    per value with one char compare + length test each. Malformed
    probe-passing strings (rare by regime: machine-generated staging)
    pay one failed try_to_timestamp instead of a regex rejection."""
    t = F.trim(c)
    ln = F.length(t)
    dmy = F.try_to_timestamp(
        F.when(t.contains(" "), t).otherwise(F.concat(t, F.lit(" 00:00:00"))),
        F.lit("dd/MM/yyyy HH:mm:ss"),
    ).cast("date")
    iso_t = F.replace(t, F.lit("T"), F.lit(" "))
    iso = _iso_dispatch(iso_t).cast("date")
    return (
        F.when(t.isin(*DATE_SENTINELS), F.lit(None).cast("date"))
        .when((F.substring(t, 3, 1) == "/") & ln.isin(10, 19), dmy)
        .when(
            (F.substring(t, 3, 1) == "-") & (ln == 10),
            F.try_to_timestamp(t, F.lit("dd-MM-yyyy")).cast("date"),
        )
        .when((F.substring(t, 5, 1) == "-") & ln.isin(10, 16, 19), iso)
        .when(
            (ln == 8) & (F.translate(t, _DIGITS, "") == ""),
            F.try_to_timestamp(t, F.lit("yyyyMMdd")).cast("date"),
        )
        .otherwise(F.lit(None).cast("date"))
    )


def parse_date_multi_sql(e: str) -> str:
    """DuckDB twin. Deliberate structural divergence: the oracle
    keeps the COALESCE(try ss, try mm, try date) form for the ISO
    branch while the Column path dispatches on length
    (:func:`_iso_dispatch`) — pointwise equal under the regex guard
    (length determines the only format that can parse; pinned by
    tests/test_cleaning.py::test_iso_dispatch_equals_coalesce_chain),
    and DuckDB's try_strptime does not pay Java-exception cost, so
    the oracle keeps the simpler shape."""
    t = f"TRIM({e})"
    sentinels = ", ".join(f"'{s}'" for s in DATE_SENTINELS)
    dmy_in = f"CASE WHEN contains({t}, ' ') THEN {t} ELSE {t} || ' 00:00:00' END"
    return f"""CASE
  WHEN {t} IN ({sentinels}) THEN NULL
  WHEN regexp_matches({t}, '{RE_DMY_OPT_TIME}')
    THEN CAST(try_strptime({dmy_in}, '%d/%m/%Y %H:%M:%S') AS DATE)
  WHEN regexp_matches({t}, '{RE_DMY_DASH}')
    THEN CAST(try_strptime({t}, '%d-%m-%Y') AS DATE)
  WHEN regexp_matches({t}, '{RE_ISO_OPT_TIME}')
    THEN CAST(COALESCE(
         try_strptime(replace({t}, 'T', ' '), '%Y-%m-%d %H:%M:%S'),
         try_strptime(replace({t}, 'T', ' '), '%Y-%m-%d %H:%M'),
         try_strptime(replace({t}, 'T', ' '), '%Y-%m-%d')) AS DATE)
  WHEN regexp_matches({t}, '{RE_COMPACT_DATE}')
    THEN CAST(try_strptime({t}, '%Y%m%d') AS DATE)
  ELSE NULL END"""


# ---------------------------------------------------------------------------
# F8 — multi-format TIMESTAMP parser (python/03_upsert_dw_pedidos.py:64-82)
# ---------------------------------------------------------------------------

def parse_timestamp_multi(c: Column, iso_extras: bool = True) -> Column:
    """``DD/MM/YYYY HH:MM:SS``; ISO (optional seconds; with
    ``iso_extras`` also fractional seconds and Z/offset, which are
    matched but ignored — naive semantics); bare ``DD/MM/YYYY`` ->
    midnight; else NULL.

    ``iso_extras=True`` is the ``data_ultima_ocr`` shape (:64-72),
    ``False`` the ``chegada_transportadora`` shape (:74-82).
    """
    t = F.trim(c)
    ln = F.length(t)
    iso_in = F.replace(t, F.lit("T"), F.lit(" "))
    if iso_extras:
        iso_in = F.regexp_replace(iso_in, RE_TS_SUFFIX, "")
    # time is mandatory in both iso shapes -> length 16 or 19 after
    # the T-replace (and after the extras suffix strip); see
    # _iso_dispatch
    iso = _iso_dispatch(iso_in, with_date_only=False)
    # structural-probe dispatch replacing the rlike guards (same
    # pointwise-equality argument as parse_date_multi: the probe
    # classes are disjoint on char@2/char@4 + length, the strict
    # parse accepts exactly the guard shape, and for the extras
    # variant the suffix strip + length dispatch reject anything the
    # RE_TS_ISO_EXTRAS alternation would have; pinned in
    # tests/test_cleaning.py::test_ts_probe_dispatch_equals_regex_guards).
    # The extras ISO branch has unbounded pre-strip length, so its
    # probe is char@4 alone — the strip + parse validate the rest.
    iso_probe = F.substring(t, 5, 1) == "-"
    if not iso_extras:
        iso_probe = iso_probe & ln.isin(16, 19)
    return (
        F.when(
            (F.substring(t, 3, 1) == "/") & (ln == 19),
            F.try_to_timestamp(t, F.lit("dd/MM/yyyy HH:mm:ss")),
        )
        .when(iso_probe, iso)
        .when(
            (F.substring(t, 3, 1) == "/") & (ln == 10),
            F.try_to_timestamp(
                F.concat(t, F.lit(" 00:00:00")), F.lit("dd/MM/yyyy HH:mm:ss")
            ),
        )
        .otherwise(F.lit(None).cast("timestamp"))
    )


def parse_timestamp_multi_sql(e: str, iso_extras: bool = True) -> str:
    t = f"TRIM({e})"
    iso_re = RE_TS_ISO_EXTRAS if iso_extras else RE_TS_ISO_PLAIN
    iso_in = f"replace({t}, 'T', ' ')"
    if iso_extras:
        iso_in = f"regexp_replace({iso_in}, '{RE_TS_SUFFIX}', '')"
    return f"""CASE
  WHEN regexp_matches({t}, '{RE_TS_DMY}')
    THEN try_strptime({t}, '%d/%m/%Y %H:%M:%S')
  WHEN regexp_matches({t}, '{iso_re}')
    THEN COALESCE(try_strptime({iso_in}, '%Y-%m-%d %H:%M:%S'),
                  try_strptime({iso_in}, '%Y-%m-%d %H:%M'))
  WHEN regexp_matches({t}, '{RE_DMY_BARE}')
    THEN try_strptime({t} || ' 00:00:00', '%d/%m/%Y %H:%M:%S')
  ELSE NULL END"""


# ---------------------------------------------------------------------------
# F12 — locale-aware decimal parser (python/03_upsert_dw_pedidos.py:88-125)
# ---------------------------------------------------------------------------

def _decimal_branches(frac_max: int) -> list[tuple[str, str]]:
    """(guard regex, transform tag) pairs, in reference branch order.

    ``frac_max`` is the max fractional digits the guards accept: 2 for
    ``valor_nfe`` (scale 2), 3 for ``peso`` (scale 3) — the only
    difference between the reference's two instances.
    """
    f = frac_max
    return [
        (rf"^[+-]?\d{{1,3}}(\.\d{{3}})+,\d{{1,{f}}}$", "ptbr"),   # 1.234,56
        (rf"^[+-]?\d{{1,3}}(,\d{{3}})+\.\d{{1,{f}}}$", "enus"),   # 1,234.56
        (rf"^[+-]?\d+,\d{{1,{f}}}$", "comma"),                     # 123,45
        (rf"^[+-]?\d+\.\d{{1,{f}}}$", "plain"),                    # 123.45
        (r"^[+-]?\d{1,3}(\.\d{3})+$", "strip_dot"),                # 1.234 -> 1234
        (r"^[+-]?\d{1,3}(,\d{3})+$", "strip_comma"),               # 1,234 -> 1234
        (r"^[+-]?\d+$", "plain"),                                  # 123
    ]


def parse_decimal(c: Column, precision: int, scale: int) -> Column:
    """pt-BR / en-US / bare / thousands-only numeric strings ->
    ``DecimalType(precision, scale)``; unmatched input falls back to
    "strip junk, pt-BR interpretation, try-cast" (NULL on garbage).

    The seven guard regexes (``_decimal_branches`` — the DuckDB twin
    keeps the flat chain) partition cleanly by WHICH SEPARATORS the
    value contains: the pt-BR/en-US shapes require both ``.`` and
    ``,``; guards 3/6 require a comma and forbid dots; guards 4/5 the
    reverse; the bare-integer guard forbids both. So a two-level
    dispatch — cheap ``contains`` probes pick the separator class,
    then only THAT class's guards run, in original order — is
    pointwise equal to the flat seven-guard chain while evaluating at
    most 2 regexes per value instead of up to 7 (pinned in
    tests/test_cleaning.py::test_decimal_contains_dispatch_equals_flat_chain;
    measured 2.98 s -> 1.85 s for the two flagship decimal columns on
    the 100x derivation, -38%)."""
    t = F.trim(c)
    dt = f"decimal({precision},{scale})"
    f = scale
    ptbr = F.replace(
        F.replace(t, F.lit("."), F.lit("")), F.lit(","), F.lit(".")
    )
    fallback = F.replace(
        F.replace(F.regexp_replace(c, "[^0-9,.-]", ""), F.lit("."), F.lit("")),
        F.lit(","), F.lit("."),
    ).try_cast(dt)
    mixed = (
        F.when(
            t.rlike(rf"^[+-]?\d{{1,3}}(\.\d{{3}})+,\d{{1,{f}}}$"),
            ptbr.try_cast(dt),
        )
        .when(
            t.rlike(rf"^[+-]?\d{{1,3}}(,\d{{3}})+\.\d{{1,{f}}}$"),
            F.replace(t, F.lit(","), F.lit("")).try_cast(dt),
        )
        .otherwise(fallback)
    )
    comma_only = (
        F.when(
            t.rlike(rf"^[+-]?\d+,\d{{1,{f}}}$"),
            F.replace(t, F.lit(","), F.lit(".")).try_cast(dt),
        )
        .when(
            t.rlike(r"^[+-]?\d{1,3}(,\d{3})+$"),
            F.replace(t, F.lit(","), F.lit("")).try_cast(dt),
        )
        .otherwise(fallback)
    )
    dot_only = (
        F.when(t.rlike(rf"^[+-]?\d+\.\d{{1,{f}}}$"), t.try_cast(dt))
        .when(
            t.rlike(r"^[+-]?\d{1,3}(\.\d{3})+$"),
            F.replace(t, F.lit("."), F.lit("")).try_cast(dt),
        )
        .otherwise(fallback)
    )
    neither = F.when(t.rlike(r"^[+-]?\d+$"), t.try_cast(dt)).otherwise(
        fallback
    )
    has_dot = t.contains(".")
    has_comma = t.contains(",")
    return (
        F.when(c.isNull() | (t == ""), F.lit(None).cast(dt))
        .when(has_dot & has_comma, mixed)
        .when(has_comma, comma_only)
        .when(has_dot, dot_only)
        .otherwise(neither)
    )


def parse_decimal_sql(e: str, precision: int, scale: int) -> str:
    t = f"TRIM({e})"
    dt = f"DECIMAL({precision},{scale})"

    def xform(tag: str) -> str:
        if tag == "ptbr":
            return f"replace(replace({t}, '.', ''), ',', '.')"
        if tag == "enus":
            return f"replace({t}, ',', '')"
        if tag == "comma":
            return f"replace({t}, ',', '.')"
        if tag == "strip_dot":
            return f"replace({t}, '.', '')"
        if tag == "strip_comma":
            return f"replace({t}, ',', '')"
        return t

    branches = "\n".join(
        f"  WHEN regexp_matches({t}, '{guard}') THEN TRY_CAST({xform(tag)} AS {dt})"
        for guard, tag in _decimal_branches(scale)
    )
    fallback = (
        f"TRY_CAST(replace(replace(regexp_replace({e}, '[^0-9,.-]', '', 'g'),"
        f" '.', ''), ',', '.') AS {dt})"
    )
    return f"""CASE
  WHEN {e} IS NULL OR {t} = '' THEN NULL
{branches}
  ELSE {fallback} END"""


# ---------------------------------------------------------------------------
# F11 — typed -> string demotion formats (sql/insert_publicpedidos_to_staging:23-36)
# ---------------------------------------------------------------------------

def demote_timestamp(c: Column) -> Column:
    """``to_char(ts,'DD/MM/YYYY HH24:MI:SS')`` equivalent."""
    return F.date_format(c, "dd/MM/yyyy HH:mm:ss")


def demote_date(c: Column) -> Column:
    return F.date_format(c, "dd/MM/yyyy")


def demote_time(c: Column) -> Column:
    return F.date_format(c, "HH:mm:ss")
