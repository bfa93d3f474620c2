"""Data-quality profiling queries (extension surface; the reference
has no profiling step — its quality controls are the header-count gate
and row-level CASE cascades, SURVEY.md §5.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sftp_data_ingestion_spark.operators.profile import profile_columns
from sftp_data_ingestion_spark.queries.registry import query, table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _profile_col_sql(name: str, render: str) -> str:
    return f"""
SELECT '{name}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
       {render.format(v=f"min({name})")} AS min_str,
       {render.format(v=f"max({name})")} AS max_str
FROM orders"""


_PROFILE_ORACLE = " UNION ALL ".join(
    [
        _profile_col_sql("o_orderkey", "CAST({v} AS VARCHAR)"),
        _profile_col_sql("o_custkey", "CAST({v} AS VARCHAR)"),
        _profile_col_sql("o_orderstatus", "CAST({v} AS VARCHAR)"),
        _profile_col_sql("o_orderpriority", "CAST({v} AS VARCHAR)"),
        _profile_col_sql("o_orderdate", "strftime({v}, '%Y-%m-%d %H:%M:%S')"),
    ]
)


@query("g_profile_columns", oracle=_PROFILE_ORACLE)
def g_profile_columns(spark, sf_dir):
    """Per-column quality profile of ``orders`` — null count, exact
    cardinality, native-typed min/max — produced by ONE scan + ONE
    aggregate + inline unpivot (`operators/profile.py`). Timestamps
    render via an explicit format so both engines emit identical
    strings."""
    d = table(spark, sf_dir, "orders")
    return profile_columns(
        d,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            ("o_orderdate", lambda c: F.date_format(c, _TS_FMT)),
        ],
    )


@query(
    "g_drift_chisq",
    oracle="""
WITH med AS (
  SELECT median(event_id) AS m FROM events
), binned AS (
  SELECT CASE WHEN e.event_id < med.m THEN 'ref' ELSE 'cur' END AS half,
         CAST(least(floor(e.value / 10), 9) AS BIGINT) AS bin
  FROM events e, med
  WHERE e.value IS NOT NULL AND e.value >= 0
), counts AS (
  SELECT bin,
         CAST(count(*) FILTER (WHERE half = 'ref') AS DOUBLE) AS n_ref,
         CAST(count(*) FILTER (WHERE half = 'cur') AS DOUBLE) AS n_cur
  FROM binned GROUP BY bin
), tot AS (
  SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts
)
SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       round((n_cur / t_cur - n_ref / t_ref)
             * (n_cur / t_cur - n_ref / t_ref)
             / ((n_ref / t_ref) + 1e-12), 6) AS drift_term
FROM counts, tot
""",
)
def g_drift_chisq(spark, sf_dir):
    """Distribution drift monitor — the data-quality gate a long-lived
    pipeline runs between a reference window and the current one:
    events bucket by value decile-bins, split at the median event id (integer median — exact in both engines, unlike timestamp interpolation),
    and each bin emits its chi-square-style drift term (rational
    arithmetic only, so both engines agree bit-for-bit). Plan: one
    scalar median (broadcast), one scan with a conditional pivot
    aggregation — no join of the two windows."""
    e = table(spark, sf_dir, "events")
    med = e.agg(F.expr("median(event_id)").alias("m"))
    binned = (
        e.where(F.col("value").isNotNull() & (F.col("value") >= 0))
        .crossJoin(F.broadcast(med))
        .select(
            F.when(F.col("event_id") < F.col("m"), "ref").otherwise("cur").alias("half"),
            F.least(F.floor(F.col("value") / 10), F.lit(9)).cast("long").alias("bin"),
        )
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("half") == "ref", 1)).cast("double").alias("n_ref"),
        F.count(F.when(F.col("half") == "cur", 1)).cast("double").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    r = F.col("n_ref") / F.col("t_ref")
    c = F.col("n_cur") / F.col("t_cur")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.round((c - r) * (c - r) / (r + 1e-12), 6).alias("drift_term"),
        )
    )


@query(
    "g_approx_quantiles_bounded",
    oracle="""
WITH e AS (
  SELECT quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) AS ev
  FROM lineitem
)
SELECT CAST(t.q AS DOUBLE) AS q, round(t.v, 4) AS exact_value,
       TRUE AS within_rank_bound
FROM e, (
  SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q,
         unnest(e2.ev) AS v
  FROM (SELECT ev AS ev FROM e) e2(ev)
) t
""",
)
def g_approx_quantiles_bounded(spark, sf_dir):
    """Approximate quantile sketch graded by its OWN guarantee:
    ``approx_percentile`` (Greenwald-Khanna style, accuracy 10 000 ->
    rank error <= n/10 000) over lineitem prices, verified
    DISTRIBUTEDLY against the rank definition — for each target q,
    count(x <= approx)/n must reach q - eps and count(x < approx)/n
    must not exceed q + eps (the two-sided form that is correct under
    ties). The graded values are the EXACT interpolated percentiles
    (Spark `percentile` vs DuckDB `quantile_cont` — same linear
    interpolation) plus the boolean witness that the sketch met its
    bound; the sketch values themselves are engine-specific and never
    enter the hash. At 100 TB the sketch is the only affordable path
    (one pass, mergeable per-partition summaries); this query pins
    that the cheap path stays inside its error contract."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("x")
    )
    qs = [0.25, 0.5, 0.75, 0.95]
    eps = 1.0 / 10000 + 1e-9
    one = li.agg(
        F.percentile_approx("x", qs, 10000).alias("a"),
        F.percentile("x", F.array(*[F.lit(v) for v in qs])).alias("e"),
        F.count(F.lit(1)).alias("n"),
    )
    per = one.select(
        F.posexplode(
            F.zip_with(
                "a", "e", lambda a, e: F.struct(a.alias("a"), e.alias("e"))
            )
        ).alias("i", "s"),
        "n",
    ).select(
        "i", F.col("s.a").alias("a"), F.col("s.e").alias("e"), "n"
    )
    qlit = F.element_at(F.array(*[F.lit(v) for v in qs]), F.col("i") + 1)
    ranks = (
        li.crossJoin(F.broadcast(per))
        .groupBy("i", "a", "e", "n")
        .agg(
            F.sum(F.when(F.col("x") <= F.col("a"), 1).otherwise(0)).alias(
                "n_le"
            ),
            F.sum(F.when(F.col("x") < F.col("a"), 1).otherwise(0)).alias(
                "n_lt"
            ),
        )
    )
    return ranks.select(
        qlit.alias("q"),
        F.round("e", 4).alias("exact_value"),
        (
            (F.col("n_le") / F.col("n") >= qlit - F.lit(eps))
            & (F.col("n_lt") / F.col("n") <= qlit + F.lit(eps))
        ).alias("within_rank_bound"),
    )


@query(
    "g_psi_drift",
    oracle="""
WITH med AS (
  SELECT median(event_id) AS m FROM events
), binned AS (
  SELECT CASE WHEN e.event_id < med.m THEN 'ref' ELSE 'cur' END AS half,
         CAST(least(floor(e.value / 10), 9) AS BIGINT) AS bin
  FROM events e, med
  WHERE e.value IS NOT NULL AND e.value >= 0
), counts AS (
  SELECT bin,
         CAST(count(*) FILTER (WHERE half = 'ref') AS DOUBLE) AS n_ref,
         CAST(count(*) FILTER (WHERE half = 'cur') AS DOUBLE) AS n_cur
  FROM binned GROUP BY bin
), tot AS (
  SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts
), terms AS (
  SELECT bin, n_ref, n_cur,
         (n_ref + 0.5) / (t_ref + 0.5 * (SELECT count(*) FROM counts))
           AS p_ref,
         (n_cur + 0.5) / (t_cur + 0.5 * (SELECT count(*) FROM counts))
           AS p_cur
  FROM counts, tot
)
SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
FROM terms
""",
)
def g_psi_drift(spark, sf_dir):
    """Population Stability Index between a reference window and the
    current one — the standard model-monitoring drift score (each bin
    contributes ``(p_cur - p_ref) * ln(p_cur / p_ref)``; PSI > 0.2 is
    the conventional "significant shift" alarm). Bins and windows are
    exactly g_drift_chisq's (median event-id split, value decile
    bins) so the two drift scores are directly comparable gates over
    one shared construction; counts are Laplace-smoothed (+0.5) so an
    empty bin on either side cannot produce ln(0).

    Scale shape: identical to the chi-square gate — one broadcast
    scalar median, ONE map-side-combined conditional pivot aggregate
    over the scan (never a join of the two windows), then arithmetic
    over the <= 10-row bin table. The ln() is computed on both
    engines' libm and rounded to 6 dp (the pagerank precedent: the
    rational core is bit-equal, the transcendental is last-ulp and
    rounding absorbs it)."""
    e = table(spark, sf_dir, "events")
    med = e.agg(F.expr("median(event_id)").alias("m"))
    binned = (
        e.where(F.col("value").isNotNull() & (F.col("value") >= 0))
        .crossJoin(F.broadcast(med))
        .select(
            F.when(F.col("event_id") < F.col("m"), "ref")
            .otherwise("cur")
            .alias("half"),
            F.least(F.floor(F.col("value") / 10), F.lit(9))
            .cast("long")
            .alias("bin"),
        )
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("half") == "ref", 1)).cast("double").alias("n_ref"),
        F.count(F.when(F.col("half") == "cur", 1)).cast("double").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).cast("double").alias("n_bins"),
    )
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("n_bins"))
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("n_bins"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
                "psi_term"
            ),
        )
    )


@query(
    "g_mad_outliers",
    oracle="""
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         l_extendedprice
           * CASE WHEN l_orderkey % 997 = 0 THEN 25 ELSE 1 END AS x
  FROM lineitem
), med AS (
  SELECT l_returnflag, quantile_cont(x, 0.5) AS med
  FROM base GROUP BY l_returnflag
), mad AS (
  SELECT b.l_returnflag,
         quantile_cont(abs(b.x - m.med), 0.5) AS mad
  FROM base b JOIN med m ON b.l_returnflag = m.l_returnflag
  GROUP BY b.l_returnflag
)
SELECT b.l_orderkey, b.l_linenumber, b.l_returnflag,
       round(0.6745 * (b.x - m.med) / d.mad, 6) AS robust_z
FROM base b
JOIN med m ON b.l_returnflag = m.l_returnflag
JOIN mad d ON b.l_returnflag = d.l_returnflag
WHERE abs(0.6745 * (b.x - m.med) / d.mad) > 3.5
""",
)
def g_mad_outliers(spark, sf_dir):
    """Robust outlier detection by median absolute deviation
    (Iglewicz-Hoaglin modified z-score: ``0.6745 * (x - median) /
    MAD``, flag |z| > 3.5) — the outlier gate that, unlike
    ``c_value_zscore_outliers``'s mean/stddev z-score, is itself
    immune to the outliers it hunts (50% breakdown point vs 0%). The
    fixture prices are too tame to trip a robust gate, so every
    997th order's price is deterministically inflated 25x in BOTH
    engines (the t_redact_pii planted-fixture pattern) — the flag
    path is exercised, not vacuously green.

    Scale shape: two grouped exact medians (each one shuffle bounded
    by the group count, computed per group not per row) broadcast
    back onto the scan; the flag pass is map-only. ``percentile``
    and DuckDB ``quantile_cont`` share the same linear-interpolation
    definition (the g_exact_percentiles precedent); the division is
    rounded at 6 dp. The >3.5 predicate compares the UNROUNDED value
    in both engines, so the rounded output can never disagree on set
    membership."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        (
            F.col("l_extendedprice")
            * F.when(F.col("l_orderkey") % 997 == 0, 25).otherwise(1)
        ).alias("x"),
    )
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(x, 0.5)").alias("med")
    )
    with_med = li.join(F.broadcast(med), "l_returnflag")
    mad = with_med.groupBy("l_returnflag").agg(
        F.expr("percentile(abs(x - med), 0.5)").alias("mad")
    )
    z = 0.6745 * (F.col("x") - F.col("med")) / F.col("mad")
    return (
        with_med.join(F.broadcast(mad), "l_returnflag")
        .where(F.abs(z) > 3.5)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(z, 6).alias("robust_z"),
        )
    )


_DP_EPS = 0.5  # Laplace scale b = 1/eps = 2.0


def _dp_oracle() -> str:
    from sftp_data_ingestion_spark.ext.textstats import (
        rolling_fingerprint_sql,
    )

    fp = rolling_fingerprint_sql("source || '|' || lang")
    return f"""
WITH counts AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS exact_n
  FROM documents GROUP BY source, lang
), seeded AS (
  SELECT source, lang, exact_n,
         (CAST({fp} % 1000000 AS DOUBLE) + 0.5) / 1000000.0 - 0.5 AS u
  FROM counts
)
SELECT source, lang, exact_n,
       round(exact_n - {1.0 / _DP_EPS}
             * sign(u) * ln(1.0 - 2.0 * abs(u)), 6) AS noisy_n
FROM seeded
"""


@query("g_dp_noisy_counts", oracle=_dp_oracle())
def g_dp_noisy_counts(spark, sf_dir):
    """Differentially-private histogram release (Dwork et al. 2006
    Laplace mechanism): per-(source, lang) document counts plus
    Laplace(1/eps) noise, eps = 0.5 — the privacy-preserving
    publication step of a corpus datasheet. The "randomness" is a
    deterministic inverse-CDF draw seeded by the engine-portable
    polynomial fingerprint of the group key (`ext/textstats
    .rolling_fingerprint`), so both engines draw the SAME noise and
    the release is replayable — a property real DP deployments get
    from a recorded PRNG seed. ``exact_n`` stays in the graded output
    purely as the correctness anchor; a production release publishes
    only ``noisy_n``.

    Scale shape: one map-side-combined groupBy over the scan; the
    noise arithmetic runs on the group table (cardinality = distinct
    key pairs, tiny). ln() is last-ulp cross-engine and rounded at
    6 dp (pagerank precedent); sensitivity of a disjoint-partition
    histogram is 1, so Laplace(1/eps) is the textbook calibration."""
    from sftp_data_ingestion_spark.ext import textstats as ts

    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    fp = ts.rolling_fingerprint(
        F.concat(F.col("source"), F.lit("|"), F.col("lang"))
    )
    u = (F.pmod(fp, F.lit(1000000)).cast("double") + 0.5) / 1000000.0 - 0.5
    noise = (
        F.lit(-1.0 / _DP_EPS)
        * F.signum(u)
        * F.log(F.lit(1.0) - 2.0 * F.abs(u))
    )
    return counts.select(
        "source",
        "lang",
        "exact_n",
        F.round(F.col("exact_n") + noise, 6).alias("noisy_n"),
    )


@query(
    "g_gini_doc_length",
    oracle="""
WITH ranked AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS x,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS i
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       round(2.0 * sum(i * x) / (count(*) * sum(x))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked GROUP BY source
""",
)
def g_gini_doc_length(spark, sf_dir):
    """Per-source Gini coefficient of document length — the
    concentration diagnostic a corpus datasheet publishes: gini ~ 0
    means a source's token budget is spread evenly over its
    documents; gini -> 1 means a few huge documents own the source
    (and a doc-level sampler silently becomes a token-level skew).
    Exact rank formulation: G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    ascending xᵢ (deterministic doc_id tie-break so ranks are
    identical cross-engine; the value is tie-order-invariant anyway
    since equal x swap equal addends).

    Scale shape: one per-source sort window (rows shuffle once on
    source, sort within partition — the window never crosses
    sources) + one groupBy. Rational arithmetic only: bit-equal
    before the display rounding."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source",
        F.col("n_chars").cast("double").alias("x"),
        F.row_number().over(w).alias("i"),
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x"))
            / (F.count(F.lit(1)) * F.sum("x"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )
