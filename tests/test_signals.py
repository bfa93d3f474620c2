"""Tests for the quality-signal extensions: PageRank, count-min
sketch, linear classifier (ext/graph.py, ext/sketch.py,
ext/classify.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.ext.classify import (
    fit_logreg,
    logreg_predict,
)
from sftp_data_ingestion_spark.ext.graph import pagerank
from sftp_data_ingestion_spark.ext.sketch import cms_build, cms_estimate


# ---------------------------------------------------------------- pagerank


def _pagerank_model(edges, iterations=5, damping=0.85):
    """Driver-side reference implementation."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for a, b in edges:
            contrib[b] += r[a] / deg[a]
        r = {v: (1 - damping) / n + damping * contrib[v] for v in nodes}
    return r


def test_pagerank_matches_reference_model(spark):
    edges = [
        (1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3),
        (4, 1), (1, 4), (5, 4), (4, 5),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=8).collect()}
    want = _pagerank_model(edges, iterations=8)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_mass_conserved_on_bidirected_graph(spark):
    edges = [(i, (i * 3) % 7 + 10) for i in range(7)]
    edges = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = pagerank(df, iterations=6)
    total = ranks.agg(F.sum("rank")).first()[0]
    # bidirected => no dangling nodes => total rank mass stays 1
    assert total == pytest.approx(1.0, abs=1e-9)
    assert ranks.where(F.col("rank") <= 0).count() == 0


def test_pagerank_hub_outranks_leaf(spark):
    # star graph: hub 0 linked by all leaves (bidirected)
    edges = [(i, 0) for i in range(1, 9)] + [(0, i) for i in range(1, 9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r = {x["node"]: x["rank"] for x in pagerank(df).collect()}
    assert r[0] > max(v for k, v in r.items() if k != 0) * 3


# ---------------------------------------------------------------- sketch


def test_cms_estimate_never_underestimates(spark):
    rows = [(i % 17,) for i in range(500)] + [(99,)] * 120
    df = spark.createDataFrame(rows, ["k"])
    sketch = cms_build(df, "k", width=16, depth=4)
    keys = df.select("k").distinct()
    est = {r["k"]: r["cms_est"] for r in
           cms_estimate(sketch, keys, "k", width=16, depth=4).collect()}
    exact = {r["k"]: r["cnt"] for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c


def test_cms_heavy_hitter_estimate_is_tight_at_reasonable_width(spark):
    rows = [(i % 50,) for i in range(200)] + [(777,)] * 300
    df = spark.createDataFrame(rows, ["k"])
    sketch = cms_build(df, "k", width=1024, depth=4)
    keys = spark.createDataFrame([(777,)], ["k"])
    est = cms_estimate(sketch, keys, "k", width=1024, depth=4).first()
    # wide sketch, 51 keys: the heavy hitter is exact w.h.p.
    assert est["cms_est"] == 300


def test_cms_sketch_size_is_bounded_by_grid(spark):
    df = spark.range(0, 100000).select(F.col("id").alias("k"))
    sketch = cms_build(df, "k", width=32, depth=4)
    assert sketch.count() <= 32 * 4


# ---------------------------------------------------------------- classify


def _toy_docs(spark, n=400):
    # separable: label = long doc (planted margin on feature 0).
    # features pre-scaled to [0,1] — the same convention the graded
    # scorer uses (kilochars/hectotokens), and what makes a single
    # global learning rate behave for full-batch GD.
    rows = [
        (
            i,
            (i % 20) / 20.0,
            ((i * 7) % 13) / 13.0,
            1 if (i % 20) >= 10 else 0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["id", "f_len", "f_noise", "label"])


def test_fit_logreg_loss_decreases_and_separates(spark):
    df = _toy_docs(spark).cache()
    w, b, losses = fit_logreg(
        df, ["f_len", "f_noise"], "label", iterations=120, lr=2.0
    )
    assert losses[-1] < losses[0] / 2
    assert all(math.isfinite(x) for x in losses)
    pred = logreg_predict(df, ["f_len", "f_noise"], w, b)
    acc = (
        pred.where(F.col("pred").cast("int") == F.col("label")).count()
        / df.count()
    )
    assert acc >= 0.95
    df.unpersist()


def test_logreg_margin_is_fixed_order_fold(spark):
    # same literals, same columns => same bits, independent of
    # partitioning (fold order is pinned left-to-right)
    df = spark.range(0, 1000).select(
        (F.col("id") * 0.1).alias("a"), (F.col("id") * 0.03).alias("b")
    )
    one = logreg_predict(df.coalesce(1), ["a", "b"], [0.3, -0.7], 0.11)
    many = logreg_predict(df.repartition(13), ["a", "b"], [0.3, -0.7], 0.11)
    assert sorted(r["margin"] for r in one.collect()) == sorted(
        r["margin"] for r in many.collect()
    )


# ---------------------------------------------------------------- ahash


def test_ahash_identical_images_pair_at_distance_zero(spark):
    from sftp_data_ingestion_spark.ext import multimodal as mm

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, "the quick brown fox jumps over the lazy dog " * 4),
        (3, "ZZZZ completely different content 0123456789 " * 4),
    ]
    df = spark.createDataFrame(rows, ["media_id", "text"])
    hashes = mm.text_png_ahash(df)
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in mm.ahash_near_dup_pairs(hashes, max_distance=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ahash_halves_are_unsigned_32bit(spark):
    from sftp_data_ingestion_spark.ext import multimodal as mm

    df = spark.createDataFrame(
        [(i, f"text payload number {i} with some variety " * 3)
         for i in range(20)],
        ["media_id", "text"],
    )
    for r in mm.text_png_ahash(df).collect():
        assert 0 <= r["h_hi"] < 2**32
        assert 0 <= r["h_lo"] < 2**32


def test_ahash_banding_is_lossless_at_distance_3(spark):
    # brute-force all pairs vs banded pairs on a corpus with planted
    # 1-3 bit perturbations: sets must be identical (pigeonhole)
    from sftp_data_ingestion_spark.ext import multimodal as mm
    from sftp_data_ingestion_spark.ext.dedup import hamming64

    df = spark.createDataFrame(
        [(i, ("word%d " % (i // 2)) * 40) for i in range(30)],
        ["media_id", "text"],
    )
    hashes = mm.text_png_ahash(df).cache()
    banded = {
        (r["id_a"], r["id_b"])
        for r in mm.ahash_near_dup_pairs(hashes, max_distance=3).collect()
    }
    a, b = hashes.alias("a"), hashes.alias("b")
    dist = hamming64(F.col("a.h_hi"), F.col("b.h_hi")) + hamming64(
        F.col("a.h_lo"), F.col("b.h_lo")
    )
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            dist.alias("dist"),
        )
        .where(F.col("dist") <= 3)
        .collect()
    }
    assert banded == brute
    hashes.unpersist()


# ----------------------------------------------------- property tests


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**12),
        min_size=1,
        max_size=120,
    )
)
def test_cms_one_sided_error_property(spark, keys):
    """CMS guarantee: estimate >= exact count for EVERY key, for any
    multiset (one batched frame per example)."""
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    sketch = cms_build(df, "k", width=8, depth=3)
    est = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(
            sketch, df.select("k").distinct(), "k", width=8, depth=3
        ).collect()
    }
    exact: dict[int, int] = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=40,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_pagerank_matches_model_property(spark, raw_edges):
    """PageRank equals the driver-side model on arbitrary bidirected
    graphs (self-loops dropped, duplicates collapsed)."""
    edges = sorted({(a, b) for a, b in raw_edges if a != b})
    edges = sorted(set(edges) | {(b, a) for a, b in edges})
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=4).collect()}
    want = _pagerank_model(edges, iterations=4)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_weighted_pagerank_matches_model(spark):
    # weighted walk: heavier edges carry proportionally more rank
    edges = [
        (1, 2, 3.0), (2, 1, 1.0), (1, 3, 1.0), (3, 1, 1.0),
        (2, 3, 2.0), (3, 2, 2.0),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=6, weight_col="w").collect()
    }
    # driver-side weighted model
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    strength = {}
    for a, _, w in edges:
        strength[a] = strength.get(a, 0.0) + w
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(6):
        contrib = {v: 0.0 for v in nodes}
        for a, b, w in edges:
            contrib[b] += r[a] * w / strength[a]
        r = {v: 0.15 / n + 0.85 * contrib[v] for v in nodes}
    for v in r:
        assert got[v] == pytest.approx(r[v], abs=1e-12)
    # edge 1->2 is 3x heavier than 1->3: node 2 must outrank node 3
    assert got[2] > got[3]


def test_repeated_ngram_spans_merges_adjacent_and_pins_boilerplate(spark):
    from sftp_data_ingestion_spark.ext.dedup import repeated_ngram_spans

    boiler = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"  # 10 tokens
    rows = [(i, f"{boiler} unique{i}a unique{i}b unique{i}c") for i in range(6)]
    rows.append((100, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = repeated_ngram_spans(df, n=8, min_repeats=5).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
           for r in spans}
    # 10-token boilerplate: interior 8-grams at pos 0..2 repeat 6x ->
    # one merged span [0, 10) with 3 grams, on each of the 6 docs
    assert got == {(i, 0, 10, 3) for i in range(6)}


def test_cms_partial_grids_merge_to_batch_sketch(spark):
    """Sum-monoid property: per-chunk partial grids added cell-wise
    equal the sketch built over the whole input — the invariant the
    streaming maintainer (st_stream_cms_topk) relies on."""
    from sftp_data_ingestion_spark.ext.sketch import cms_build, cms_cells

    rows = [(i % 37,) for i in range(400)]
    df = spark.createDataFrame(rows, ["k"])
    half1 = df.where(F.col("k") % 2 == 0)
    half2 = df.where(F.col("k") % 2 == 1)
    merged = (
        cms_cells(half1, "k", 32, 4)
        .groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))
        .unionAll(
            cms_cells(half2, "k", 32, 4)
            .groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))
        )
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    batch = cms_build(df, "k", 32, 4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_empty_inputs_raise_clear_errors(spark):
    from sftp_data_ingestion_spark.ext.graph import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(empty)
    empty_docs = spark.createDataFrame([], "f double, label int")
    with pytest.raises(ValueError, match="empty training frame"):
        fit_logreg(empty_docs, ["f"], "label", iterations=1)


def test_cms_unseen_key_estimates_zero(spark):
    # sparse sketch: an unseen key whose cells are all empty must
    # estimate 0, not vanish or min over colliding cells only
    from sftp_data_ingestion_spark.ext.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([(1,)] * 10, ["k"])
    sketch = cms_build(df, "k", width=1024, depth=4)
    probe = spark.createDataFrame([(1,), (999999,)], ["k"])
    est = {r["k"]: r["cms_est"] for r in
           cms_estimate(sketch, probe, "k", width=1024, depth=4).collect()}
    assert est[1] == 10
    assert est[999999] == 0


def test_weighted_pagerank_rejects_null_and_negative_weights(spark):
    from sftp_data_ingestion_spark.ext.graph import pagerank

    bad = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, -3.0)], ["src", "dst", "w"]
    )
    with pytest.raises(ValueError, match="NULL/NaN/negative weight"):
        pagerank(bad, weight_col="w")
    # NaN passes both `w < 0` and `w > 0` under Spark's NaN ordering —
    # it must be caught explicitly, not slip through into NaN ranks
    nan = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, float("nan"))], ["src", "dst", "w"]
    )
    with pytest.raises(ValueError, match="NULL/NaN/negative weight"):
        pagerank(nan, weight_col="w")
    # zero-weight edges are "no edge": must not create a 0-strength src
    zero = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (3, 1, 0.0), (1, 3, 1.0)],
        ["src", "dst", "w"],
    )
    ranks = pagerank(zero, iterations=3, weight_col="w")
    assert ranks.where(F.isnan("rank") | F.col("rank").isNull()).count() == 0


def test_fit_logreg_drops_null_rows_from_denominator(spark):
    rows = [(float(i % 2), float(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, ["f", "label"])
    nulls = spark.createDataFrame(
        [(None, 1.0), (0.5, None)], "f double, label double"
    )
    w_clean, b_clean, _ = fit_logreg(df, ["f"], "label", iterations=5, lr=1.0)
    w_noisy, b_noisy, _ = fit_logreg(
        df.unionByName(nulls), ["f"], "label", iterations=5, lr=1.0
    )
    assert w_clean == pytest.approx(w_noisy, abs=1e-12)
    assert b_clean == pytest.approx(b_noisy, abs=1e-12)


def test_wav_signature_identical_audio_pairs_at_zero(spark):
    from sftp_data_ingestion_spark.ext import multimodal as mm

    rows = [
        (1, "repeat me exactly please " * 8),
        (2, "repeat me exactly please " * 8),
        (3, "totally different audio waveform content here " * 4),
    ]
    df = spark.createDataFrame(rows, ["media_id", "text"])
    hashes = mm.text_wav_ahash(df)
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in mm.ahash_near_dup_pairs(hashes, max_distance=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_wav_signature_total_over_non_ascii_bytes(spark):
    # center=128 mapping: every UTF-8 byte (incl. CJK lead bytes
    # >= 228) stays inside int16 — the kernel must not crash
    from sftp_data_ingestion_spark.ext import multimodal as mm

    df = spark.createDataFrame(
        [(1, "中文 emoji 😀 ÿ " * 10), (2, "中文 emoji 😀 ÿ " * 10)],
        ["media_id", "text"],
    )
    hashes = mm.text_wav_ahash(df)
    rows = hashes.collect()
    assert len(rows) == 2
    pairs = mm.ahash_near_dup_pairs(hashes, max_distance=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_wav_ahash_rejects_uneven_blocks(spark):
    from sftp_data_ingestion_spark.ext import multimodal as mm

    df = spark.createDataFrame([(1, "x")], ["media_id", "text"])
    with pytest.raises(ValueError, match="multiple of n_blocks"):
        mm.text_wav_ahash(df, n_samples=250, n_blocks=64)


def test_nfc_flags_hand_computed(spark):
    """Composed 'café' is NFC-normal (flag 0, delta 0); the
    decomposed twin ('e' + U+0301) is not (flag 1) and shrinks by
    exactly its combining-mark count under NFC; ASCII is untouched."""
    from sftp_data_ingestion_spark.ext.textnorm import nfc_flags

    rows = [
        ("s0", "café"),            # composed: NFC-normal
        ("s0", "café"),           # decomposed: 5 cps -> 4
        ("s1", "plain ascii"),
        ("s1", "déjà vu"),  # two combining marks -> -2
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = sorted(
        (r["source"], r["non_nfc"], r["cp_delta"])
        for r in nfc_flags(df).collect()
    )
    assert got == [
        ("s0", 0, 0),
        ("s0", 1, 1),
        ("s1", 0, 0),
        ("s1", 1, 2),
    ]


def test_nfc_flags_validates_columns_and_takes_group_col(spark):
    """r9 ADVICE: a missing text/group column must raise a clear
    driver-side ValueError, not a KeyError deep in the Arrow kernel;
    and the group column is parameterizable."""
    from sftp_data_ingestion_spark.ext.textnorm import nfc_flags

    df = spark.createDataFrame(
        [("lang0", "cafe\u0301")], "lang string, body string"
    )
    with pytest.raises(ValueError, match="not in input"):
        nfc_flags(df)  # neither 'text' nor 'source' exists
    got = nfc_flags(df, text_col="body", group_col="lang").collect()
    assert [(r["source"], r["non_nfc"], r["cp_delta"]) for r in got] == [
        ("lang0", 1, 1)
    ]


def test_url_domain_stats_hand_computed(spark, tmp_path):
    """doc 0 hits both plant branches (cdn0 + api), doc 7 only the
    cdn branch (cdn1: 7%3=1), docs 1..6 plant nothing and must
    produce NO domains (no false positives on plain text)."""
    from sftp_data_ingestion_spark import queries as q

    rows = [(i, f"plain text {i}", "en", "s0", 12) for i in range(8)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["domain"]: (r["n_urls"], r["n_docs"])
        for r in q.QUERIES["t_url_domain_stats"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        "cdn0.example.com": (1, 1),
        "cdn1.example.com": (1, 1),
        "api.example.org": (1, 1),
    }


def test_markov_attribution_shares_sum_to_one(spark):
    """Removal-effect shares are a distribution over channels and the
    whole pipeline is rerun-identical."""
    from sftp_data_ingestion_spark.ext.graph import (
        markov_removal_attribution,
    )
    from sftp_data_ingestion_spark.queries.registry import table

    e = table(spark, "/root/testdata/sf0.01", "events")
    a = markov_removal_attribution(e)
    b = markov_removal_attribution(e)
    assert a == b
    assert all(re > 0 for _, re, _ in a)
    assert abs(sum(s for _, _, s in a) - 1.0) < 1e-4
