"""Hand-computed fixtures for the z4_ training-corpus operators —
values derived on paper, not from either engine."""

import math

import pyspark.sql.functions as F
import pytest

from sftp_data_ingestion_spark import queries as q

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_tfidf_cosine_hand_computed(spark, tmp_path):
    """3 docs, query = doc 0 (0 % 50 == 0):
    d0 = 'a b', d1 = 'a b', d2 = 'a c'.
    dfs: a=3, b=2, c=1; idf: a=ln(1)=0, b=ln(3/2), c=ln(3).
    Weights: d0 = d1 = {b: ln1.5}, d2 = {c: ln3} (a-weight 0 kills the
    shared term). cos(d0, d1) = 1.0; cos(d0, d2) = 0 via no shared
    non-zero term -> pair absent (dot only over joined terms)."""
    docs = _docs(
        spark, [("a b", "s"), ("a b", "s"), ("a c", "s")]
    )
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {
        (r["query_id"], r["neighbor_id"]): (r["sim"], r["rnk"])
        for r in q.QUERIES["z4_sparse_tfidf_topk"](spark, d).collect()
    }
    # d2 shares only zero-weight 'a': dot = 0, sim = 0.0, still ranked
    assert got[(0, 1)] == (1.0, 1)
    assert got[(0, 2)] == (0.0, 2)
    assert len(got) == 2


def test_cooccur_pmi_hand_computed(spark, tmp_path):
    """4 docs: {a b}, {a b}, {a c}, {d}. N=4.
    df: a=3, b=2, c=1, d=1. pairs: (a,b) n=2, (a,c) n=1.
    pmi(a,b) = ln(2*4/(3*2)) = ln(4/3); pmi(a,c) = ln(1*4/(3*1))."""
    docs = _docs(
        spark,
        [("a b", "s"), ("b a", "s"), ("a c", "s"), ("d", "s")],
    )
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    rows = q.QUERIES["z4_cooccur_pmi"](spark, d).collect()
    got = {(r["term_a"], r["term_b"]): (r["n_ab"], r["pmi"]) for r in rows}
    assert got == {
        ("a", "b"): (2, round(math.log(4 / 3), 6)),
        ("a", "c"): (1, round(math.log(4 / 3), 6)),
    }
    # ordering: equal pmi -> lexical tiebreak puts (a,b) first
    assert [(r["term_a"], r["term_b"]) for r in rows] == [
        ("a", "b"),
        ("a", "c"),
    ]


def test_shard_packing_hand_computed(spark, tmp_path):
    """10 docs in one source with token counts 10..1: size-ranked
    round-robin over 8 shards -> shards 0..7 get sizes 10..3, then
    shard 0 gets 2, shard 1 gets 1. Largest two shards carry the
    wrap-around docs."""
    rows = [("w " * n).strip() for n in range(10, 0, -1)]
    docs = _docs(spark, [(t, "s") for t in rows])
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["max_doc_tokens"])
        for r in q.QUERIES["z4_shard_packing"](spark, d).collect()
    }
    assert got[0] == (2, 12, 10)  # 10 + 2
    assert got[1] == (2, 10, 9)  # 9 + 1
    assert {s: got[s] for s in range(2, 8)} == {
        s: (1, 10 - s, 10 - s) for s in range(2, 8)
    }


def test_js_divergence_hand_computed(spark, tmp_path):
    """Two sources with token streams s1 = [a a b], s2 = [b].
    Global: a 2/4, b 2/4. s1: p(a)=2/3, p(b)=1/3.
    jsd(s1) = 0.5*[p_a ln(2p_a/(p_a+q_a)) + q_a ln(2q_a/(p_a+q_a))
                 + p_b ln(2p_b/(p_b+q_b)) + q_b ln(2q_b/(p_b+q_b))]
    (no absent terms: sum q = 1 so the closed-form tail is 0).
    s2: p(b)=1, a absent -> tail contributes 0.5*ln2*q_a."""
    docs = _docs(spark, [("a a b", "s1"), ("b", "s2")])
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {
        r["source"]: r["jsd"]
        for r in q.QUERIES["z4_js_divergence_sources"](spark, d).collect()
    }

    def term(p, qv):
        m = (p + qv) / 2
        return p * math.log(p / m) + qv * math.log(qv / m)

    exp_s1 = 0.5 * (term(2 / 3, 0.5) + term(1 / 3, 0.5))
    exp_s2 = 0.5 * term(1.0, 0.5) + 0.5 * math.log(2) * 0.5
    assert got["s1"] == pytest.approx(round(exp_s1, 6), abs=1e-6)
    assert got["s2"] == pytest.approx(round(exp_s2, 6), abs=1e-6)


def test_z4_plans_scale_shapes(spark):
    """Plan pins: the probe side of the tf-idf join broadcasts, the
    PMI top-20 plans as TakeOrderedAndProject (no global window), the
    shard window is PARTITIONED (never the r5 global-window killer),
    and nothing falls back to Python row UDFs."""
    p1 = (
        q.QUERIES["z4_sparse_tfidf_topk"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p1
    assert "BatchEvalPython" not in p1
    # the postings are materialized ONCE behind the checkpoint: no
    # consumer re-tokenizes the corpus (Generate = the explode; it
    # must not appear in the post-checkpoint plan at all)
    assert "Generate" not in p1

    p2 = (
        q.QUERIES["z4_cooccur_pmi"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p2
    assert "Window" not in p2

    p3 = (
        q.QUERIES["z4_shard_packing"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in p3
    # the window partitions by source: its exchange hashes on source
    assert "hashpartitioning(source" in p3


def test_ngram_novelty_hand_computed(spark, tmp_path):
    """d0 'a b c d' -> shingles {abc, bcd} both first -> 1.0;
    d1 'a b c e' -> {abc (seen), bce (new)} -> 0.5;
    d2 'x y' (short: whole-text shingle) -> 1.0."""
    docs = _docs(
        spark, [("a b c d", "s"), ("a b c e", "s"), ("x y", "s")]
    )
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_shingles"], r["novelty"])
        for r in q.QUERIES["z4_ngram_novelty"](spark, d).collect()
    }
    assert got == {0: (2, 1.0), 1: (2, 0.5), 2: (1, 1.0)}


def test_containment_pairs_hand_computed(spark, tmp_path):
    """d0 'p q r' (1 shingle) is fully contained in d1 'p q r s t'
    (3 shingles): containment(0 in 1) = 1.0 reported; the reverse
    direction 1/3 falls below the 0.6 gate."""
    docs = _docs(spark, [("p q r", "s"), ("p q r s t", "s")])
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    rows = q.QUERIES["z4_containment_pairs"](spark, d).collect()
    assert [(r["id_a"], r["id_b"], r["containment"]) for r in rows] == [
        (0, 1, 1.0)
    ]


def test_calibration_bins_hand_computed(spark, tmp_path):
    """Two crafted docs: an all-caps short doc scores a deeply
    negative margin (upper ratio ~1 at weight -2, bias -1.5) -> prob
    near 0 -> bin 0, label False (n_chars < 200); a long lowercase
    doc gets margin > 0 -> prob > 0.5, label True. Expected values
    recomputed from the published weight vector."""
    low = "AAA BBB"                      # n_chars 7, 2 toks, upper 6/7
    hi = ("word " * 200).strip()         # n_chars 999, 200 toks, no upper
    docs = _docs(spark, [(low, "s"), (hi, "s")])
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")

    def prob(n_chars, n_tok, n_upper):
        m = (
            -1.5
            + 0.9 * n_chars / 1000.0
            + 0.7 * n_tok / 100.0
            - 2.0 * n_upper / max(n_chars, 1)
        )
        return round(1.0 / (1.0 + math.exp(-m)), 6)

    p_low, p_hi = prob(7, 2, 6), prob(999, 200, 0)
    got = {
        r["bin"]: (r["n"], r["mean_prob"], r["frac_pos"])
        for r in q.QUERIES["z4_score_calibration_bins"](spark, d).collect()
    }
    assert got == {
        min(int(p_low * 10), 9): (1, p_low, 0.0),
        min(int(p_hi * 10), 9): (1, p_hi, 1.0),
    }
    assert p_low < 0.1 < 0.5 < p_hi


def test_template_position_entropy_hand_computed(spark, tmp_path):
    """docs 'a b', 'a c': position 0 is template-rigid (all 'a',
    entropy 0), position 1 is uniform over {b, c} (entropy ln 2)."""
    docs = _docs(spark, [("a b", "s"), ("a c", "s")])
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {
        r["pos"]: (r["n_docs"], r["entropy"])
        for r in q.QUERIES["z4_template_position_entropy"](
            spark, d
        ).collect()
    }
    assert got == {
        0: (2, 0.0),
        1: (2, round(math.log(2), 6)),
    }


def test_interval_join_overlap_hand_computed(spark):
    """Hand-built intervals across bucket boundaries: A [d1, d10] and
    B [d8, d20] overlap 3 days and share TWO 7-day buckets (anchoring
    must yield exactly one match); C [d12, d13] overlaps B but not A;
    D on another key never matches."""
    from datetime import datetime

    from sftp_data_ingestion_spark.operators.temporal import (
        interval_join_overlap,
    )

    def d(day):
        return datetime(2024, 1, day)

    left = spark.createDataFrame(
        [(1, "A", d(1), d(10)), (1, "C", d(12), d(13))],
        "k int, lid string, l_s timestamp, l_e timestamp",
    )
    right = spark.createDataFrame(
        [(1, "B", d(8), d(20)), (2, "D", d(1), d(31))],
        "k int, rid string, r_s timestamp, r_e timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_join_overlap(
            left, right, "l_s", "l_e", "r_s", "r_e",
            bucket="7 days", keys=["k"],
        ).collect()
    )
    assert got == [("A", "B"), ("C", "B")]  # exactly once each


def test_interval_join_plan_has_no_nested_loop(spark):
    """The graded interval join must plan as an equi-join on
    (custkey, bucket) — never the nested-loop cross product a pure
    inequality join falls into."""
    p = (
        q.QUERIES["z4_interval_overlap_join"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "__bucket" in p


def test_ks_drift_binned_hand_computed(spark, tmp_path):
    """Type A all in bin 0 (values < 25), type B all in bin 1: the
    reference CDF is 0.5 at bin 0 and 1.0 at bin 1, each type's own
    CDF is a step — D = 0.5 for both."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1), 1, "A", 10.0, "{}"),
        (2, datetime(2024, 1, 1), 1, "A", 12.0, "{}"),
        (3, datetime(2024, 1, 1), 2, "B", 30.0, "{}"),
        (4, datetime(2024, 1, 1), 2, "B", 32.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    d = str(tmp_path / "fx")
    ev.write.parquet(f"{d}/events.parquet")
    got = {
        r["event_type"]: r["ks_stat"]
        for r in q.QUERIES["z4_ks_drift_binned"](spark, d).collect()
    }
    assert got == {"A": 0.5, "B": 0.5}


def test_benford_first_digit_hand_computed(spark, tmp_path):
    """Three orders with first digits 1, 1, 2: observed p = (2/3,
    1/3, 0...); chi2 distance computed from log10(1 + 1/d) on
    paper."""
    from datetime import datetime

    rows = [
        (1, 1, "O", 100.5, datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, "O", 19.2, datetime(2024, 1, 1), "1-URGENT"),
        (3, 1, "O", 250.0, datetime(2024, 1, 1), "1-URGENT"),
    ]
    o = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = str(tmp_path / "fx")
    o.write.parquet(f"{d}/orders.parquet")
    obs = {1: 2 / 3, 2: 1 / 3}
    chi2 = sum(
        (obs.get(dd, 0.0) - math.log10(1 + 1 / dd)) ** 2
        / math.log10(1 + 1 / dd)
        for dd in range(1, 10)
    )
    rows = q.QUERIES["z4_benford_first_digit"](spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 3
    assert rows[0]["benford_chi2"] == pytest.approx(round(chi2, 6), abs=1e-6)


def test_dataset_card_hand_computed(spark, tmp_path):
    """4 docs, 2 sources (3:1 split), 2 langs (2:2), one exact dup
    pair: n_tokens = 2+2+2+3 = 9; source entropy =
    -(0.75 ln 0.75 + 0.25 ln 0.25); lang entropy = ln 2;
    dup rate = 1 - 3/4 = 0.25."""
    rows = [
        (0, "a b", "en", "s1", 3),
        (1, "a  b", "en", "s1", 4),   # normalizes equal to doc 0
        (2, "c d", "de", "s1", 3),
        (3, "e f g", "de", "s2", 5),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    r = q.QUERIES["z4_dataset_card"](spark, d).collect()[0]
    assert r["n_docs"] == 4 and r["n_tokens"] == 9
    assert r["n_sources"] == 2
    exp_src = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert r["source_entropy"] == pytest.approx(round(exp_src, 6))
    assert r["lang_entropy"] == pytest.approx(round(math.log(2), 6))
    assert r["exact_dup_rate"] == 0.25
    assert 0.0 <= r["mean_quality"] <= 1.0


def test_zipf_slope_hand_computed(spark, tmp_path):
    """One source, term counts 4/2/1 (a x4, b x2, c x1): ranks 1/2/3,
    slope = regr_slope(ln c, ln rank) computed on paper via the
    closed-form least-squares estimator."""
    docs = _docs(spark, [("a a a a b b c", "s1")])
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(c) for c in (4, 2, 1)]
    xb, yb = sum(xs) / 3, sum(ys) / 3
    slope = sum((x - xb) * (y - yb) for x, y in zip(xs, ys)) / sum(
        (x - xb) ** 2 for x in xs
    )
    rows = q.QUERIES["z4_zipf_slope_by_source"](spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["n_terms"] == 3
    assert rows[0]["zipf_slope"] == pytest.approx(round(slope, 6), abs=1e-6)


def test_shard_packing_round_robin_invariant(spark, tmp_path):
    """Round-robin invariant for ANY doc mix: within each source the
    shard doc-counts differ by at most 1."""
    import random

    rnd = random.Random(13)
    rows = [
        (("w " * rnd.randrange(1, 30)).strip(), f"s{rnd.randrange(3)}")
        for _ in range(50)
    ]
    docs = _docs(spark, rows)
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    out = q.QUERIES["z4_shard_packing"](spark, d).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r["n_docs"])
    for source, counts in by_source.items():
        assert max(counts) - min(counts) <= 1, source


def test_max_df_bounds_hot_shingle_fanout(spark):
    """df-pruning discipline (the 100 TB fanout bound): one planted
    boilerplate shingle shared by 10 docs fans out 10*9 = 90 directed
    pairs; with max_df=5 the hot posting list is dropped BEFORE the
    self-join and only the rare-shingle pairs survive."""
    from sftp_data_ingestion_spark.ext import dedup as dd

    rows = [(i, "hot") for i in range(10)] + [(0, "rare"), (1, "rare")]
    toks = spark.createDataFrame(rows, "doc_id long, sh string")

    unpruned = dd.shared_shingle_intersections(toks, directed=True)
    assert unpruned.count() == 90  # hot fanout dominates ((0,1) i=2)

    pruned = dd.shared_shingle_intersections(toks, directed=True, max_df=5)
    got = {(r["id_a"], r["id_b"]): r["i"] for r in pruned.collect()}
    assert got == {(0, 1): 1, (1, 0): 1}

    # the prune must reach the join as a broadcast anti-join on the
    # (few) hot keys, not a posting-stream shuffle
    p = (
        pruned._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in p and "Broadcast" in p


def test_containment_pairs_max_df_param(spark, tmp_path):
    """The graded query exposes max_df end-to-end: a boilerplate
    footer shared by every doc creates cross-pairs at default, and
    max_df prunes them while genuine containment survives."""
    boiler = "all rights reserved worldwide"
    # one unique token + 4 boilerplate: 3 shingles/doc, 2 shared ->
    # containment 2/3 >= 0.6 for every ordered boiler pair at default
    docs = _docs(
        spark,
        [(f"u{i} {boiler}", "s") for i in range(8)]
        + [("p q r", "s"), ("p q r s t", "s")],
    )
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    capped = q.QUERIES["z4_containment_pairs"](spark, d, max_df=4).collect()
    # only the genuine quote-inclusion pair survives: doc 8 'p q r'
    # (1 shingle) fully contained in doc 9 'p q r s t'
    assert [(r["id_a"], r["id_b"], r["containment"]) for r in capped] == [
        (8, 9, 1.0)
    ]
    # default (no cap) also reports boilerplate-driven pairs
    assert len(q.QUERIES["z4_containment_pairs"](spark, d).collect()) > 1


def test_tfidf_idf_join_regimes(spark):
    """The idf join must not be PINNED to broadcast above broadcast
    range (a 100 TB vocabulary is 10^7-10^8 rows): broadcast_idf=True
    forces the hint regardless of optimizer settings, while False
    hands the strategy back to Catalyst — emulated here by disabling
    auto-broadcast, the decision 100 TB stats would produce — which
    plans the standard term-key shuffle join. Both regimes agree
    exactly on values."""
    from sftp_data_ingestion_spark.queries.q_training import (
        _tfidf_weights,
        _tokens,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    tf = (
        _tokens(d)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .repartition(8, "term")
        .localCheckpoint()
    )
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        wb = _tfidf_weights(tf, n_docs, broadcast_idf=True)
        ws = _tfidf_weights(tf, n_docs, broadcast_idf=False)

        pb = wb._jdf.queryExecution().executedPlan().toString()
        ps = ws._jdf.queryExecution().executedPlan().toString()
        # the hint overrides the disabled threshold...
        assert "BroadcastHashJoin" in pb
        # ...and without it the idf side joins by shuffle, never NL
        assert "BroadcastHashJoin" not in ps
        assert "SortMergeJoin" in ps or "ShuffledHashJoin" in ps
        assert "BroadcastNestedLoopJoin [term" not in ps

        got_b = {
            (r["doc_id"], r["term"]): r["wt"] for r in wb.collect()
        }
        got_s = {
            (r["doc_id"], r["term"]): r["wt"] for r in ws.collect()
        }
        assert got_b == got_s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_zipf_tail_cap_plan_windowgrouplimit(spark, tmp_path):
    """top_k caps the ranked tail INSIDE the window operator:
    WindowGroupLimit pushes the per-source top-k below the shuffle so
    no task ever sorts a full vocabulary, and the capped slope is the
    2-point exact line: counts 4/2 at ranks 1/2 -> slope -1."""
    from sftp_data_ingestion_spark.queries.q_training import _zipf_slope

    docs = _docs(spark, [("a a a a b b c", "s1")])
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    capped = _zipf_slope(
        spark.read.parquet(f"{d}/documents.parquet"), top_k=2
    )
    p = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p
    rows = capped.collect()
    assert len(rows) == 1
    assert rows[0]["n_terms"] == 2
    assert rows[0]["zipf_slope"] == pytest.approx(-1.0, abs=1e-6)


def _release_prob(text):
    """The exact corpus_release_e2e / z4_score_calibration_bins
    scorer, recomputed in plain python for fixture assertions."""
    n_chars = len(text)
    caps = sum(1 for c in text if c.isupper())
    margin = (
        -1.5
        + 0.9 * (n_chars / 1000.0)
        + 0.7 * (len(text.split(" ")) / 100.0)
        + -2.0 * (caps / max(n_chars, 1))
    )
    return round(1.0 / (1.0 + math.exp(-margin)), 6)


def test_corpus_release_e2e_hand_computed(spark, tmp_path):
    """Composed release: a short doc fails the 0.3 gate, a planted
    exact duplicate among the gated docs drops in dedup (lowest id
    survives), and the survivors round-robin into shards size-first.
    Every output column is recomputed in plain python."""
    long1 = " ".join(f"w{i}" for i in range(80))   # gated
    long2 = " ".join(f"v{i}" for i in range(70))   # gated, 2nd size
    short = "aa bb cc"                              # fails the gate
    docs = _docs(
        spark,
        [(long1, "s"), (long1, "s"), (long2, "s"), (short, "s")],
    )
    assert _release_prob(long1) >= 0.3
    assert _release_prob(long2) >= 0.3
    assert _release_prob(short) < 0.3
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    rows = q.QUERIES["corpus_release_e2e"](spark, d).collect()
    # release = docs 0 (dup survivor) and 2; shards by size rank
    got = {
        (r["source"], r["shard"]): (r["n_docs"], r["n_tokens"])
        for r in rows
    }
    assert got == {("s", 0): (1, 80), ("s", 1): (1, 70)}
    r0 = rows[0]
    assert r0["release_docs"] == 2
    assert r0["release_tokens"] == 150
    assert r0["n_gated"] == 1          # the short doc
    assert r0["n_dup_dropped"] == 1    # the planted copy of long1
    assert r0["mean_prob"] == pytest.approx(
        round((_release_prob(long1) + _release_prob(long2)) / 2, 6),
        abs=2e-6,
    )
    assert r0["max_doc_tokens"] == 80


def test_corpus_release_e2e_plan_shape(spark):
    """Plan pins above the checkpoint boundary: the packing window is
    PARTITIONED by source (never global), the card and drop ledger
    ride one-row broadcast cross-joins, and nothing falls back to
    Python row UDFs."""
    p = (
        q.QUERIES["corpus_release_e2e"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(source" in p
    assert p.count("BroadcastNestedLoopJoin") == 2
    assert "BatchEvalPython" not in p


def test_tfidf_bucketed_postings_exchange_free(spark, tmp_path):
    """The 100 TB postings layout, pinned: with the inverted index
    materialized as a term-BUCKETED table, the df/idf aggregate and
    the postings side of the idf join (broadcast_idf=False — the
    at-scale regime where the vocabulary exceeds any broadcast
    budget) read HashPartitioning(term) off the scan and plan NO
    term exchange. The localCheckpoint path cannot do this
    (partitioning metadata does not survive the RDD boundary —
    measured, PERFORMANCE.md r8), which is why bucketing is the
    exchange-elimination lever.

    Also pins value agreement: the full top-k on the bucketed layout
    must equal the graded query's rows exactly."""
    from sftp_data_ingestion_spark.queries.q_training import (
        _tfidf_weights,
        term_bucketed_postings,
        tfidf_topk_from_postings,
    )
    from sftp_data_ingestion_spark.queries.registry import table as t

    d = t(spark, SF, "documents")
    btf = term_bucketed_postings(
        spark, d, "tfidf_postings_bucketed_test",
        str(tmp_path / "postings"), num_buckets=8,
    )
    try:
        n_docs = d.select(F.count_distinct("doc_id").alias("n_docs"))
        # pin the AT-SCALE regime: disable auto-broadcast so fixture
        # stats can't pick a broadcast join (at 100 TB neither side
        # of the term join fits a broadcast budget)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            w = _tfidf_weights(btf, n_docs, broadcast_idf=False)
            p = w._jdf.queryExecution().executedPlan().toString()
            # no exchange anywhere on the term key: the bucketed scan
            # satisfies both the df aggregate and the idf join
            assert "Exchange hashpartitioning(term" not in p
            assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
            assert "Bucketed: true" in p

            # contrast: the same regime over a NON-bucketed postings
            # frame must shuffle on term (proves the assertion above
            # is the layout's doing, not a planner accident)
            from sftp_data_ingestion_spark.queries.q_training import (
                _tf_postings,
            )

            ps = (
                _tfidf_weights(_tf_postings(d), n_docs, broadcast_idf=False)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "Exchange hashpartitioning(term" in ps
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # value agreement: full top-k over the bucketed layout ==
        # the graded query's result
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["sim"], r["rnk"])
            for r in tfidf_topk_from_postings(
                d, btf, broadcast_idf=False
            ).collect()
        )
        want = sorted(
            (r["query_id"], r["neighbor_id"], r["sim"], r["rnk"])
            for r in q.QUERIES["z4_sparse_tfidf_topk"](spark, SF).collect()
        )
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS tfidf_postings_bucketed_test")


# ---------------------------------------------------------------------------
# paragraph dedup + excess-loss family (r13 session 2)
# ---------------------------------------------------------------------------


def test_paragraph_dedup_hand_computed(spark):
    """4 docs, paragraphs split on newline:
    d0 = [p1, p2]         -> both first occurrences, text unchanged
    d1 = [p2, p3]         -> p2 already seen at (d0, pos 1): drop; keep p3
    d2 = [p1]             -> fully duplicate: 0 kept, empty new_text
    d3 = ['', p4]         -> blank paragraph ignored entirely
    """
    from sftp_data_ingestion_spark.ext.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(0, "p1\np2"), (1, "p2\np3"), (2, "p1"), (3, "\np4")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["new_text"])
        for r in paragraph_dedup(docs).collect()
    }
    assert got == {
        0: (2, 2, "p1\np2"),
        1: (2, 1, "p3"),
        2: (1, 0, ""),
        3: (1, 1, "p4"),
    }


def test_paragraph_dedup_first_occurrence_is_global(spark):
    """The survivor is the corpus-wide (doc_id, pos) minimum, not a
    per-partition accident: the same paragraph planted in 20 docs
    keeps exactly one copy, in the lowest doc_id."""
    from sftp_data_ingestion_spark.ext.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(i, f"unique{i}\nshared boilerplate") for i in range(20)],
        "doc_id long, text string",
    ).repartition(8)
    rows = paragraph_dedup(docs).collect()
    keepers = [r["doc_id"] for r in rows if "shared boilerplate" in r["new_text"]]
    assert keepers == [0]
    assert all(r["n_paras"] == 2 for r in rows)
    assert sum(r["n_kept"] for r in rows) == 21  # 20 unique + 1 shared


def test_doremi_weights_hand_computed(spark):
    """Replay the EG loop in plain Python from the same pinned inputs;
    the distributed iteration must match to float precision, weights
    must sum to 1 (the smoothing step renormalizes exactly), and the
    higher-excess domain must win weight."""
    import math

    from sftp_data_ingestion_spark.ext.classify import doremi_weights

    lam = [("a", 1.0), ("b", 0.25), ("c", 0.0)]
    eta, c, iters = 0.5, 0.2, 10
    w = {s: 1.0 / 3 for s, _ in lam}
    for _ in range(iters):
        wu = {s: w[s] * math.exp(eta * x) for s, x in lam}
        tot = sum(wu.values())  # dict order = insertion order = source order
        w = {s: (1 - c) * wu[s] / tot + c / 3 for s, _ in lam}
    df = spark.createDataFrame(lam, "source string, excess_loss double")
    got = {
        r["source"]: r["w"]
        for r in doremi_weights(df, eta=eta, smoothing=c, iterations=iters).collect()
    }
    for s, _ in lam:
        assert got[s] == pytest.approx(w[s], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    assert got["a"] > got["b"] > got["c"] > c / 3 - 1e-12


def test_doremi_query_properties(spark):
    rows = q.QUERIES["x_doremi_domain_weights"](spark, SF).collect()
    assert len(rows) == 20  # one per source
    total = sum(r["weight"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-4)  # 6dp-rounded weights
    floor = 0.2 / 20
    assert all(r["weight"] >= floor - 1e-9 for r in rows)
    assert all(r["excess_loss"] >= 0.0 for r in rows)


def test_rho_loss_selection_properties(spark):
    rows = q.QUERIES["x_rho_loss_selection"](spark, SF).collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append((r["rk"], r["reducible_loss"]))
    assert len(per) == 20
    for src, items in per.items():
        items.sort()
        assert [rk for rk, _ in items] == list(range(1, len(items) + 1))
        assert len(items) <= 5
        losses = [x for _, x in items]
        assert losses == sorted(losses, reverse=True), src


def test_kneser_ney_hand_computed(spark, tmp_path):
    """d0 = 'a b a b', d1 = 'a c'.
    Bigram counts: (a,b)=2, (b,a)=1, (a,c)=1; T=3 distinct types.
    fwd: a -> ctx 3, 2 continuations; b -> ctx 1, 1 continuation.
    p_cont = 1/3 for each of a, b, c (one distinct history each).
    p_KN(a,b) = 1.25/3 + .75*2/3*(1/3); p_KN(b,a) = .25 + .75*(1/3);
    p_KN(a,c) = .25/3 + .75*2/3*(1/3)."""
    import math

    docs = _docs(spark, [("a b a b", "s"), ("a c", "s")])
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    p_ab = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (1 / 3)
    p_ba = (1 - 0.75) / 1 + 0.75 * 1 / 1 * (1 / 3)
    p_ac = (1 - 0.75) / 3 + 0.75 * 2 / 3 * (1 / 3)
    want = {
        0: (round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 6), 3),
        1: (round(-math.log(p_ac), 6), 1),
    }
    got = {
        r["doc_id"]: (r["xent_kn"], r["n_bigrams"])
        for r in q.QUERIES["z3_kneser_ney_xent"](spark, d).collect()
    }
    assert got == want


def test_kneser_ney_discount_vs_mle(spark):
    """KN must never score a document MORE fluent than MLE on its
    once-seen bigrams' backoff mass alone — globally the discount
    makes sum over p_KN(.|prev) = 1 with mass moved toward diverse
    continuations, so on this corpus the two xents differ but both
    are finite and positive for every doc."""
    kn = {
        r["doc_id"]: r["xent_kn"]
        for r in q.QUERIES["z3_kneser_ney_xent"](spark, SF).collect()
    }
    mle = {
        r["doc_id"]: r["xent2"]
        for r in q.QUERIES["z3_bigram_cross_entropy"](spark, SF).collect()
    }
    assert set(kn) == set(mle)
    assert all(v > 0 for v in kn.values())
    # MLE assigns the full count mass; KN discounts it, so corpus-mean
    # KN xent is >= corpus-mean MLE xent
    assert sum(kn.values()) / len(kn) >= sum(mle.values()) / len(mle)


def test_k_anonymity_suppress_ladder(spark, tmp_path):
    """6 docs in one full-QI group -> level 0 (publish everything);
    3+3 docs split across two buckets of one (lang, source) group ->
    level 1 (bucket suppressed, lang/source kept); a 2-doc (lang,
    source) group -> level 2 (everything suppressed)."""
    rows = []
    for i in range(6):
        rows.append((i, "t", "en", "s1", 10))        # bucket 0, k0=6
    for i in range(3):
        rows.append((10 + i, "t", "en", "s2", 10))   # bucket 0, k0=3, k1=6
    for i in range(3):
        rows.append((20 + i, "t", "en", "s2", 110))  # bucket 1, k0=3, k1=6
    rows += [(30, "t", "fr", "s3", 10), (31, "t", "fr", "s3", 10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: (
            r["k0"], r["level"], r["lang_out"], r["source_out"], r["bucket_out"]
        )
        for r in q.QUERIES["t_k_anonymity_suppress"](spark, d).collect()
    }
    assert got[0] == (6, 0, "en", "s1", 0)
    assert got[10] == (3, 1, "en", "s2", None)
    assert got[20] == (3, 1, "en", "s2", None)
    assert got[30] == (2, 2, None, None, None)


def test_bloom_paragraph_batch_hand_computed(spark, tmp_path):
    """Fixture re-chunks 12-token docs; with <=12 tokens each doc is
    ONE paragraph. doc_id % 10 == 0 is the batch; % 4 == 0 gets the
    planted boilerplate appended.
    - doc 0: batch, 1 organic para (unique) + boilerplate. Boilerplate
      is also planted on corpus doc 4 -> NOT new; organic para -> new.
    - doc 10: batch, para identical to corpus doc 1 -> 0 new.
    - doc 20: batch + %4: organic unique -> new; boilerplate -> not new.
    """
    rows = [
        (0, "alpha beta"),          # batch, planted
        (1, "shared words here"),   # corpus
        (4, "corpus only text"),    # corpus, planted (boiler enters corpus)
        (10, "shared words here"),  # batch, dup of doc 1
        (20, "gamma delta"),        # batch, planted
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "fx")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_paras"], r["n_new_paras"])
        for r in q.QUERIES["d_bloom_paragraph_batch"](spark, d).collect()
    }
    assert got == {0: (2, 1), 10: (1, 0), 20: (2, 1)}


def test_html_to_text_hand_cases(spark):
    """Ordering traps pinned: script/style BODIES go before the tag
    strip (a '<' inside script must not open a phantom tag), entities
    decode AFTER tags (literal '&lt;b&gt;' survives as text '<b>')."""
    from sftp_data_ingestion_spark.ext.textstats import html_to_text

    cases = [
        ("<script>if(a<b){c()}</script>ok", "ok"),
        ("<style>p>span{x:1}</style>body", "body"),
        ("a<!-- multi\nline -->b", "a b"),
        ("&lt;script&gt;not code&lt;/script&gt;", "<script>not code</script>"),
        ("<p>x&nbsp;&amp;&nbsp;y</p>", "x & y"),
        ("plain   text\n\nhere", "plain text here"),
        ("<div class='a' data-x=\"1\">v</div>", "v"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "i long, s string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("s")).alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_lsh_param_tuning_matches_python_model(spark):
    """Replicate the S-curve error integral in plain Python; the
    distributed fold must match to the 6 dp round, and the chosen
    (b, r) must move from many-narrow-bands at t=0.5 toward
    few-wide-bands at t=0.9 (the MMDS §3.4 regime)."""
    rows = q.QUERIES["d_lsh_param_tuning"](spark, SF).collect()
    got = {(r["threshold"], r["b"], r["r"]): (r["fp"], r["fn"], r["chosen"])
           for r in rows}
    assert len(got) == 21
    best = {}
    for t in (0.5, 0.7, 0.9):
        scored = []
        for b in (1, 2, 4, 8, 16, 32, 64):
            rr = 64 // b
            fp = fn = 0.0
            for i in range(1000):
                s = (i + 0.5) / 1000.0
                p = 1.0 - (1.0 - s**rr) ** b
                if s < t:
                    fp += p
                else:
                    fn += 1.0 - p
            fp, fn = round(fp / 1000.0, 6), round(fn / 1000.0, 6)
            assert got[(t, b, rr)][:2] == (fp, fn), (t, b, rr)
            scored.append((fp + fn, b, rr))
        best[t] = min(scored)[1:]
    for t in (0.5, 0.7, 0.9):
        for b in (1, 2, 4, 8, 16, 32, 64):
            assert got[(t, b, 64 // b)][2] == ((b, 64 // b) == best[t])
    # steeper threshold -> fewer, wider bands
    assert best[0.5][0] > best[0.9][0]


def test_lsh_recall_measured_bands(spark):
    """The measured-recall fixture: exact fixture Jaccards, curve
    expectations from the closed form, every level within band, and
    the LOW levels must actually be lossy (recall < 1 at J=0.43 —
    the regime the graded near-dup fixtures never probe)."""
    import math

    rows = {r["jaccard"]: r for r in
            q.QUERIES["d_lsh_recall_measured"](spark, SF).collect()}
    assert set(rows) == {0.428571, 0.538462, 0.666667, 0.818182}
    for jac, r in rows.items():
        assert r["n_pairs"] == 60
        want = round(1.0 - (1.0 - jac ** 4) ** 16, 6)
        assert math.isclose(r["expected_recall"], want, abs_tol=2e-6)
        assert r["recall_within_band"]
