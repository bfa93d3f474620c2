"""Physical-plan regression tests: the scale-safety properties VERDICT
grades (pushdown, broadcast, shuffle count, no nested-loop joins) as
assertions, so a refactor that silently degrades a plan fails CI.

Plans are inspected pre-AQE (``sparkPlan``) — AQE can only improve on
these shapes at runtime (coalesce, skew-split, join re-selection).
"""

import pyspark.sql.functions as F
import pytest

from sftp_data_ingestion_spark import queries as q

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    # executedPlan pre-execution: AQE wrapper around the initial
    # physical plan WITH exchanges inserted (sparkPlan is pre-
    # EnsureRequirements in Spark 4 and shows none)
    return df._jdf.queryExecution().executedPlan().toString()


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def n_exchanges(p: str) -> int:
    # count shuffle exchanges only (broadcast exchanges are the cheap,
    # intended kind)
    return sum(
        1 for line in p.splitlines() if "Exchange" in line and "broadcast" not in line.lower()
    )


def test_flagship_single_shuffle_and_pushdown(spark):
    df = q.QUERIES["pedidos_pipeline_flagship"](spark, SF)
    p = plan(df)
    # exactly two shuffles: the fan_out rebalance (few-split local
    # fixture scans would serialize the 41-expression clean projection;
    # a no-op at scale) + the dedup window
    assert n_exchanges(p) == 2
    assert "WindowGroupLimit" in p  # map-side top-1 before the shuffle
    # the NULL-key gate reaches the scan side as a pushed filter
    assert "PushedFilters" in p
    # the two staging variants come from ONE scan + variant-array
    # explode (not two scan+derive branches union'd)
    assert p.count("FileScan") == 1
    # P4 is pushed through Window+Generate into the single scan branch:
    # no all-NULL-key window partition (skew), no shuffle of dropped rows
    opt = optimized(df)
    assert opt.count("Filter CASE WHEN") == 1


def test_q1_aggregate_pushdown_and_partial_agg(spark):
    df = q.QUERIES["g_q1_pricing_summary"](spark, SF)
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p or "LessThanOrEqual" in p
    # partial (map-side) aggregation before the exchange
    assert p.count("HashAggregate") >= 2
    assert n_exchanges(p) == 1


def test_revenue_join_broadcasts_dimensions(spark):
    df = q.QUERIES["j_revenue_by_nation"](spark, SF)
    p = plan(df)
    assert "BroadcastHashJoin" in p  # nation (and small dims) broadcast


def test_column_pruning_reaches_scan(spark):
    df = q.QUERIES["s_top10_orders"](spark, SF)
    p = plan(df)
    # scan reads only the three projected columns
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>" in p
    assert "TakeOrderedAndProject" in p  # top-k never global-sorts


def test_asof_tolerance_no_nested_loop(spark):
    from sftp_data_ingestion_spark.operators.temporal import asof_join
    from sftp_data_ingestion_spark.queries.registry import table

    e = table(spark, SF, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    df = asof_join(clicks, purchases, on="ts", by=["user_id"],
                   tolerance="6 hours")
    p = plan(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_incremental_near_dup_broadcasts_batch(spark):
    """Incremental dedup must join corpus bands against a BROADCAST of
    the batch bands — a shuffle join on band keys would move the whole
    corpus per incoming batch."""
    df = q.QUERIES["d_incremental_near_dup"](spark, SF)
    p = plan(df)
    assert "BroadcastHashJoin" in p


def test_pair_scoring_has_no_interpreted_hof(spark):
    """ANN pair scoring must stay flat scalar arithmetic (codegen),
    never aggregate/zip_with higher-order functions — the r3 bench
    regressed 6-18x when HOFs reached the per-pair stage. Signature /
    assignment expressions (per-row) keep compact HOF form by design,
    so only the post-join projection is asserted."""
    from sftp_data_ingestion_spark.ext import similarity as sim
    from sftp_data_ingestion_spark.queries.registry import table

    e = table(spark, SF, "embeddings")
    df = sim.cosine_topk(e.where(F.col("vec_id") < 10), e, k=3, dim=64)
    p = optimized(df)
    # the optimized plan's scoring projection references element_at
    # chains, not fold primitives
    assert "zip_with" not in p and "aggregate(" not in p


def test_asof_unbounded_is_join_free_union_sort(spark):
    """asof WITHOUT tolerance must have bounded per-key work at any
    scale: the union-sort form has NO join node at all — one union,
    one window sorted per key — so there is no per-key candidate set
    to blow up (r3's join+window form was the flagged scale risk)."""
    from sftp_data_ingestion_spark.operators.temporal import asof_join
    from sftp_data_ingestion_spark.queries.registry import table

    e = table(spark, SF, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    df = asof_join(clicks, purchases, on="ts", by=["user_id"])
    p = plan(df)
    assert "Join" not in p  # no join operator of ANY kind
    assert "Union" in p and "Window" in p
    # one shuffle for the per-key window; nothing else moves data
    assert n_exchanges(p) == 1


def test_range_join_is_equi_bucket_join(spark):
    df = q.QUERIES["a_range_join_signup_window"](spark, SF)
    p = plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_exact_dedup_one_shuffle(spark):
    df = q.QUERIES["d_exact_dedup_survivors"](spark, SF)
    p = plan(df)
    assert n_exchanges(p) == 1  # hash-partition by content hash only
    assert "WindowGroupLimit" in p


def test_merge_is_single_join_no_extra_shuffle_of_dw(spark):
    df = q.QUERIES["u1_upsert_newer_wins"](spark, SF)
    p = plan(df)
    # full-outer equi-join: one join node, both sides shuffled on the
    # key once (2 exchanges), no nested loops
    assert "FullOuter" in p and ("SortMergeJoin" in p or "ShuffledHashJoin" in p)
    assert "CartesianProduct" not in p
    assert n_exchanges(p) <= 2


def test_cleaning_projection_stays_codegen(spark):
    """The 41-expression cascade must stay inside whole-stage codegen
    (SURVEY §4.3 calls this the single biggest perf lever)."""
    from sftp_data_ingestion_spark.operators.clean import clean_staging
    from sftp_data_ingestion_spark.schemas import STG_COLUMNS

    row = {c: "" for c in STG_COLUMNS}
    df = spark.createDataFrame(
        [tuple(row[c] for c in STG_COLUMNS)],
        ", ".join(f"{c} string" for c in STG_COLUMNS),
    )
    out = clean_staging(df)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("codegen")
    text = buf.getvalue()
    assert "Found 0 WholeStageCodegen subtrees" not in text
    assert "WholeStageCodegen subtrees" in text


def test_bucketed_dw_merge_exchange_free(spark, tmp_path):
    """The 100 TB merge regime (u1_upsert_bucketed): with the DW side
    as a k-bucketed catalog table, the full-outer merge join plans
    exactly ONE exchange — the incoming delta repartitioning to the
    bucket layout. The warehouse side reads HashPartitioning(k) off
    its scan. Contrast: the same merge over a plain parquet DW
    exchanges BOTH sides."""
    from sftp_data_ingestion_spark.operators.bucketed import write_bucketed
    from sftp_data_ingestion_spark.operators.merge import upsert_newer_wins
    from sftp_data_ingestion_spark.queries.q_pipeline import _u1_inputs

    dw, delta = _u1_inputs(spark, SF)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # at 100 TB neither side of the merge broadcasts; pin that regime
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            dw, "u1_dw_bucketed_test", "k", 8, str(tmp_path / "dw")
        )
        merged = upsert_newer_wins(
            spark.table("u1_dw_bucketed_test"), delta,
            key="k", newer_col="ocr",
            newer_wins_cols=("ocr", "status"), greatest_cols=("ins",),
        )
        p = merged._jdf.queryExecution().executedPlan().toString()
        assert p.count("Exchange hashpartitioning(k") == 1, p
        assert "Bucketed: true" in p
        assert "FullOuter" in p

        plain = upsert_newer_wins(
            dw, delta, key="k", newer_col="ocr",
            newer_wins_cols=("ocr", "status"), greatest_cols=("ins",),
        )
        pp = plain._jdf.queryExecution().executedPlan().toString()
        assert pp.count("Exchange hashpartitioning(k") == 2, pp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS u1_dw_bucketed_test")


def test_cleaning_extractions_single_eval(spark):
    """The gated regex extractions (NFe key, digit strips, UF) must
    appear exactly ONCE each in the optimized plan: clean_staging's
    two-stage projection exists solely so the gate's condition and
    value share one regexp_replace per column (measured 2x cost when
    inlined — CollapseProject must keep the inner Project because the
    aliases are non-cheap and referenced twice)."""
    from sftp_data_ingestion_spark.operators.clean import clean_staging
    from sftp_data_ingestion_spark.schemas import STG_COLUMNS

    row = {c: "" for c in STG_COLUMNS}
    df = spark.createDataFrame(
        [tuple(row[c] for c in STG_COLUMNS)],
        ", ".join(f"{c} string" for c in STG_COLUMNS),
    )
    prev = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    spark.conf.set("spark.sql.debug.maxToStringFields", "500")
    try:
        p = (
            clean_staging(df)._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", prev)
    # 5 digit extractions (\D: chave, qtd_volumes, cod_cd, cnpj, cpf)
    # + 1 alpha strip ([^A-Za-z]: uf), each exactly once
    assert p.count(r"\D") == 5, p
    assert p.count("[^A-Za-z]") == 1, p


def test_no_collect_in_operator_modules():
    """Operators must stay distributed: no .collect()/.toPandas() in
    the hot path (driver-side collect lives only in io/stage batch
    bookkeeping and tests)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "sftp_data_ingestion_spark"
    # legitimate driver-side collects: io/stage file bookkeeping, IVF
    # coarse-centroid / PQ-codebook training + ANN probe-side query
    # sets (bounded by design), the bloom filter's one-bitmap-row-per-
    # partition OR-reduce, the partitioned upsert's touched-bucket
    # list (<= num_buckets ids), the CLI's 1-row stats aggregates for
    # its JSON report, the archive gate's 1-row content fingerprint,
    # the prefix scan's P partition totals (P = shuffle partitions,
    # driver-size by construction), and the Markov attribution's
    # transition-count matrix (<= n_states^2 rows — n_states is the
    # distinct event-type count, ~6 — collected AFTER a distributed
    # groupBy; the removal-effect solve is an O(k^3) driver loop on
    # that tiny matrix by design, see graph.py markov docstring)
    allowed = {"stage.py", "sources.py", "similarity.py", "bloom.py",
               "upsert_partitioned.py", "cli.py", "archive.py",
               "prefix.py", "graph.py"}
    offenders = []
    for f in root.rglob("*.py"):
        if f.name in allowed:
            continue
        text = f.read_text()
        if ".collect()" in text or ".toPandas()" in text:
            offenders.append(f.name)
    assert offenders == []


def test_salted_agg_two_stage_shape(spark):
    """Salted aggregation: first shuffle on (key, salt) — uniform —
    then a tiny shuffle on key; never a single hot-key reducer."""
    df = q.QUERIES["g_salted_agg_skew"](spark, SF)
    p = plan(df)
    assert "__salt" in p  # stage 1 groups on the salted key
    assert n_exchanges(p) == 2


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates the join: the
    plan has NO shuffle exchange (SURVEY §4.3's pre-partitioning
    lever; at 100 TB this is the bronze/DW layout decision)."""
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    # external paths under tmp so nothing lands in ./spark-warehouse
    (o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", str(tmp_path / "b_orders"))
      .mode("overwrite").saveAsTable("b_orders"))
    (c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", str(tmp_path / "b_customer"))
      .mode("overwrite").saveAsTable("b_customer"))
    # disable auto-broadcast: at sf0.001 customer broadcasts, which is
    # also shuffle-free but hides the bucketing effect under test
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_part = p.split("HashAggregate")[-1]  # below the final agg
    assert "SortMergeJoin" in p
    # no shuffle between the scans and the join — bucketing provides
    # the partitioning
    pre_join = p[p.index("SortMergeJoin"):]
    assert "Exchange hashpartitioning(o_custkey" not in pre_join
    assert "Exchange hashpartitioning(c_custkey" not in pre_join
    # sanity: result matches the plain join
    plain = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_sampling_split_single_shuffle_and_pruned_scan(spark):
    """Deterministic split: the hash-bucket CASE is a narrow projection
    (no shuffle before the accounting groupBy) and the scan reads only
    the two referenced columns."""
    df = q.QUERIES["x_train_val_test_split"](spark, SF)
    p = plan(df)
    assert n_exchanges(p) == 1          # only the groupBy
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_weighted_mix_broadcasts_rates(spark):
    df = q.QUERIES["x_weighted_source_mix"](spark, SF)
    p = plan(df)
    assert "BroadcastHashJoin" in p     # rates table never shuffles docs
    assert n_exchanges(p) == 1          # only the accounting groupBy


def test_ann_joins_broadcast_probe_side(spark):
    """IVF and SRP must broadcast the (small) probe table: a shuffle
    join on cell/bucket keys would funnel the whole corpus through
    k_cells (or 2^n_planes) reducer keys — a built-in skew bottleneck
    no cluster size fixes."""
    for name in ("v_ivf_ann_topk", "v_srp_ann_topk"):
        df = q.QUERIES[name](spark, SF)
        p = plan(df)
        assert "BroadcastHashJoin" in p, name
        assert "Exchange hashpartitioning(cell" not in p, name
        assert "Exchange hashpartitioning(bucket" not in p, name


def test_salted_join_broadcasts_replicated_dim(spark):
    """Salted hot-key join: the replicated dim stays a broadcast (no
    shuffle of the salted fact side for the join itself)."""
    df = q.QUERIES["j_salted_join_hot_key"](spark, SF)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "__salt" in p


def test_cosine_bruteforce_broadcasts_query_side(spark):
    """The EXPRESSION cosine engine must build the (tiny) query side
    of the cross join and STREAM the fanned-out corpus: building the
    corpus side instead streams the one-split query scan, serializing
    every pair score on a single core regardless of cluster size
    (measured 2.3s -> 16s at sf0.1 when size estimates picked the
    wrong side). Pinned on the operator directly — the registry query
    moved to the Arrow kernel in r14 (next test)."""
    from sftp_data_ingestion_spark.ext import similarity as sim
    from sftp_data_ingestion_spark.queries.registry import table

    e = table(spark, SF, "embeddings")
    df = sim.cosine_topk(e.where(F.col("vec_id") < 100), e, k=5, dim=64)
    p = plan(df)
    # queries are the LEFT side of the cross join, so the broadcast
    # hint must surface as BuildLeft on the nested-loop join
    assert "BroadcastNestedLoopJoin BuildLeft" in p


def test_cosine_bruteforce_arrow_kernel_no_corpus_shuffle(spark):
    """The graded brute-force query runs the Arrow/BLAS kernel (r13
    VERDICT #7): the corpus flows scan -> (fan_out) -> MapInPandas
    with NO join node and no corpus exchange beyond the small-input
    fan-out; the only shuffle is the k·Q-row candidate reduction into
    the final top-k window. Values are pinned identical to the
    expression engine by test_similarity.py."""
    df = q.QUERIES["v_cosine_topk_bruteforce"](spark, SF)
    p = plan(df)
    assert "MapInPandas" in p
    assert "Join" not in p  # kernel scores pairs; no join node at all
    # exactly the fan-out exchange below the kernel and the window
    # exchange above it
    assert p.count("Exchange") <= 2


def test_keyless_asof_range_partitions_time_axis(spark):
    """A keyless (global) as-of must NOT funnel the union through one
    sort partition: the plan range-partitions on the time axis and the
    output keeps >1 partition; the only single-partition window is the
    per-partition carry summary (P rows)."""
    from sftp_data_ingestion_spark.operators.temporal import asof_join
    from sftp_data_ingestion_spark.queries.registry import table

    e = table(spark, SF, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "ts")
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("ts")
        .agg(F.max("value").alias("value"))
    )
    # AQE's coalescePartitions folds the tiny fixture back to one
    # partition AFTER the parallel work (fine — that's its job on
    # small outputs); disable it here so the probe sees the operator's
    # own partitioning, as a large input would.
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = asof_join(clicks, purchases, on="ts", by=[])
        p = plan(df)
        # the sorted union is materialized through a lazy
        # localCheckpoint (pinning partition ids for the carry
        # summary), so the visible plan reads an ExistingRDD carrying
        # the partition-id column; the range exchange lives in its
        # lineage. Physical evidence of parallelism: the output keeps
        # many partitions and no partition holds all rows.
        assert "__asof_pid" in p
        assert df.rdd.getNumPartitions() > 1
        sizes = df.rdd.glom().map(len).collect()
        assert max(sizes) < sum(sizes)
    finally:
        spark.conf.set(key, prev)


def test_scd2_and_cdc_single_key_shuffle(spark):
    """SCD2's three windows and CDC's ranking all share the key
    partitioning: exactly one exchange each."""
    for name in ("wh_scd2_user_state", "wh_cdc_apply"):
        df = q.QUERIES[name](spark, SF)
        assert n_exchanges(plan(df)) == 1, name


def test_repetition_signals_single_exchange(spark):
    """The explicit doc-id repartition satisfies BOTH aggregations'
    clustered-distribution requirements (id is a subset of (id, gram)),
    so the explode -> count -> rollup pipeline moves data once."""
    df = q.QUERIES["wh_repetition_signals"](spark, SF)
    assert n_exchanges(plan(df)) == 1


def test_pit_lookup_is_equi_hash_join_not_nested_loop(spark):
    # SCD2 point-in-time lookup must plan as a HASH equi-join on the
    # key with the interval containment as residual — never a nested-
    # loop/cartesian (which a pure range predicate would produce)
    df = q.QUERIES["c_pit_state_lookup"](spark, SF)
    p = plan(df)
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_heavy_hitters_windowgrouplimit_and_partial_agg(spark):
    # exact top-k tokens per source: map-side partial count before the
    # (source, token) shuffle, and WindowGroupLimit pre-trims each
    # partition to its local top-10 before the per-source rank
    df = q.QUERIES["c_token_heavy_hitters"](spark, SF)
    p = plan(df)
    assert "WindowGroupLimit" in p
    assert p.count("HashAggregate") >= 2
    assert n_exchanges(p) == 2


def test_zscore_and_shard_manifest_single_shuffle(spark):
    # both standardization windows share the user_id partitioning ->
    # one exchange; the 16-key manifest groupBy is likewise one
    for name in ("c_value_zscore_outliers", "c_shard_manifest"):
        df = q.QUERIES[name](spark, SF)
        assert n_exchanges(plan(df)) == 1, name


def test_scd2_incremental_broadcasts_touched_keys(spark):
    # incremental SCD2 routes history via the BATCH's key set: both
    # the semi (touched) and anti (untouched pass-through) joins must
    # broadcast it, so a 100 TB history is never shuffled for routing
    df = q.QUERIES["c_scd2_incremental"](spark, SF)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "LeftAnti" in p and "LeftSemi" in p
    assert "SortMergeJoin" not in p


def test_fuzzy_join_blocked_is_equi_join_not_all_pairs(spark):
    # record-linkage blocking: the block key is the equi condition and
    # the name inequality + edit distance are residual — a hash join,
    # never the all-pairs nested-loop a bare levenshtein join plans
    df = q.QUERIES["z_fuzzy_join_blocked"](spark, SF)
    p = plan(df)
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_funnel_and_quality_gate_shuffle_budget(spark):
    # the three funnel stage windows share the user_id partitioning:
    # one data shuffle + the tiny stage histogram; the per-source
    # quality rank gate is a single exchange
    p1 = plan(q.QUERIES["z_funnel_stages"](spark, SF))
    assert n_exchanges(p1) == 2
    p2 = plan(q.QUERIES["z_quality_top_half"](spark, SF))
    assert n_exchanges(p2) == 1


def test_bm25_topk_is_take_ordered_not_global_rank(spark):
    # global top-10 must plan as TakeOrderedAndProject (per-partition
    # top-k + driver merge); the rank window runs over the 10
    # survivors only, never over every scored document
    df = q.QUERIES["z_bm25_search"](spark, SF)
    p = plan(df)
    assert "TakeOrderedAndProject" in p


def test_q3_filters_push_to_scans_and_topk_is_take_ordered(spark):
    df = q.QUERIES["z_shipping_priority_q3"](spark, SF)
    p = plan(df)
    assert "PushedFilters" in p
    assert "TakeOrderedAndProject" in p
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_rag_retrieval_scoring_stays_jvm_side(spark):
    # the docstring claims the embed+score path never leaves the JVM:
    # no Python evaluation nodes anywhere in the plan, and the top-10
    # is a TakeOrderedAndProject over the scored scan
    df = q.QUERIES["z_rag_retrieval"](spark, SF)
    p = plan(df)
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "TakeOrderedAndProject" in p


def test_logreg_score_is_map_only_codegen(spark):
    """Linear quality scoring must stay a shuffle-free, UDF-free map
    pass — the whole point of a 100 TB-rate quality gate."""
    df = q.QUERIES["z2_quality_logreg_score"](spark, SF)
    p = plan(df)
    assert n_exchanges(p) == 0
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # "*(1)" prefix = whole-stage-codegen stage 1 in executedPlan text
    assert "*(1) Project" in p


def test_cms_probe_join_broadcasts_sketch(spark):
    """The count-min probe joins the depth*width-row sketch — always
    broadcast; the probe side must never shuffle for the join."""
    df = q.QUERIES["z2_cms_heavy_hitters"](spark, SF)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_cms_topk_is_take_ordered_not_global_rank(spark):
    """The exact top-20 over the distinct-user aggregate must plan as
    TakeOrderedAndProject (per-partition 20-row heaps, driver merge) —
    never a single-partition global rank WindowExec, which at 100 TB
    funnels billions of aggregate rows through one sort task."""
    df = q.QUERIES["z2_cms_heavy_hitters"](spark, SF)
    p = plan(df)
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_ahash_pairs_join_is_banded_equi_join(spark):
    """aHash near-dup candidates come from an equi-join on
    (band_idx, band_val) — never a nested-loop all-pairs scan."""
    df = q.QUERIES["z2_image_ahash_near_dup"](spark, SF)
    p = plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "band_idx" in p and "band_val" in p


def test_strip_boilerplate_is_linear_no_pair_stage(spark):
    """The boilerplate-removal rewrite must stay linear in corpus
    tokens: chunk assembly + frequency + 1:1 join back — never a
    nested-loop or cartesian pair stage."""
    df = q.QUERIES["z3_strip_boilerplate_chunks"](spark, SF)
    p = plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_group_minhash_sketch_is_partial_aggregated(spark):
    """The group MinHash signature must reduce via partial (map-side)
    aggregation — shuffle payload <= 64 longs per group per partition.
    The tiny pair-comparison stages at the end may broadcast (group
    cardinality rows), but the corpus-sized shingle stream itself must
    never reach a join or window before being min-reduced."""
    from sftp_data_ingestion_spark.ext.dedup import group_minhash_jaccard
    from sftp_data_ingestion_spark.queries.registry import table

    d = table(spark, SF, "documents")
    df = group_minhash_jaccard(d, group_col="source")
    p = plan(df)
    assert "partial_min" in p or "partial" in p  # map-side combine ran
    assert "Window" not in p


def test_bigram_xent_build_side_has_no_window_shuffle(spark):
    """Bigrams are built from shifted array slices (per-row
    expressions), NOT a lag window — the build side must not shuffle
    the raw token stream per document."""
    df = q.QUERIES["z3_bigram_cross_entropy"](spark, SF)
    p = plan(df)
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_bucketed_join_has_no_join_exchange(spark):
    """Both sides bucketed on the join key with equal bucket counts
    -> the SortMergeJoin consumes bucket i against bucket i directly:
    ZERO shuffle exchanges in the join subtree. This is the
    amortize-one-shuffle-forever layout for repeated fact⋈fact joins;
    the write itself pays the only repartition."""
    import tempfile

    from sftp_data_ingestion_spark.operators.bucketed import bucketed_pair
    from sftp_data_ingestion_spark.queries.registry import table

    o = table(spark, SF, "orders")
    l = table(spark, SF, "lineitem")
    bo, bl = bucketed_pair(
        spark, o, l,
        "t_plans_b_orders", "t_plans_b_lineitem",
        "o_orderkey", "l_orderkey",
        num_buckets=8, base_path=tempfile.mkdtemp(),
    )
    df = bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey)
    p = plan(df)
    assert "SortMergeJoin" in p
    assert "Bucketed: true" in p
    assert n_exchanges(p) == 0


def test_dpp_injected_on_partitioned_fact_scan(spark):
    """A join between a disk-partitioned fact and a data-dependent
    (non-foldable) broadcast dim must carry a dynamicpruningexpression
    in the fact scan's PartitionFilters — the scan then opens only the
    partitions the dim admits at runtime. Without it, a 100 TB fact
    table is read in full for every selective dim filter."""
    import tempfile

    from sftp_data_ingestion_spark.queries.registry import table

    l = table(spark, SF, "lineitem").withColumn(
        "ship_month", F.month("l_shipdate")
    )
    tmp = tempfile.mkdtemp(prefix="dpp_plan_")
    l.write.partitionBy("ship_month").mode("overwrite").parquet(tmp)
    fact = spark.read.parquet(tmp)
    dim = (
        table(spark, SF, "orders")
        .where(F.col("o_custkey") == 1)
        .select(F.month("o_orderdate").alias("m"))
        .distinct()
    )
    df = fact.join(F.broadcast(dim), fact.ship_month == dim.m)
    p = plan(df)
    assert "dynamicpruningexpression" in p


def test_runtime_bloom_filter_injected_on_shuffle_join(spark):
    """Row-level runtime filtering, the in-partition complement of
    DPP: a shuffle join whose build side carries a selective filter
    gets a bloom `might_contain` probe injected into the probe side's
    scan subtree, so most non-matching fact rows die before the
    shuffle. Default thresholds target cluster-sized inputs; the test
    lowers them to fixture scale (and restores), which is exactly the
    tuning a real deployment does per table size."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from sftp_data_ingestion_spark.queries.registry import table

        o = table(spark, SF, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = table(spark, SF, "lineitem")
        df = l.join(o, l.l_orderkey == o.o_orderkey)
        p = plan(df)
        assert "might_contain" in p
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucket_pruning_on_key_equality_filter(spark):
    """Point lookups on the bucket key read ONE bucket, not the
    table: with the auto-bucketed-scan heuristic pinned off (it
    disables bucketed scans that no join needs, which also forfeits
    filter pruning), an o_orderkey = k filter shows
    SelectedBucketsCount: 1 out of 8 — an 8x scan reduction that
    scales with the bucket count on a 100 TB table."""
    import re
    import tempfile

    from sftp_data_ingestion_spark.operators.bucketed import write_bucketed
    from sftp_data_ingestion_spark.queries.registry import table

    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        o = table(spark, SF, "orders")
        write_bucketed(
            o, "t_plans_bp_orders", "o_orderkey", 8,
            tempfile.mkdtemp() + "/t",
        )
        df = spark.table("t_plans_bp_orders").where(
            F.col("o_orderkey") == 7
        )
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan(df))
        assert m and m.group(1) == "1" and m.group(2) == "8"
    finally:
        spark.conf.set(key, prev)


def test_udtf_runs_arrow_batched(spark):
    """The LATERAL UDTF must ship rows via Arrow (session factory
    pins spark.sql.execution.pythonUDTF.arrow.enabled, off by default
    in Spark 4.1) — row-pickled BatchEvalPythonUDTF is the 10-100x
    slow path the plan audit flags as python_row_udf."""
    df = q.QUERIES["z2_token_rle_udtf"](spark, SF)
    p = plan(df)
    assert "ArrowEvalPythonUDTF" in p
    assert "BatchEvalPythonUDTF" not in p


def test_semantic_contamination_buckets_above_eval_threshold(spark):
    """The SRP-LSH pre-candidate path must kick in when the eval side
    exceeds ``bucket_min_eval``: the full cross product
    (BroadcastNestedLoopJoin) is replaced by an equi-join on
    (table_idx, bucket) that both sides prune — decontamination runs
    against every training shard at 100 TB, and a leaderboard-size
    eval set is past broadcast range. Below the threshold the exact
    broadcast-NL path stays (graded-hash invariance)."""
    from sftp_data_ingestion_spark.ext import similarity as sim

    emb = f"{SF}/embeddings.parquet"
    train = spark.read.parquet(emb).where(F.col("vec_id") % 5 != 0)
    ev = spark.read.parquet(emb).where(F.col("vec_id") % 5 == 0)

    # auto-probe: eval side (hundreds of rows at sf0.001) exceeds a
    # tiny threshold -> bucketed plan, no cross product anywhere
    bucketed = sim.semantic_contamination(
        train, ev, threshold=0.9, dim=64, bucket_min_eval=10
    )
    p = plan(bucketed)
    assert "BroadcastNestedLoopJoin" not in p
    assert "table_idx" in p and "bucket" in p  # equi-join keys
    # and it is a real equi-join (hash or sort-merge), not NL
    assert "Join" in p

    # the same inputs below the threshold keep the exact NL plan
    exact = sim.semantic_contamination(
        train, ev, threshold=0.9, dim=64, bucket_min_eval=10**9
    )
    assert "BroadcastNestedLoopJoin" in plan(exact)

    # explicit approx flag composes fully lazily (no probe job) and
    # picks the same bucketed shape
    forced = sim.semantic_contamination(
        train, ev, threshold=0.9, dim=64, approx=True
    )
    assert "BroadcastNestedLoopJoin" not in plan(forced)


def test_semantic_decontaminate_broadcasts_eval_side(spark):
    """The eval side must be the broadcast build side of the scoring
    pass (benchmarks are tiny next to a training corpus); the train
    side must reach the per-doc aggregate without a pre-join shuffle,
    and all scoring stays JVM-side."""
    df = q.QUERIES["v_semantic_decontaminate"](spark, SF)
    p = plan(df)
    assert "BroadcastNestedLoopJoin" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the only shuffles sit ABOVE the sim >= threshold filter (pinned
    # below: it rides the join condition), so they carry contaminated
    # pairs only: the two-phase count(DISTINCT eval_id) agg (shared
    # contract with the SRP path) + the fixture fan_out
    assert n_exchanges(p) <= 3
    assert ">= 0.9" in p.split("Exchange", 1)[1]  # filter below agg


def test_aqe_skew_join_rewrite_fires_on_skewed_derivation(spark):
    """The 100 TB skew story has two levers and both must be REAL:
    the salted families handle skew statically (plan-pinned above in
    test_salted_agg_two_stage_shape), and AQE's runtime skew-join
    split is the dynamic fallback for skew nobody salted. This pins
    the dynamic lever: on a skewed derivation (one key owning ~90% of
    a fact side, thresholds scaled to the fixture) the executed
    adaptive plan must show the SortMergeJoin rewritten with
    skew=true — i.e. the oversized partition was actually split at
    runtime, not assumed to be (r12 VERDICT #9)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # fact: 2M rows, ~90% on key 0 -> one reducer partition far
        # beyond the (scaled-down) skew threshold; dim: 1k keys.
        # The pad must be INCOMPRESSIBLE (sha2, not a repeated char):
        # skew detection reads COMPRESSED map-output sizes, and a
        # constant pad deflates below the threshold.
        fact = spark.range(0, 2_000_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 1000 END AS k",
            "id AS v",
            "sha2(cast(id as string), 256) AS pad",
        )
        dim = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS w")
        # the post-join filter uses BOTH sides, so it cannot push below
        # the join (the fact side must stay skewed) yet shrinks the
        # collect to ~2k rows. collect(), NOT a noop write: a write
        # command runs its own QueryExecution, leaving THIS frame's
        # adaptive plan unexecuted (isFinalPlan=false, no skew marker
        # ever) — the first version of this test asserted against that
        # unexecuted plan.
        joined = (
            fact.join(dim, "k")
            .where((F.col("v") + F.col("w")) % 997 == 0)
            .select("k", "v", "w")
        )
        rows = joined.collect()
        assert len(rows) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sessionize_single_exchange_reused_by_agg(spark):
    """r14: fan_out(events, user_id) pre-spreads the session
    aggregation's partial pass; the aggregate's required distribution
    must REUSE that exchange — the plan keeps exactly one shuffle."""
    df = q.QUERIES["s_sessionize_batch"](spark, SF)
    p = plan(df)
    assert n_exchanges(p) == 1, p[:3000]
    assert "SessionWindow" in p or "session_window" in p


def test_minhash_verify_broadcasts_candidate_ids(spark):
    """r14: the verify-stage corpus prefilter must be a broadcast
    semi-join on the candidate-id set. The RDD-backed candidate pairs
    carry no size stats, so without the explicit hint the planner
    sort-merge semi-joined — shuffling the documents scan (measured:
    2 SMJ + 4 Exchange on the verify sides at sf0.1)."""
    df = q.QUERIES["d_minhash_lsh_near_dup"](spark, SF)
    p = plan(df)
    assert "SortMergeJoin" not in p, p[:3000]
    assert "BroadcastHashJoin" in p
    bucketed = q.QUERIES["d_minhash_lsh_near_dup_bucketed"](spark, SF)
    pb = plan(bucketed)
    assert "SortMergeJoin" not in pb, pb[:3000]


def test_cosine_arrow_kernel_no_corpus_shuffle(spark):
    """r14: the exact cosine top-k runs the Arrow kernel on the scan's
    NATURAL splits — no exchange may sit between the corpus scan and
    the Python kernel node (the pre-kernel fan_out paid 32 sliver
    Python batches; at scale the scan's own splits parallelize)."""
    df = q.QUERIES["v_cosine_topk_bruteforce"](spark, SF)
    p = plan(df)
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p[:2000]
    # exactly one shuffle total: the global top-k window over the
    # kernel's k-rows-per-batch output
    assert n_exchanges(p) == 1, p[:3000]
