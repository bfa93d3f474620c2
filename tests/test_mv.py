"""Incremental materialized-view maintenance: algebraic state merge
equivalence with full recompute, including NULL edge cases."""

import pytest
from pyspark.sql import functions as F

from sftp_data_ingestion_spark.operators.mv import (
    aggregate_batch,
    merge_mv_state,
)

SPECS = {
    "s": ("sum", "x"),
    "n": ("count", "x"),
    "lo": ("min", "x"),
    "hi": ("max", "x"),
}


def _rows(df):
    return sorted(
        (r["k"], r["s"], r["n"], r["lo"], r["hi"]) for r in df.collect()
    )


def test_merge_equals_full_recompute_with_nulls(spark):
    hist = spark.createDataFrame(
        [
            ("a", 1.0), ("a", 2.0),
            ("b", None),            # all-NULL group in history
            ("c", 5.0),             # untouched by batch
        ],
        "k string, x double",
    )
    batch = spark.createDataFrame(
        [
            ("a", 4.0),             # existing group grows
            ("b", 7.0),             # NULL-state group gets real values
            ("d", None),            # NEW group arriving all-NULL
            ("e", 9.0),             # brand-new group
        ],
        "k string, x double",
    )
    merged = merge_mv_state(
        aggregate_batch(hist, ["k"], SPECS),
        aggregate_batch(batch, ["k"], SPECS),
        ["k"],
        SPECS,
    )
    full = aggregate_batch(hist.unionByName(batch), ["k"], SPECS)
    assert _rows(merged) == _rows(full)
    got = {r["k"]: r for r in merged.collect()}
    # SQL semantics preserved: SUM over no non-NULL values is NULL,
    # COUNT is 0; a NULL-state group merged with real values adds as
    # if the NULL state were absent, not as if it were 0
    assert got["d"]["s"] is None and got["d"]["n"] == 0
    assert got["b"]["s"] == 7.0 and got["b"]["n"] == 1


def test_repeated_batches_associative(spark):
    base = spark.createDataFrame(
        [("a", float(i)) for i in range(10)], "k string, x double"
    )
    b1 = spark.createDataFrame([("a", 100.0), ("b", 1.0)], "k string, x double")
    b2 = spark.createDataFrame([("b", 2.0), ("c", 3.0)], "k string, x double")
    state = aggregate_batch(base, ["k"], SPECS)
    for b in (b1, b2):
        state = merge_mv_state(
            state, aggregate_batch(b, ["k"], SPECS), ["k"], SPECS
        )
    full = aggregate_batch(
        base.unionByName(b1).unionByName(b2), ["k"], SPECS
    )
    assert _rows(state) == _rows(full)


def test_non_algebraic_spec_rejected(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, x double")
    with pytest.raises(ValueError, match="non-algebraic"):
        aggregate_batch(df, ["k"], {"m": ("median", "x")})


def test_apply_cdc_retraction_and_group_disappearance(spark):
    from sftp_data_ingestion_spark.operators.mv import apply_cdc

    state = spark.createDataFrame(
        [("a", 10.0, 2), ("b", 5.0, 1)], "k string, total double, n long"
    )
    changes = spark.createDataFrame(
        [
            ("a", "U", 7.0, 3.0),   # 3 -> 7: delta +4, count unchanged
            ("b", "D", None, 5.0),  # delete b's only row -> group gone
            ("c", "I", 2.0, None),  # brand-new group
        ],
        "k string, op string, value double, prev_value double",
    )
    got = {
        r["k"]: (r["total"], r["n"])
        for r in apply_cdc(state, changes, ["k"], "value").collect()
    }
    assert got == {"a": (14.0, 2), "c": (2.0, 1)}  # b dropped entirely


def test_stream_mv_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Engine-restart semantics: a SECOND streaming query on the same
    checkpoint must not double-add already-merged batches, and a file
    arriving after the restart merges incrementally. This is the
    end-to-end form of the batch-id replay guard unit tests."""
    from sftp_data_ingestion_spark import streaming as st

    land = str(tmp_path / "land")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], ["k", "v"]
    ).coalesce(1).write.mode("append").parquet(land)
    spark.createDataFrame([(1, 5.0)], ["k", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(land).schema

    def run_drain():
        q = st.stream_mv_merge(
            spark,
            land,
            state,
            ckpt,
            keys=["k"],
            specs={"n": ("count", "k"), "total": ("sum", "v")},
            schema=schema,
            max_files_per_trigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_drain()
    first = {
        r["k"]: (r["n"], r["total"])
        for r in spark.read.parquet(state).collect()
    }
    assert first == {1: (2, 15.0), 2: (1, 20.0)}

    # restart with NO new data: state must be byte-stable (no replay
    # double-add)
    run_drain()
    again = {
        r["k"]: (r["n"], r["total"])
        for r in spark.read.parquet(state).collect()
    }
    assert again == first

    # a file landing after the restart merges incrementally
    spark.createDataFrame(
        [(2, 2.0), (3, 3.0)], ["k", "v"]
    ).coalesce(1).write.mode("append").parquet(land)
    run_drain()
    final = {
        r["k"]: (r["n"], r["total"])
        for r in spark.read.parquet(state).collect()
    }
    assert final == {1: (2, 15.0), 2: (2, 22.0), 3: (1, 3.0)}
