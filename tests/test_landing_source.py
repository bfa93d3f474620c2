"""Tests for the `landing_text` Python DataSource
(io/landing_source.py): per-file executor-side encoding detection,
partition-per-file parallelism, mixed encodings in one scan."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

_seq = itertools.count()

from sftp_data_ingestion_spark.io import landing_source as ls


@pytest.fixture()
def landing_dir(tmp_path):
    (tmp_path / "utf8.csv").write_bytes(
        "id;name\n1;ação\n2;café\n".encode("utf-8")
    )
    (tmp_path / "latin1.csv").write_bytes(
        "id;name\n3;ação\n".encode("latin-1")
    )
    (tmp_path / "bom.csv").write_bytes(
        b"\xef\xbb\xbf" + "id;name\n4;plain\n".encode("utf-8")
    )
    (tmp_path / "ignored.txt").write_text("not a csv")
    (tmp_path / ".hidden.csv").write_text("partial download")
    return str(tmp_path)


def test_mixed_encodings_in_one_scan(spark, landing_dir):
    ls.register(spark)
    df = spark.read.format("landing_text").load(landing_dir)
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    # only *.csv, no hidden/partial files
    assert set(by_file) == {"utf8.csv", "latin1.csv", "bom.csv"}
    # accented text decodes correctly from BOTH encodings in ONE scan
    utf8_vals = [r["value"] for r in sorted(by_file["utf8.csv"], key=lambda r: r["line_no"])]
    assert utf8_vals == ["id;name", "1;ação", "2;café"]
    lat_vals = [r["value"] for r in sorted(by_file["latin1.csv"], key=lambda r: r["line_no"])]
    assert lat_vals == ["id;name", "3;ação"]
    # BOM is stripped, not leaked into the first header cell
    bom_vals = [r["value"] for r in sorted(by_file["bom.csv"], key=lambda r: r["line_no"])]
    assert bom_vals[0] == "id;name"


def test_one_task_per_file(spark, landing_dir):
    ls.register(spark)
    df = spark.read.format("landing_text").load(landing_dir)
    # 3 csv files -> 3 planned partitions -> 3 tasks
    assert df.rdd.getNumPartitions() == 3


def test_line_numbers_and_lineage_columns(spark, landing_dir):
    ls.register(spark)
    df = spark.read.format("landing_text").load(landing_dir)
    assert df.columns == ["path", "line_no", "value"]
    n = df.where(F.col("line_no") == 0).count()
    assert n == 3  # one header line per file


def test_missing_path_raises(spark):
    # the reader is constructed at planning time, which Spark defers
    # to the first job — so the clear error surfaces on the action
    ls.register(spark)
    with pytest.raises(Exception, match="required"):
        spark.read.format("landing_text").load().collect()


def test_streaming_landing_source_incremental_batches(spark, tmp_path):
    """The streaming flavor: offset = processed-file ledger. Drain,
    add a file, drain again — the second micro-batch must contain
    exactly the new file's lines (the reference's cron 'new files'
    contract, engine-checkpointed)."""
    land = tmp_path / "land"
    land.mkdir()
    (land / "a.csv").write_text("h\na1\n")
    (land / "b.csv").write_text("h\nb1\nb2\n")
    ckpt = str(tmp_path / "ckpt")

    ls.register(spark)
    name = f"landing_stream_{next(_seq)}"
    q = (
        spark.readStream.format("landing_text")
        .load(str(land))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.table(name).collect()
        assert sorted(r["value"] for r in first) == ["a1", "b1", "b2", "h", "h"]

        (land / "c.csv").write_text("h\nc1\n")
        q.processAllAvailable()
        both = spark.table(name).collect()
        new = sorted(
            r["value"] for r in both if r["path"].endswith("c.csv")
        )
        assert new == ["c1", "h"]
        # nothing re-delivered: totals are old 5 + new 2
        assert len(both) == 7
    finally:
        q.stop()


def test_cp1252_decode_matches_batch_reader(spark, tmp_path):
    """Windows-encoded files (smart quotes, en-dash: bytes 0x80-0x9F,
    NOT valid UTF-8) must decode IDENTICALLY through the DataSource
    and the batch read_lines path — the z2_landing_source_roundtrip
    contract on exactly the files the robust reader exists for."""
    from sftp_data_ingestion_spark.io.csv_robust import read_lines

    land = tmp_path / "land"
    land.mkdir()
    content = "id;note\n1;“quoted” – dash…\n"
    p = land / "win.csv"
    p.write_bytes(content.encode("cp1252"))

    ls.register(spark)
    via_source = [
        r["value"]
        for r in spark.read.format("landing_text")
        .load(str(land))
        .orderBy("line_no")
        .collect()
    ]
    via_batch = [
        r["value"] for r in read_lines(spark, [str(p)], "cp1252").collect()
    ]
    assert via_source == via_batch
    assert "“quoted” – dash…" in via_source[1]


def test_line_splitting_matches_spark_text_semantics(spark, tmp_path):
    """Only \\r\\n, \\r, \\n terminate records; U+2028/NEL stay
    in-field (splitlines() would cut them); a trailing newline is a
    terminator, not an empty row; interior blank lines survive."""
    land = tmp_path / "land"
    land.mkdir()
    (land / "mix.csv").write_bytes(
        "a b\n\ncr\rend\n".encode("utf-8")
    )
    ls.register(spark)
    vals = [
        r["value"]
        for r in spark.read.format("landing_text")
        .load(str(land))
        .orderBy("line_no")
        .collect()
    ]
    assert vals == ["a b", "", "cr", "end"]


def test_streaming_restart_resumes_from_offset_ledger(spark, tmp_path):
    """A NEW query on the same checkpoint must not re-deliver files
    already in the offset ledger, and must pick up files that landed
    while no query was running. (foreachBatch sink: the memory sink
    refuses checkpoint recovery by design.)"""
    land = tmp_path / "land"
    land.mkdir()
    (land / "a.csv").write_text("a1\n")
    ckpt = str(tmp_path / "ckpt")
    ls.register(spark)

    def drain():
        got = []

        def sink(batch_df, batch_id):
            got.extend(r["value"] for r in batch_df.collect())

        q = (
            spark.readStream.format("landing_text")
            .load(str(land))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return got

    assert drain() == ["a1"]
    # file lands while NO query is running; the restarted query must
    # deliver it exactly once and never re-deliver a.csv
    (land / "b.csv").write_text("b1\n")
    assert drain() == ["b1"]


# ---------------------------------------------------------------------------
# writer: two-phase-commit shard publish
# ---------------------------------------------------------------------------


def test_writer_roundtrip_manifest(spark, tmp_path):
    import os

    ls.register(spark)
    out = str(tmp_path / "out")
    vals = [f"row{i}" for i in range(20)]
    df = spark.createDataFrame([(v,) for v in vals], "value string").repartition(4)
    df.write.format("landing_text").mode("append").save(out)

    names = sorted(os.listdir(out))
    assert "_MANIFEST" in names
    parts = [n for n in names if n.startswith("part-")]
    assert parts and not [n for n in names if n.startswith("_tmp_")]
    manifest = (tmp_path / "out" / "_MANIFEST").read_text().splitlines()
    assert sorted(ln.split("\t")[0] for ln in manifest) == parts
    assert sum(int(ln.split("\t")[1]) for ln in manifest) == 20

    back = ls.read_manifested(spark, out)
    assert sorted(r["value"] for r in back.collect()) == sorted(vals)


def test_writer_append_refuses_overwrite_allows(spark, tmp_path):
    ls.register(spark)
    out = str(tmp_path / "out")
    df = spark.createDataFrame([("x",)], "value string")
    df.write.format("landing_text").mode("append").save(out)
    with pytest.raises(Exception, match="_MANIFEST"):
        df.write.format("landing_text").mode("append").save(out)
    # overwrite republishes the manifest; stale shards become invisible
    df2 = spark.createDataFrame([("y",), ("z",)], "value string").coalesce(1)
    df2.write.format("landing_text").mode("overwrite").save(out)
    back = sorted(
        r["value"] for r in ls.read_manifested(spark, out).collect()
    )
    assert back == ["y", "z"]


def test_writer_failed_job_publishes_nothing(spark, tmp_path):
    import os

    ls.register(spark)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(i,) for i in range(8)], "i long"
    ).repartition(4)

    @F.udf("string")
    def boom(i):
        if i == 5:
            raise RuntimeError("planted task failure")
        return f"v{i}"

    bad = df.select(boom(F.col("i")).alias("value"))
    with pytest.raises(Exception):
        bad.write.format("landing_text").mode("append").save(out)
    if os.path.isdir(out):
        leftovers = os.listdir(out)
        # no manifest, no published shards — only invisible _tmp_
        # orphans from the failed attempt may remain
        assert "_MANIFEST" not in leftovers
        assert not [n for n in leftovers if n.startswith("part-")]
