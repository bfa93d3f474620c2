"""WARC DataSource (`io/warc_source.py`): strict parser, gzip member
handling, one-partition-per-file planning, atomic shard publish."""

import gzip
import os

import pytest

from sftp_data_ingestion_spark.io import warc_source as ws


def _rec(i: int, payload: bytes) -> bytes:
    return ws.warc_record_bytes(
        record_id=f"<urn:uuid:{i:032x}>",
        warc_type="response",
        target_uri=f"doc://{i}",
        payload=payload,
    )


def test_parse_roundtrip_multi_record():
    raw = _rec(1, b"hello") + _rec(2, b"") + _rec(3, "café".encode())
    out = list(ws.parse_warc(raw, "t"))
    assert [(r[2], r[3]) for r in out] == [
        ("doc://1", 5),
        ("doc://2", 0),
        ("doc://3", 5),  # utf-8 octets, not chars
    ]
    assert out[2][4].decode() == "café"


def test_parse_payload_containing_crlf_and_warc_magic():
    # Content-Length framing must carry the payload VERBATIM even when
    # it contains record terminators or looks like a header
    evil = b"WARC/1.0\r\n\r\nnot a record\r\n\r\n"
    out = list(ws.parse_warc(_rec(7, evil) + _rec(8, b"x"), "t"))
    assert out[0][4] == evil and out[1][3] == 1


def test_parse_truncated_payload_raises():
    raw = _rec(1, b"hello")[:-9]  # cut into the payload
    with pytest.raises(ValueError, match="truncated payload"):
        list(ws.parse_warc(raw, "t"))


def test_parse_garbage_between_records_raises():
    raw = _rec(1, b"a") + b"GARBAGE" + _rec(2, b"b")
    with pytest.raises(ValueError, match="expected record header"):
        list(ws.parse_warc(raw, "t"))


def test_parse_missing_content_length_raises():
    raw = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
    with pytest.raises(ValueError, match="Content-Length"):
        list(ws.parse_warc(raw, "t"))


def test_gzip_members_concatenate(tmp_path):
    # per-record gzip members (the CC convention): stdlib decompress
    # walks every member
    raw = b"".join(
        gzip.compress(_rec(i, b"p%d" % i), mtime=0) for i in range(3)
    )
    assert len(list(ws.parse_warc(gzip.decompress(raw), "t"))) == 3


def test_datasource_roundtrip_and_partition_per_file(spark, tmp_path):
    out = str(tmp_path / "dump")
    df = spark.createDataFrame(
        [(i, f"text {i} é") for i in range(40)], "doc_id long, text string"
    )
    ws.write_warc_shards(df, out, n_shards=4)
    names = sorted(os.listdir(out))
    assert names == [
        "shard-0000.warc",
        "shard-0001.warc.gz",
        "shard-0002.warc",
        "shard-0003.warc.gz",
    ]  # odd shards gzip'd, no leftover temp files
    ws.register(spark)
    back = spark.read.format("warc").load(out)
    # one planner partition per archive file (no byte-range splits)
    assert back.rdd.getNumPartitions() == 4
    rows = {
        int(r.target_uri.split("//")[1]): r.payload for r in back.collect()
    }
    assert len(rows) == 40 and rows[7] == "text 7 é"


def test_writer_is_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    ws.write_warc_shards(df, a, n_shards=2)
    ws.write_warc_shards(df, b, n_shards=2)
    for name in os.listdir(a):
        with open(os.path.join(a, name), "rb") as fa, open(
            os.path.join(b, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name
