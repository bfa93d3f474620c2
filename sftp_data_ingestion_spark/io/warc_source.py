"""`warc` — a Spark 4 Python DataSource for WARC web-archive files
(ISO 28500, the Common Crawl container format).

The dominant raw input of an LLM pretraining corpus is WARC: crawl
dumps arrive as ~1 GB archive files, each a concatenation of records
(`WARC/1.0` header block + octet payload), per-record gzip members
when compressed (`.warc.gz` — the Common Crawl convention, designed
so a reader can stream members without decompressing the whole
file). This module makes those files a first-class Spark source:

    spark.dataSource.register(WarcDataSource)
    spark.read.format("warc").load("/path/to/dump")
      -> (path, record_id, warc_type, target_uri,
          content_length bigint, payload string)

Scale shape: WARC records are length-prefixed with NO sync markers,
so a file is not byte-range splittable without an external index
(Common Crawl ships cdx indexes for that) — the unit of parallelism
is the FILE, exactly how CC processing jobs schedule (one task per
archive, thousands of archives in flight). `partitions()` lists one
`InputPartition` per file; everything else — decompress, parse,
decode — runs executor-side. The driver never touches record bytes.

The writer side (`write_warc_shards`) is distributed too: one task
per shard writes its records as a standalone WARC file (gzip members
for odd shards), publish-by-rename so a crashed task can never leave
a half-written archive visible — the same two-phase discipline as
`io/sinks.py`.

Parsing is STRICT: a malformed header block, a bad Content-Length,
or a truncated payload raises with the file/offset rather than
silently skipping records — at 100 TB a silent skip is an unnoticed
data loss.
"""

from __future__ import annotations

import gzip
import io
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_SCHEMA = (
    "path string, record_id string, warc_type string, "
    "target_uri string, content_length bigint, payload string"
)

_CRLF = b"\r\n"


def warc_record_bytes(
    record_id: str,
    warc_type: str,
    target_uri: str,
    payload: bytes,
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """Serialize one WARC/1.0 record (header block, blank line,
    payload, record terminator)."""
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return head + payload + _CRLF + _CRLF


def parse_warc(raw: bytes, origin: str):
    """Yield (record_id, warc_type, target_uri, content_length,
    payload bytes) for every record in a decompressed WARC byte
    stream. Strict: raises ValueError naming ``origin`` and the
    byte offset on any malformation."""
    pos, n = 0, len(raw)
    while pos < n:
        # tolerate inter-record padding newlines (record terminators)
        while pos < n and raw[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        if not raw.startswith(b"WARC/", pos):
            raise ValueError(
                f"warc: {origin}: expected record header at byte {pos}, "
                f"found {raw[pos:pos + 16]!r}"
            )
        head_end = raw.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(
                f"warc: {origin}: unterminated header block at byte {pos}"
            )
        headers: dict[str, str] = {}
        lines = raw[pos:head_end].split(_CRLF)
        for line in lines[1:]:  # lines[0] is the WARC/1.0 version
            k, sep, v = line.decode("utf-8", "replace").partition(":")
            if not sep:
                raise ValueError(
                    f"warc: {origin}: malformed header line {line!r} "
                    f"at byte {pos}"
                )
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"warc: {origin}: missing/invalid Content-Length "
                f"at byte {pos}"
            ) from None
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError(
                f"warc: {origin}: truncated payload at byte {body_start} "
                f"(need {length}, have {n - body_start})"
            )
        yield (
            headers.get("warc-record-id", ""),
            headers.get("warc-type", ""),
            headers.get("warc-target-uri", ""),
            length,
            raw[body_start : body_start + length],
        )
        pos = body_start + length


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc: .load(path) is required")

    def partitions(self):
        # driver-side work = ONE directory listing; deterministic
        # order. Records are length-prefixed (no sync marker), so the
        # file is the parallelism unit — the CC scheduling model.
        names = sorted(
            n
            for n in os.listdir(self.path)
            if (n.endswith(".warc") or n.endswith(".warc.gz"))
            and not n.startswith(".")
            and os.path.isfile(os.path.join(self.path, n))
        )
        return [_WarcFilePartition(os.path.join(self.path, n)) for n in names]

    def read(self, partition):
        with open(partition.path, "rb") as f:
            raw = f.read()
        if partition.path.endswith(".gz"):
            # per-record gzip members (the CC convention): stdlib gzip
            # iterates concatenated members, yielding the joined stream
            raw = gzip.decompress(raw)
        for rid, rtype, uri, length, payload in parse_warc(
            raw, partition.path
        ):
            yield (
                partition.path,
                rid,
                rtype,
                uri,
                length,
                payload.decode("utf-8", "replace"),
            )


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)

    def streamReader(self, schema: StructType):
        return WarcStreamReader(self.options)


class WarcStreamReader(DataSourceStreamReader):
    """Micro-batch WARC ingestion: the offset is the processed-archive
    ledger (sorted newline-joined file set — the landing_text
    convention), checkpointed by the engine, so each arriving archive
    is parsed EXACTLY once across triggers and crash replays re-read
    the same file set. This is the continuous form of how Common
    Crawl dumps actually land: new archives appear; nothing already
    processed is touched. One planner task per NEW archive."""

    def __init__(self, options):
        self.inner = WarcReader(options)

    def _list(self) -> list[str]:
        return [p.path for p in self.inner.partitions()]

    def initialOffset(self) -> dict:
        return {"seen": ""}

    def latestOffset(self) -> dict:
        return {"seen": "\n".join(self._list())}

    def partitions(self, start: dict, end: dict):
        seen = set(filter(None, start.get("seen", "").split("\n")))
        now = filter(None, end.get("seen", "").split("\n"))
        return [_WarcFilePartition(p) for p in now if p not in seen]

    def read(self, partition):
        return self.inner.read(partition)

    def commit(self, end: dict) -> None:
        pass  # the checkpoint holds the ledger

    def stop(self) -> None:
        pass


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(WarcDataSource)


def write_warc_shards(
    df,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    name_prefix: str = "",
) -> None:
    """Export (id, text) rows as ``n_shards`` standalone WARC files —
    one executor task per shard, gzip members for odd shards
    (`shard-i.warc.gz`), plain for even. Each task writes to a
    hidden temp name and publishes by `os.rename` (atomic on POSIX),
    so a retried/zombie task can never expose a torn archive — and
    the reader's dot-file filter ignores unpublished temps. Rows
    shard by ``pmod(id, n_shards)`` and serialize in id order, so
    shard contents are deterministic run to run."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def write_partition(it):
        from pyspark import TaskContext

        # hash partitioning sends every row of one shard value to one
        # partition, but a partition may hold several shard values —
        # write one file per shard PRESENT (each shard is written by
        # exactly one task, so names never race)
        by_shard: dict[int, list] = {}
        for rid, text in it:
            by_shard.setdefault(int(rid) % n_shards, []).append((rid, text))
        pid = TaskContext.get().partitionId()
        for shard in sorted(by_shard):
            rows = sorted(by_shard[shard])
            gz = shard % 2 == 1
            name = f"{name_prefix}shard-{shard:04d}.warc" + (".gz" if gz else "")
            tmp = os.path.join(out_dir, f".{name}.tmp.{pid}.{os.getpid()}")
            buf = io.BytesIO()
            for rid, text in rows:
                rec = warc_record_bytes(
                    record_id=f"<urn:uuid:{int(rid):032x}>",
                    warc_type="response",
                    target_uri=f"doc://{int(rid)}",
                    payload=text.encode("utf-8"),
                )
                buf.write(gzip.compress(rec, mtime=0) if gz else rec)
            with open(tmp, "wb") as f:
                f.write(buf.getvalue())
            os.rename(tmp, os.path.join(out_dir, name))
        return iter(())

    (
        df.select(
            F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("t")
        )
        .repartition(n_shards, F.pmod(F.col("id"), F.lit(n_shards)))
        .rdd.map(lambda r: (r["id"], r["t"]))
        .mapPartitions(write_partition)
        .count()
    )
