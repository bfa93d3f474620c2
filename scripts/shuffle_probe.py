#!/usr/bin/env python
"""Shuffle-VOLUME probe: per-query shuffle read/write BYTES.

Wall-clock probes (bench.py, scale_probe.py) measure this host; BYTES
measure the algorithm. At 100 TB the cluster bill is dominated by how
many bytes cross the shuffle fabric, and a query whose shuffle bytes
grow slower than its input is the one that survives the scale-up —
that is a property of the PLAN, independent of host noise, JIT state,
or calibration. This probe records it per query:

1. a dedicated SparkSession writes the (public, stable) JSON event
   log to a temp dir;
2. each probed query runs serially under its own job group; the
   pyspark ``statusTracker`` maps the group's jobs -> stage ids
   (streaming queries are excluded: their micro-batch jobs run on a
   separate thread outside the job group);
3. after ``spark.stop()`` flushes the log, the SparkListenerTaskEnd
   events are summed per stage: shuffle bytes written, shuffle bytes
   read (local + remote), input bytes read.

Output: one JSON line
  {query: {input_b, shuffle_write_b, shuffle_read_b}}
Run with SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf100x to get the 100x
points; the honest scale statement is the RATIO of shuffle-byte
growth to input-byte growth (<= 1 means the plan's shuffle is at most
proportional to data — the survival property).

Note on the bucketed twins: their in-query table ORGANIZE (the
bucketBy write) is counted here too, so the bytes show the one-time
amortized cost alongside the join's zero exchanges — the point is the
SPLIT, stated by the stage structure, not a smaller total on a single
run.

Usage: python scripts/shuffle_probe.py [name-prefix ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sftp_data_ingestion_spark import queries as q  # noqa: E402
from sftp_data_ingestion_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PROBES = [
    # reference-surface pipeline
    "pedidos_pipeline_flagship",
    "u1_upsert_newer_wins",
    "u1_upsert_bucketed",          # organize cost vs exchange-free merge
    "w1_latest_event_per_user",
    # relational core
    "g_q1_pricing_summary",
    "j_revenue_by_nation",
    "z3_bucketed_colocated_join",  # zero join exchanges after organize
    # dedup / text
    "d_exact_dedup_survivors",
    "d_minhash_lsh_near_dup",
    "d_minhash_lsh_near_dup_bucketed",  # band shuffle vs bucketed layout
    "d_paragraph_dedup",
    "d_bloom_paragraph_batch",     # bitmap prune: verify side ~ hits
    "z2_unigram_cross_entropy",
    "z3_kneser_ney_xent",
    "t_k_anonymity_suppress",      # broadcast counts: near-zero shuffle
    "t_html_extract_text",         # map-only: zero shuffle expected
    "x_doremi_domain_weights",
    # vectors + composition
    "v_cosine_topk_bruteforce",
    "curation_e2e",
]


def main() -> None:
    prefixes = tuple(sys.argv[1:])
    probes = (
        [n for n in PROBES if n.startswith(prefixes)] if prefixes else PROBES
    )
    log_dir = tempfile.mkdtemp(prefix="shuffle_probe_evt_")
    spark = get_spark(
        app_name="shuffle-probe",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # single plain-JSON file (no rolling dir, no codec suffix)
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    stage_map: dict[str, set[int]] = {}
    for name in probes:
        sc.setJobGroup(name, name, False)
        q.QUERIES[name](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        sids: set[int] = set()
        for jid in sc.statusTracker().getJobIdsForGroup(name):
            info = sc.statusTracker().getJobInfo(jid)
            if info is not None:
                sids.update(info.stageIds)
        stage_map[name] = sids
        print(f"# {name}: {len(sids)} stages", file=sys.stderr)
    spark.stop()  # flush the event log

    per_stage: dict[int, list[int]] = {}
    logs = []
    for p in glob.glob(os.path.join(log_dir, "*")):
        if app_id not in p:
            continue
        if os.path.isdir(p):  # Spark 4 eventlog_v2 rolling dir
            logs.extend(
                f
                for f in glob.glob(os.path.join(p, "*"))
                if os.path.getsize(f) > 0
            )
        else:
            logs.append(p)
    for path in logs:
        with open(path, encoding="utf-8") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                tm = ev.get("Task Metrics") or {}
                wm = tm.get("Shuffle Write Metrics") or {}
                rm = tm.get("Shuffle Read Metrics") or {}
                im = tm.get("Input Metrics") or {}
                agg = per_stage.setdefault(ev["Stage ID"], [0, 0, 0, 0, 0])
                agg[0] += im.get("Bytes Read", 0)
                agg[1] += wm.get("Shuffle Bytes Written", 0)
                agg[2] += rm.get("Local Bytes Read", 0) + rm.get(
                    "Remote Bytes Read", 0
                )
                # spill: the "would this partition fit in executor
                # memory" signal — nonzero spill at a probe scale is
                # an early warning for the 1000-executor regime
                agg[3] += tm.get("Memory Bytes Spilled", 0)
                agg[4] += tm.get("Disk Bytes Spilled", 0)
    results = {}
    for name, sids in stage_map.items():
        tot = [0, 0, 0, 0, 0]
        for s in sids:
            for i, v in enumerate(per_stage.get(s, [0, 0, 0, 0, 0])):
                tot[i] += v
        results[name] = {
            "input_b": tot[0],
            "shuffle_write_b": tot[1],
            "shuffle_read_b": tot[2],
            "spill_mem_b": tot[3],
            "spill_disk_b": tot[4],
        }
    print(json.dumps({"sf_dir": SF, "results": results}))


if __name__ == "__main__":
    main()
