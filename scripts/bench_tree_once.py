#!/usr/bin/env python
"""Run ONE warm bench pass of an arbitrary checked-out tree.

Helper for bench.py's parity_vs_prev: given a tree path (a git
worktree of the previous round's final commit) and an sf dir, import
THAT tree's bench module + query registry in a fresh process/JVM, run
one untimed warm pass (fresh-JVM codegen/JIT would otherwise bias the
old tree slower) and two timed passes, and print one JSON line
{query: best_seconds}. The calling bench interleaves these
invocations with its own passes and takes per-query mins on each
side.

Run: python scripts/bench_tree_once.py /path/to/tree /root/testdata/sf0.1
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time


def main() -> None:
    tree, sf_dir = os.path.abspath(sys.argv[1]), sys.argv[2]
    os.chdir(tree)  # relative paths (spark-warehouse, derby logs) stay inside
    sys.path.insert(0, tree)
    spec = importlib.util.spec_from_file_location(
        "tree_bench", os.path.join(tree, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # imports the TREE's registry via sys.path

    from sftp_data_ingestion_spark.session import get_spark

    spark = get_spark(app_name="bench-tree-once")

    def one_pass(timed: bool) -> dict[str, float]:
        out = {}
        for name in mod.HEADLINE:
            t0 = time.time()
            mod.q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = time.time() - t0
        return out

    one_pass(timed=False)  # warm: codegen + parquet footers at this SF
    a, b = one_pass(timed=True), one_pass(timed=True)
    print(json.dumps({k: round(min(a[k], b[k]), 3) for k in a}))


if __name__ == "__main__":
    main()
