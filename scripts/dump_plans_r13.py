#!/usr/bin/env python
"""Dump `explain("formatted")` of named queries from an arbitrary
checked-out tree into plans/r13/<query>_<suffix>.txt — the
optimization round's before/after plan evidence.

"Before" plans come from a git worktree of the previous round's final
commit; "after" plans from the current tree. Run each in its own
process (fresh JVM, the tree's own registry):

    python scripts/dump_plans_r13.py <tree> <sf_dir> <outdir> <suffix> [query ...]

Queries missing from a tree's registry (added later) are skipped with
a note, so one query list serves both trees.
"""

from __future__ import annotations

import importlib.util
import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2]
    outdir = os.path.abspath(sys.argv[3])
    suffix = sys.argv[4]
    names = sys.argv[5:]
    os.chdir(tree)
    sys.path.insert(0, tree)
    spec = importlib.util.spec_from_file_location(
        "tree_bench", os.path.join(tree, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from sftp_data_ingestion_spark.session import get_spark

    spark = get_spark(app_name="dump-plans-r13")
    os.makedirs(outdir, exist_ok=True)
    if not names:
        names = list(mod.HEADLINE)
    for name in names:
        fn = mod.q.QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not in this tree's registry")
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # record instead of aborting the batch
            plan = f"EXPLAIN FAILED: {e}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — {suffix} (tree: {tree}, sf: {sf_dir})\n\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
