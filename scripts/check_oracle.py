#!/usr/bin/env python
"""Local replica of the driver's CORRECTNESS gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the same sf, then compares row count, column names, and
order-insensitive values (exact: Decimal-exact, float-bitwise,
timestamp-equal). Strictly stricter than any reasonable hash compare,
so green here should be green in CORRECTNESS_r{N}.json.

Usage: python scripts/check_oracle.py [sf_dir] [query_prefix...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from sftp_data_ingestion_spark.schemas import FIXTURE_TABLES
from sftp_data_ingestion_spark.session import get_spark


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    return (type(v).__name__, str(v))


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])

    spark = get_spark(app_name="check-oracle")

    def fresh_con():
        # One DuckDB connection per oracle: a long-lived connection
        # accumulated native state across ~65 queries and segfaulted
        # inside duckdb's .so mid-sweep (flaky, not query-specific).
        # Connections are cheap; views are just parquet bindings.
        c = duckdb.connect()
        for t in FIXTURE_TABLES:
            c.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if prefixes and not name.startswith(prefixes):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        con = None
        try:
            con = fresh_con()
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        finally:
            if con is not None:
                con.close()  # close on failure too, not just success
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            a = norm_rows(scols, [tuple(r) for r in srows])
            b = norm_rows(dcols, drows)
            if a != b:
                diff = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                )
                problems.append(
                    f"values differ; first diff at sorted idx {diff}:\n"
                    f"    spark={a[diff] if diff is not None else None}\n"
                    f"    duck ={b[diff] if diff is not None else None}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
