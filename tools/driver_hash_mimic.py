#!/usr/bin/env python3
"""Mimic of the DRIVER's correctness hasher (stricter than compare_oracle.py).

The round-2 blind spot: compare_oracle.py loaded the Spark result parquet
through DuckDB, which converts decimal128 -> float64 exactly like it converts
its own oracle decimals -> float64, so decimal-rendering mismatches were
invisible. The driver instead reads the Spark parquet with pandas/pyarrow
(decimal128 -> object of decimal.Decimal, rendered 'Decimal(7.9000)') and the
oracle with duckdb .df() (decimal -> float64, rendered '7.9') and hashes the
RENDERED values -> hash_match false even when values are exact-equal.

This script reproduces that pipeline: pyarrow-read Spark output, duckdb-.df()
oracle, sort columns by name, pandas sort_values over all columns (crashes on
unhashable array/map cells exactly like the driver), then compare the
per-cell str() rendering. A query is GREEN here iff it should be green in
CORRECTNESS_r{N}.json.

Usage: driver_hash_mimic.py <sf_dir> <verify_out_dir>
"""
import hashlib
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def render_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for c in df.columns:
        for v in df[c]:
            h.update(("NULL" if v is None or (isinstance(v, float) and v != v)
                      else str(v)).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")  # driver path: pyarrow
        except Exception as e:
            print(f"ERR  {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(oracle[name]).df()  # driver path: .df()
        except Exception as e:
            print(f"ERR  {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            hg, hw = render_hash(got), render_hash(want)
        except TypeError as e:
            print(f"ERR  {name}: pandas sort crashed (driver 'err' row): {e}")
            n_fail += 1
            continue
        rows = "rows" if len(got) == len(want) else f"ROWS {len(got)}!={len(want)}"
        if hg == hw and len(got) == len(want):
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            gd = {c: str(t) for c, t in got.dtypes.items()}
            wd = {c: str(t) for c, t in want.dtypes.items()}
            diff = {c: (gd.get(c), wd.get(c)) for c in set(gd) | set(wd)
                    if gd.get(c) != wd.get(c)}
            print(f"FAIL {name}: {rows} hash {hg[:12]}!={hw[:12]} dtype-diffs={diff}")
    print(f"== {n_pass} pass / {n_fail} fail of {len(oracle)} oracle-checked")


if __name__ == "__main__":
    main()
