#!/usr/bin/env python3
"""compare_oracle.py variant for targeted iteration: only runs the oracle
SQL for queries whose Spark result parquet is PRESENT in the dump dir
(i.e. what SPARK_GRAFT_ONLY dumped), instead of all ~390. Same checks.

Usage: compare_present.py <sf_dir> <verify_out_dir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    present = [n for n in sorted(oracle) if os.path.isdir(f"{out_dir}/{n}")]
    n_pass = 0
    for name in present:
        try:
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            continue
        try:
            got = norm(duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            continue
        dtypes_g = [str(t) for t in got.dtypes]
        dtypes_w = [str(t) for t in want.dtypes]
        inorder = got.reset_index(drop=True).equals(want.reset_index(drop=True))
        dtype_only = False
        if not inorder:
            g2 = got.sort_values(list(got.columns)).reset_index(drop=True)
            w2 = want.sort_values(list(want.columns)).reset_index(drop=True)
            unordered = g2.equals(w2)
            if not unordered and dtypes_g != dtypes_w:
                # DataFrame.equals is False on ANY dtype mismatch even when
                # values coincide — coerce mismatched columns to a common
                # dtype (numeric→float64, else string) and retry, so a pure
                # dtype skew is labeled as such instead of "value mismatch"
                gc, wc = g2.copy(), w2.copy()
                for c in gc.columns:
                    if str(gc[c].dtype) != str(wc[c].dtype):
                        if pd.api.types.is_numeric_dtype(gc[c]) and \
                           pd.api.types.is_numeric_dtype(wc[c]):
                            gc[c] = gc[c].astype("float64")
                            wc[c] = wc[c].astype("float64")
                        else:
                            gc[c] = gc[c].map(lambda v: None if v is None else str(v))
                            wc[c] = wc[c].map(lambda v: None if v is None else str(v))
                dtype_only = gc.equals(wc)
        else:
            unordered = True
        # dtype-only skew is NOT a pass: the driver's schema_match would
        # flag it — but it is labeled distinctly from a value mismatch
        status = ("PASS" if inorder else
                  "PASS-unordered" if unordered else
                  "DTYPE-SKEW" if dtype_only else "FAIL")
        extra = "" if dtypes_g == dtypes_w else f" [dtypes spark={dtypes_g} duck={dtypes_w}]"
        if status.startswith("PASS"):
            n_pass += 1
            print(f"{status} {name} ({len(got)} rows){extra}")
        elif status == "DTYPE-SKEW":
            print(f"DTYPE-SKEW {name}: values match after coercion{extra}")
        else:
            print(f"FAIL {name}: value mismatch{extra}")
            merged = got.compare(want) if dtypes_g == dtypes_w else None
            if merged is not None and len(merged):
                print(merged.head(5).to_string())
    print(f"== {n_pass}/{len(present)} present queries pass")


if __name__ == "__main__":
    main()
