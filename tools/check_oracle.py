#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run `graft.Verify` first
(writes <out>/<name>/ parquet + <out>/oracle_sql.json), then this script runs
each oracle SQL in DuckDB over the same testdata parquet and compares values
(columns sorted by name, rows sorted, exact compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            expected = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        actual = pd.read_parquet(f"{out_dir}/{name}")
        a, e = norm(actual), norm(expected)
        if list(a.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(a.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(a) != len(e):
            print(f"FAIL {name}: rows {len(a)} != {len(e)}")
            n_fail += 1
            continue
        # exact value compare via stringification (what a hash would see)
        mism = []
        for c in a.columns:
            av, ev = a[c].astype(str).values, e[c].astype(str).values
            bad = [(i, av[i], ev[i]) for i in range(len(av)) if av[i] != ev[i]]
            if bad:
                mism.append((c, bad[:3], len(bad)))
        if mism:
            print(f"FAIL {name}: {len(mism)} mismatching cols")
            for c, ex, cnt in mism[:4]:
                print(f"    col {c}: {cnt} diffs, e.g. {ex}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
