#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same parquet tables,
sorts columns by name, and compares values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        want = norm(con.execute(oracle[name]).fetchdf())
        status, detail = compare(got, want)
        if status:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {detail}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


def compare(got, want):
    if list(got.columns) != list(want.columns):
        return False, f"columns differ: spark={list(got.columns)} duck={list(want.columns)}"
    if len(got) != len(want):
        return False, f"row count differs: spark={len(got)} duck={len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = (pd.isna(a) & pd.isna(b)) | (a == b)
            else:
                eq = pd.Series(a).fillna("\0NULL") == pd.Series(b).fillna("\0NULL")
            if not np.all(eq):
                i = int(np.argmin(eq))
                return False, (f"col {c} differs at row {i}: "
                               f"spark={a[i]!r} duck={b[i]!r} "
                               f"(dtypes {a.dtype}/{b.dtype})")
        except Exception as e:
            if not pd.Series(a).astype(str).equals(pd.Series(b).astype(str)):
                return False, f"col {c}: compare error {e}"
    return True, ""


if __name__ == "__main__":
    main()
