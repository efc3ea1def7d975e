#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare (sorted columns, sorted rows,
exact values) with the parquet that graft.Verify dumped.

Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison (int32 vs int64 etc.)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                else (tuple(v) if isinstance(v, (list, tuple)) else v))
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        files = glob.glob(spark_glob)
        if not files:
            print(f"FAIL {name}: no spark output");  n_bad += 1;  continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_bad += 1;  continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} vs oracle {want.shape}")
            n_bad += 1;  continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1;  continue
        # exact compare after canonicalization; floats must match bit-wise
        # (queries round at safe boundaries specifically to allow this)
        eq = got.equals(want)
        if not eq:
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
            idx = bad.idxmax()
            print("  spark :", got.loc[idx].to_dict())
            print("  oracle:", want.loc[idx].to_dict())
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)");  n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
