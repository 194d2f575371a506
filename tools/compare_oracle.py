#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
SQL from oracle_sql.json in DuckDB over the fixture tables in <sfDir>,
sorts columns by name + rows by all columns, and compares values exactly.
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetchdf())
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = eq.idxmin()
                mismatch = (c, a[i], b[i])
                if pd.api.types.is_float_dtype(a):
                    d = (a.astype(float) - b.astype(float)).abs().max()
                    mismatch = (c, a[i], b[i], f"maxdiff={d}")
                break
        if mismatch:
            print(f"FAIL {name}: col {mismatch}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
