#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
SQL from oracle_sql.json in DuckDB over the fixture tables in <sfDir>,
sorts columns by name + rows by all columns, and compares values exactly.

Beyond the value compare, this emits a CANONICAL ROW HASH per side whose
cell rendering is pandas-DTYPE-SENSITIVE (int64 renders "1", float64
renders "1.0", object renders str(v)). That is deliberately stricter than
the numeric compare: the class of bug that burned rounds 3 and 4
(q63_try_fns, dedup_apply_spans) was DuckDB surfacing HUGEINT/DOUBLE where
Spark surfaced BIGINT — numerically equal, so the old tool passed, but the
driver's hash (computed over the surfaced representation) failed. Any
dtype divergence between the two frames now fails the query here with a
HASH verdict, before the driver ever sees it. Run this (after
`runMain graft.Verify`) before recording a round's CORRECTNESS.
"""
import sys, os, json, hashlib
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def render_rows(df: pd.DataFrame) -> list:
    """Tab-joined dtype-sensitive cell rendering, one string per row.

    COLUMN-wise iteration on purpose: df.iterrows()/apply(axis=1) build
    per-row Series that upcast mixed-dtype rows (an int64 column in a
    frame that also has a float column surfaces as float — rendering
    "1.0" and silently erasing exactly the int-vs-float divergence this
    tool exists to catch). Iterating each df[c] Series keeps every
    cell's own dtype."""
    if not len(df):
        return []
    if not len(df.columns):
        # zip(*[]) would render zero rows for a zero-column frame that
        # HAS rows — hashing only the header and breaking canon's
        # index-aligned Series construction
        return [""] * len(df)
    cols = [[_cell(v, df.dtypes[c]) for v in df[c]] for c in df.columns]
    return ["\t".join(cells) for cells in zip(*cols)]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # sort by stringified cells, not raw values: raw mixed/object columns
    # (lists, None) raise on comparison, and the hash below is rendered
    # anyway — ordering just has to be deterministic and identical for
    # two frames with identical rendered content
    if len(df):
        key = pd.Series(render_rows(df), index=df.index)
        df = df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df

def _cell(v, dtype) -> str:
    """Dtype-sensitive canonical rendering — int64 "1" vs float64 "1.0"
    MUST differ, because that is how a HUGEINT/DOUBLE oracle surfacing
    diverges from Spark's BIGINT in the driver's hash."""
    if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NaT:
        return "\\N"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(_cell(x, None) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))          # shortest round-trip: 1.0 -> '1.0'
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    try:
        if pd.isna(v):
            return "\\N"
    except (TypeError, ValueError):
        pass
    # escape the join/row separators (and the escape char itself) so a
    # string cell containing a tab or newline cannot collide with the
    # rendering of a different row/cell split; the null marker "\N"
    # stays unambiguous because a LITERAL "\N" cell renders "\\N"
    return (str(v).replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))

def _dtype_class(dt) -> str:
    """Width-insensitive class: int32 vs int64 is a driver-tolerated
    difference (both render "1"); int vs float is the driver-failing
    one ("1" vs "1.0")."""
    if pd.api.types.is_bool_dtype(dt): return "bool"
    if pd.api.types.is_integer_dtype(dt): return "int"
    if pd.api.types.is_float_dtype(dt): return "float"
    if pd.api.types.is_datetime64_any_dtype(dt): return "ts"
    return "obj"

def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(("|".join(f"{c}:{_dtype_class(df.dtypes[c])}"
                       for c in df.columns)).encode())
    for row in render_rows(df):
        h.update((row + "\n").encode())
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    hashes = {}
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
        if len(got) == 0:
            # matching-but-empty is trivially hash-green; a join-back
            # oracle (which reads the engine's own output) can never
            # catch an engine that emitted nothing — surface it
            print(f"WARN {name}: both sides 0 rows — vacuous pass")
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
            print(f"FAIL {name}: col {mismatch}"); n_fail += 1; continue
        hg, he = frame_hash(got), frame_hash(exp)
        hashes[name] = {"spark": hg, "oracle": he}
        if hg != he:
            # values compared equal but the surfaced representation did
            # not — the exact class the driver's hash_match catches
            dt = [(c, str(got.dtypes[c]), str(exp.dtypes[c]))
                  for c in got.columns if got.dtypes[c] != exp.dtypes[c]]
            print(f"FAIL {name}: HASH (dtype divergence {dt or 'in rendering'})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    with open(f"{out_dir}/row_hashes.json", "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
