#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <outDir> <sfDir>

For each query dir under outDir: read the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB (tables = parquet views over
sfDir), sort columns by name, sort rows, compare values exactly.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: a dir of part files
            p = f"{p}/*.parquet"
        if os.path.isdir(f"{sf_dir}/{t}.parquet") or os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"MISS  {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracle:
            print(f"SKIP  {name}: rows-only ({len(got)} rows)")
            continue
        exp = con.execute(oracle[name]).df()
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if len(gs) != len(es):
            print(f"FAIL  {name}: {len(gs)} rows vs {len(es)}")
            n_fail += 1
            continue
        # The driver hashes stringified values, so an int64-vs-float64
        # divergence (e.g. DuckDB HUGEINT -> float64 "1.0" vs Spark "1")
        # fails its hash even when values are numerically equal. Mirror
        # that here by requiring matching dtype *kinds* per column.
        kind_bad = [c for c in gs.columns
                    if gs[c].dtype.kind != es[c].dtype.kind
                    and {gs[c].dtype.kind, es[c].dtype.kind} != {"M"}]
        if kind_bad:
            print(f"FAIL  {name}: dtype-kind mismatch on {kind_bad}: "
                  f"{[(str(gs[c].dtype), str(es[c].dtype)) for c in kind_bad]}")
            n_fail += 1
            continue
        try:
            import pandas as pd
            pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
            print(f"PASS  {name} ({len(gs)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL  {name}: {str(e)[:400]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
