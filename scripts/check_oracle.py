#!/usr/bin/env python3
"""Dev harness mimicking the driver's correctness gate: compare Verify
outputs against DuckDB oracles (column-name-sorted, row-sorted, hashed).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)

n_pass = n_fail = 0
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    try:
        spark_df = pd.concat([pd.read_parquet(p) for p in
                              sorted(glob.glob(f"{path}/*.parquet"))],
                             ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}")
        n_fail += 1
        continue
    if name not in oracles:
        print(f"rows-only {name}: {len(spark_df)} rows")
        continue
    try:
        oracle_df = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        n_fail += 1
        continue
    if [str(t) for t in a.dtypes] != [str(t) for t in b.dtypes]:
        print(f"WARN {name}: dtypes {list(map(str, a.dtypes))} vs {list(map(str, b.dtypes))}")
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
        n_fail += 1
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"PASS {name}: {len(a)} rows")
        n_pass += 1
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch: {str(e)[:300]}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, "
      f"{len([d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)) and os.path.basename(d) not in oracles])} rows-only")
sys.exit(1 if n_fail else 0)
