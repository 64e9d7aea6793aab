#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs DuckDB.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize ints vs floats column-by-column
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output"); fail += 1; continue
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"SQLERR   {name}: {e}"); fail += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"SCHEMA   {name}: spark={list(s.columns)} duck={list(d.columns)}"); fail += 1; continue
        if len(s) != len(d):
            print(f"ROWS     {name}: spark={len(s)} duck={len(d)}"); fail += 1; continue
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
            print(f"OK       {name} ({len(s)} rows)"); ok += 1
        except AssertionError as e:
            print(f"VALUES   {name}: {str(e).splitlines()[-1]}"); fail += 1
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
