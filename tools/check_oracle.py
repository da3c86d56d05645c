#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracles and compare values (columns sorted by name,
rows sorted), so oracle drift is caught before the round ends.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(run `sbt -batch "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize decimals/floats to plain floats rounded for stable compare
    for c in df.columns:
        if str(df[c].dtype) == "object":
            try:
                import decimal
                if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                    df[c] = df[c].astype(float)
            except Exception:
                pass
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        exp = con.sql(oracle[name]).df()
        g, e = canon(got.copy()), canon(exp.copy())
        if list(g.columns) != list(e.columns):
            print(f"✗ {name}: COLUMNS differ: spark={list(g.columns)} duck={list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"✗ {name}: ROWCOUNT differ: spark={len(g)} duck={len(e)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"✓ {name}: {len(g)} rows exact")
            n_ok += 1
        except AssertionError:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, rtol=0, atol=1e-12)
                print(f"~ {name}: {len(g)} rows equal within 1e-12 (NOT exact — driver hash may fail!)")
                n_bad += 1
            except AssertionError as e2:
                print(f"✗ {name}: VALUES differ:\n{str(e2)[:500]}")
                n_bad += 1
    print(f"\n{n_ok} exact, {n_bad} problems")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
