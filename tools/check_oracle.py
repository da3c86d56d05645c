#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracles and compare STRINGIFIED values (columns sorted by
name, rows sorted) — the driver hashes printed representations, so
Decimal("1.70") vs float 1.7 MUST fail here even though the values are
numerically equal. That class of mismatch slipped through round 1 when this
script float-normalized before comparing.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(run `sbt -batch "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json, sys, glob, os, datetime, decimal, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def cell_str(v):
    """Driver-faithful stringification: the printed representation is what
    gets hashed, so Decimal keeps its trailing zeros and floats use repr."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if v is pd.NaT:
        return "NULL"
    return str(v)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].map(cell_str)
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
        if g.equals(e):
            print(f"✓ {name}: {len(g)} rows string-exact")
            n_ok += 1
        else:
            diff = (g != e)
            bad_cols = [c for c in g.columns if diff[c].any()]
            example = ""
            for c in bad_cols[:2]:
                i = diff[c].idxmax()
                example += f" [{c} row{i}: spark={g[c][i]!r} duck={e[c][i]!r}]"
            print(f"✗ {name}: STRINGS differ in {bad_cols} ({int(diff.values.sum())} cells){example}")
            n_bad += 1
    print(f"\n{n_ok} exact, {n_bad} problems")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
