#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <outDir> [sfDir]

Reads each <outDir>/<name>/ parquet written by graft.Verify plus
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB over the same
testdata parquet tables, sorts columns by name and rows by value, and
compares exactly. Not shipped — developer feedback loop only.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

n_pass = n_fail = n_weak = 0
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
        ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        n_weak += 1
        print(f"[weak ] {name}: rows={len(spark_df)} (no oracle, rows-only)")
        if len(spark_df) == 0:
            print(f"        WARNING: zero rows")
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        n_fail += 1
        print(f"[FAIL ] {name}: oracle SQL error: {e}")
        continue
    s, o = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(o.columns):
        n_fail += 1
        print(f"[FAIL ] {name}: columns spark={list(s.columns)} duck={list(o.columns)}")
        continue
    if len(s) != len(o):
        n_fail += 1
        print(f"[FAIL ] {name}: rows spark={len(s)} duck={len(o)}")
        continue
    # exact compare; report first mismatching cell
    mismatch = None
    for c in s.columns:
        a, b = s[c], o[c]
        try:
            eq = (a.isna() & b.isna()) | (a == b)
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = (c, i, a.iloc[i], b.iloc[i])
            break
    # dtype check (schema parity)
    dt = [(c, str(s[c].dtype), str(o[c].dtype)) for c in s.columns
          if str(s[c].dtype) != str(o[c].dtype)]
    if mismatch:
        c, i, av, bv = mismatch
        n_fail += 1
        print(f"[FAIL ] {name}: col {c} row {i}: spark={av!r} duck={bv!r}")
    elif dt:
        n_fail += 1
        print(f"[FAIL ] {name}: dtype mismatch {dt}")
    else:
        n_pass += 1
        print(f"[ok   ] {name}: {len(s)} rows x {len(s.columns)} cols exact")

print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
sys.exit(1 if n_fail else 0)
