#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <outDir> [sfDir] [--json <path>]

Reads each <outDir>/<name>/ parquet written by graft.Verify plus
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB over the same
testdata parquet tables, sorts columns by name and rows by value, and
compares exactly.

With --json <path>, additionally writes the per-query verdicts in the
driver's CORRECTNESS shape — {"<query>": {"rows_match": bool,
"schema_match": bool, "hash_match": bool, "err": null|str}} — so the
repo can self-publish CORRECTNESS_SELF.json each round even when the
driver-side collection drops its own artifact.
"""
import argparse, hashlib, json, sys, glob, os
import duckdb
import pandas as pd

ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("outdir", nargs="?", default="/tmp/verify_out",
                help="directory of per-query parquet dumps from graft.Verify")
ap.add_argument("sfdir", nargs="?", default="/root/testdata/sf0.01",
                help="testdata scale-factor directory for the oracle views")
ap.add_argument("--json", dest="json_path", default=None,
                help="also write per-query verdicts in the driver's "
                     "CORRECTNESS shape to this path")
ns = ap.parse_args()
outdir, sfdir, json_path = ns.outdir, ns.sfdir, ns.json_path

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

def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.astype(str).to_csv(index=False).encode()).hexdigest()

verdicts = {}
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
        verdicts[name] = {"rows_match": len(spark_df) > 0,
                          "schema_match": None, "hash_match": None,
                          "err": "rows-only (no oracle)"}
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        n_fail += 1
        print(f"[FAIL ] {name}: oracle SQL error: {e}")
        verdicts[name] = {"rows_match": False, "schema_match": False,
                          "hash_match": False,
                          "err": f"oracle SQL error: {e}"}
        continue
    s, o = canon(spark_df), canon(duck_df)
    rows_match = len(s) == len(o)
    cols_match = list(s.columns) == list(o.columns)
    if not cols_match:
        n_fail += 1
        print(f"[FAIL ] {name}: columns spark={list(s.columns)} duck={list(o.columns)}")
        verdicts[name] = {"rows_match": rows_match, "schema_match": False,
                          "hash_match": False, "err": "column mismatch"}
        continue
    if not rows_match:
        n_fail += 1
        print(f"[FAIL ] {name}: rows spark={len(s)} duck={len(o)}")
        verdicts[name] = {"rows_match": False, "schema_match": True,
                          "hash_match": False, "err": "row count mismatch"}
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
        verdicts[name] = {"rows_match": True, "schema_match": not dt,
                          "hash_match": False,
                          "err": f"col {c} row {i}: spark={av!r} duck={bv!r}"}
    elif dt:
        n_fail += 1
        print(f"[FAIL ] {name}: dtype mismatch {dt}")
        verdicts[name] = {"rows_match": True, "schema_match": False,
                          "hash_match": value_hash(s) == value_hash(o),
                          "err": f"dtype mismatch {dt}"}
    else:
        n_pass += 1
        assert value_hash(s) == value_hash(o)  # exact compare implies it
        print(f"[ok   ] {name}: {len(s)} rows x {len(s.columns)} cols exact")
        verdicts[name] = {"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None}

if json_path:
    with open(json_path, "w") as f:
        json.dump(verdicts, f, indent=1, sort_keys=True)
    print(f"wrote {len(verdicts)} verdicts to {json_path}")

print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
sys.exit(1 if n_fail else 0)
