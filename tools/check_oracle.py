#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify.scala's
parquet dumps, run each oracle_sql.json entry in DuckDB over the same
testdata tables, sort columns by name + rows by value, and compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for qname in sorted(oracle):
    spark_path = os.path.join(out_dir, qname)
    files = glob.glob(os.path.join(spark_path, "*.parquet"))
    if not files:
        print(f"FAIL {qname}: no spark output")
        fails += 1
        continue
    sdf = canon(pd.concat([pd.read_parquet(f) for f in files]))
    try:
        ddf = canon(con.execute(oracle[qname]).df())
    except Exception as e:
        print(f"FAIL {qname}: oracle error: {e}")
        fails += 1
        continue
    if list(sdf.columns) != list(ddf.columns):
        print(f"FAIL {qname}: columns {list(sdf.columns)} vs {list(ddf.columns)}")
        fails += 1
        continue
    if len(sdf) != len(ddf):
        print(f"FAIL {qname}: rows {len(sdf)} vs {len(ddf)}")
        fails += 1
        continue
    # The driver hashes stringified values, so an int64 5 vs a float64 5.0
    # (e.g. DuckDB HUGEINT sum -> pandas float64) is a REAL mismatch even
    # though Python == forgives it. Flag dtype-kind drift loudly.
    mism = None
    kind_fail = None
    for c in sdf.columns:
        ka, kb = sdf[c].dtype.kind, ddf[c].dtype.kind
        if {ka, kb} <= {"i", "u"}:
            continue  # int width differences hash the same
        if ka != kb:
            kind_fail = (c, sdf[c].dtype, ddf[c].dtype)
            break
    if kind_fail:
        c, da, db = kind_fail
        print(f"FAIL {qname}: col {c} dtype kind spark={da} duckdb={db}"
              f" (driver hash would differ — cast to BIGINT/DOUBLE on both sides)")
        fails += 1
        continue
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        eq = a.reset_index(drop=True).astype(object).where(pd.notnull(a.reset_index(drop=True)), None) \
             .combine(b.reset_index(drop=True).astype(object).where(pd.notnull(b.reset_index(drop=True)), None),
                      lambda x, y: x == y)
        if not eq.all():
            idx = eq[~eq].index[0]
            mism = (c, idx, a.iloc[idx], b.iloc[idx])
            break
    if mism:
        c, i, av, dv = mism
        print(f"FAIL {qname}: col {c} row {i}: spark={av!r} duckdb={dv!r}")
        fails += 1
    else:
        print(f"PASS {qname} ({len(sdf)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
