#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py [sfDir] [verifyOutDir]

Reads <out>/oracle_sql.json, runs each oracle in DuckDB against the
parquet test tables, loads the Spark result parquet, sorts columns by
name and rows by value, and reports exact-match status per query.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    try:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        a = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        b = con.sql(oracle[name]).df()
        a = a[sorted(a.columns)]
        b = b[sorted(b.columns)]
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fail += 1; continue
        if a.shape != b.shape:
            print(f"FAIL {name}: shape {a.shape} vs {b.shape}"); fail += 1; continue
        # dtype report (informational)
        dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
              if str(a[c].dtype) != str(b[c].dtype)]
        a = a.sort_values(list(a.columns), na_position="last").reset_index(drop=True)
        b = b.sort_values(list(b.columns), na_position="last").reset_index(drop=True)
        eq = True
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            else:
                ok = (av.fillna("\0NULL") == bv.fillna("\0NULL")).all() \
                    if av.dtype == object else ((av.isna() & bv.isna()) | (av == bv)).all()
            if not ok:
                bad = (~((av.isna() & bv.isna()) | (av == bv))).to_numpy().nonzero()[0][:3]
                print(f"FAIL {name}: col {c} differs at rows {bad.tolist()}")
                for i in bad[:2]:
                    print(f"   spark={a.iloc[i].to_dict()}")
                    print(f"   duck ={b.iloc[i].to_dict()}")
                eq = False
                break
        if eq:
            note = f" (dtype diff: {dt})" if dt else ""
            print(f"OK   {name}: {a.shape[0]} rows{note}")
        else:
            fail += 1
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fail += 1
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
