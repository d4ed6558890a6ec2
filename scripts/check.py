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


def widen(t):
    """Canonical type widening mirroring the driver's typed hash: all
    ints widen to BIGINT, all floats to DOUBLE. HUGEINT/DECIMAL are
    deliberately NOT widened — the driver hashes a typed serialization,
    so an oracle whose sum() silently widens to INT128 hash-fails even
    when every value matches (the e11 r6/r7 escape). Such oracles must
    cast (CAST(sum(x) AS BIGINT))."""
    t = t.upper()
    if t.startswith("LIST(") or t.endswith("[]"):
        inner = t[5:-1] if t.startswith("LIST(") else t[:-2]
        return widen(inner) + "[]"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "BIGINT"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "DOUBLE"
    return t


BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")

fail = 0
for name in sorted(oracle):
    try:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        # dtype gate FIRST: DESCRIBE both sides at the DuckDB level
        # (pandas silently bridges int64 vs object-of-int128, which is
        # how this class escaped to the driver twice — r6, r7 e11).
        ad = {r[0]: r[1] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{OUT}/{name}/*.parquet'").fetchall()}
        bd = {r[0]: r[1] for r in con.sql(
            f"DESCRIBE {oracle[name]}").fetchall()}
        banned = [(c, t) for c, t in bd.items()
                  if any(btok in t.upper() for btok in BANNED)]
        if banned:
            print(f"FAIL {name}: oracle output widens beyond BIGINT/DOUBLE "
                  f"{banned} — cast it (CAST(sum(x) AS BIGINT))")
            fail += 1; continue
        dtbad = [(c, ad[c], bd[c]) for c in sorted(set(ad) & set(bd))
                 if widen(ad[c]) != widen(bd[c])]
        if dtbad:
            print(f"FAIL {name}: dtype mismatch after widening {dtbad}")
            fail += 1; continue
        a = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        b = con.sql(oracle[name]).df()
        a = a[sorted(a.columns)]
        b = b[sorted(b.columns)]
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fail += 1; continue
        if a.shape != b.shape:
            print(f"FAIL {name}: shape {a.shape} vs {b.shape}"); fail += 1; continue
        dt = []
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
