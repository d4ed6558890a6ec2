#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py [sfDir] [verifyOutDir] [jsonOut]

Reads <out>/oracle_sql.json, runs each oracle in DuckDB against the
parquet test tables, loads the Spark result parquet, sorts columns by
name and rows by value, and reports exact-match status per query.
With a third arg, also writes a per-query JSON artifact (for
round-artifact publication, e.g. CORRECTNESS_sf1_r*.json).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
JSON_OUT = sys.argv[3] if len(sys.argv) > 3 else None
report = {}

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
    if t.startswith("STRUCT(") and t.endswith(")"):
        # recurse into field types so struct outputs with differing
        # inner int widths (INT vs BIGINT) still compare equal; fields
        # split on top-level commas only
        inner, fields, depth, start = t[7:-1], [], 0, 0
        for i, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                fields.append(inner[start:i]); start = i + 1
        fields.append(inner[start:])
        out = []
        for f in fields:
            f = f.strip()
            name, _, ftype = f.partition(" ")
            out.append(f"{name} {widen(ftype)}")
        return "STRUCT(" + ", ".join(out) + ")"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "BIGINT"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "DOUBLE"
    return t


BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")

fail = 0


def p_fail(name, detail):
    global fail
    print(f"FAIL {name}: {detail}")
    report[name] = {"match": False, "detail": detail}
    fail += 1


def p_ok(name, rows):
    print(f"OK   {name}: {rows} rows")
    report[name] = {"match": True, "rows": rows}


for name in sorted(oracle):
    try:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            p_fail(name, "no spark output"); continue
        # dtype gate FIRST: DESCRIBE both sides at the DuckDB level
        # (pandas silently bridges int64 vs object-of-int128, which is
        # how this class escaped to the driver twice — r6, r7 e11).
        ad = {r[0]: r[1] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{OUT}/{name}/*.parquet'").fetchall()}
        bd = {r[0]: r[1] for r in con.sql(
            f"DESCRIBE {oracle[name]}").fetchall()}
        # scan BOTH sides: a Spark output that itself carries DECIMAL
        # should get the actionable cast hint, not a generic mismatch
        banned_side = False
        for side, d in (("oracle", bd), ("spark", ad)):
            banned = [(c, t) for c, t in d.items()
                      if any(btok in t.upper() for btok in BANNED)]
            if banned:
                p_fail(name, f"{side} output widens beyond BIGINT/DOUBLE "
                       f"{banned} — cast it (CAST(sum(x) AS BIGINT))")
                banned_side = True; break
        if banned_side:
            continue
        dtbad = [(c, ad[c], bd[c]) for c in sorted(set(ad) & set(bd))
                 if widen(ad[c]) != widen(bd[c])]
        if dtbad:
            p_fail(name, f"dtype mismatch after widening {dtbad}"); continue
        a = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        b = con.sql(oracle[name]).df()
        a = a[sorted(a.columns)]
        b = b[sorted(b.columns)]
        if list(a.columns) != list(b.columns):
            p_fail(name, f"columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if a.shape != b.shape:
            p_fail(name, f"shape {a.shape} vs {b.shape}"); continue
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
                detail = f"col {c} differs at rows {bad.tolist()}"
                for i in bad[:2]:
                    detail += f"; spark={a.iloc[i].to_dict()} duck={b.iloc[i].to_dict()}"
                p_fail(name, detail)
                eq = False
                break
        if eq:
            p_ok(name, int(a.shape[0]))
    except Exception as e:
        p_fail(name, f"{type(e).__name__}: {e}")
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
if JSON_OUT:
    summary = {"sf_dir": SF, "total": len(oracle),
               "pass": len(oracle) - fail, "fail": fail,
               "queries": report}
    with open(JSON_OUT, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {JSON_OUT}")
sys.exit(1 if fail else 0)
