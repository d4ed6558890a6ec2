#!/usr/bin/env python3
"""Assemble the round's sf1 battery artifact from chunked runs.

Usage: merge_sf1.py OUT.json CHECK_JSON... --exec-only DIR...

CHECK_JSON args are scripts/check.py artifacts (oracle-verified chunks);
each --exec-only DIR is a graft.Verify output directory whose queries are
recorded execute-only (row count, no DuckDB twin — the corpus-quadratic
d/t/n/mm exact twins and the streaming st* family, per the r9 sf1
convention). Oracle entries win on overlap. Exits non-zero if any oracle
chunk failed or any execute-only query is missing its parquet output
(errors.json names the construction failure if one exists).
"""
import glob
import json
import os
import sys

import pandas as pd

out_path = sys.argv[1]
args = sys.argv[2:]
split = args.index("--exec-only") if "--exec-only" in args else len(args)
check_jsons, exec_dirs = args[:split], args[split + 1:]

queries = {}
for cj in check_jsons:
    d = json.load(open(cj))
    # later artifacts override earlier ones (a re-run chunk supersedes
    # the stale entry of the chunk it patches)
    queries.update(d["queries"])
total_fail = sum(1 for q in queries.values() if q.get("match") is False)

exec_only = {}
exec_missing = []
for vd in exec_dirs:
    errors = {}
    ep = os.path.join(vd, "errors.json")
    if os.path.exists(ep):
        errors = json.load(open(ep))
    for qdir in sorted(glob.glob(os.path.join(vd, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir) or name in queries:
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            exec_missing.append((name, errors.get(name, "no parquet output")))
            continue
        n = sum(len(pd.read_parquet(f)) for f in files)
        exec_only[name] = {"executed": True, "rows": int(n)}
    for name, err in errors.items():
        if name not in queries and name not in exec_only:
            exec_missing.append((name, err))

summary = {
    "sf_dir": "/tmp/graft_sf1",
    "pass": sum(1 for q in queries.values() if q.get("match")),
    "fail": total_fail,
    "execute_only": len(exec_only),
    "queries": dict(sorted({**queries, **exec_only}.items())),
}
with open(out_path, "w") as f:
    json.dump(summary, f, indent=1, sort_keys=True)
print(f"pass={summary['pass']} fail={summary['fail']} "
      f"execute_only={summary['execute_only']} -> {out_path}")
for name, err in exec_missing:
    print(f"MISSING {name}: {err}")
sys.exit(1 if (total_fail or exec_missing) else 0)
