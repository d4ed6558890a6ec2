#!/usr/bin/env python3
"""Assemble the round's sf1 battery artifact from chunked runs.

Usage: merge_sf1.py OUT.json CHECK_JSON... --exec-only DIR...
           [--contracts CONTRACTS_JSON...]

CHECK_JSON args are scripts/check.py artifacts (oracle-verified chunks);
each --exec-only DIR is a graft.Verify output directory whose queries are
recorded execute-only (row count, no DuckDB twin — the corpus-quadratic
d/t/n/mm exact twins and the streaming st* family, per the r9 sf1
convention). Oracle entries win on overlap. Each --contracts file is a
graft.tools.ContractCheck output ({query: bool}) — queries with a true
contract get "contract": true on their row (the planted-fixture gate for
execute-only rows); a FALSE contract fails the merge. Exits non-zero if
any oracle chunk failed, any execute-only query is missing its parquet
output (errors.json names the construction failure if one exists), or
any contract is false.
"""
import glob
import json
import os
import sys

import pandas as pd

out_path = sys.argv[1]

# Route every operand by the most recent flag seen — argument ORDER
# between --exec-only and --contracts must not matter (the r12 advisor
# found `--contracts` before `--exec-only` misrouted the directories
# into contract_jsons and crashed json.load with a confusing error).
buckets = {"": [], "--exec-only": [], "--contracts": []}
current = ""
for tok in sys.argv[2:]:
    if tok in buckets:
        current = tok
    elif tok.startswith("--"):
        sys.exit(f"unknown flag {tok}; expected --exec-only / --contracts")
    else:
        buckets[current].append(tok)
check_jsons = buckets[""]
exec_dirs = buckets["--exec-only"]
contract_jsons = buckets["--contracts"]

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

contracts = {}
for cj in contract_jsons:
    contracts.update(json.load(open(cj)))
contract_fail = sorted(k for k, v in contracts.items() if not v)
merged = dict(sorted({**queries, **exec_only}.items()))
for name, ok in contracts.items():
    if ok and name in merged:
        merged[name]["contract"] = True

summary = {
    "sf_dir": "/tmp/graft_sf1",
    "pass": sum(1 for q in queries.values() if q.get("match")),
    "fail": total_fail,
    "execute_only": len(exec_only),
    "contracts": sum(1 for v in contracts.values() if v),
    "queries": merged,
}
with open(out_path, "w") as f:
    json.dump(summary, f, indent=1, sort_keys=True)
print(f"pass={summary['pass']} fail={summary['fail']} "
      f"execute_only={summary['execute_only']} "
      f"contracts={summary['contracts']} -> {out_path}")
for name, err in exec_missing:
    print(f"MISSING {name}: {err}")
for name in contract_fail:
    print(f"CONTRACT FAIL {name}")
sys.exit(1 if (total_fail or exec_missing or contract_fail) else 0)
