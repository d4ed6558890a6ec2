#!/bin/bash
# Reproducible sf1 battery (r15): fixture -> engine Verify -> DuckDB
# oracle compare on every tractable twin -> ContractCheck -> merged
# CORRECTNESS_sf1_r{N}.json. Committed so the sf1 battery of record is
# reproducible from the repo alone (the r14 verdict's artifact gap).
#
# Usage: scripts/run_sf1.sh <round> [sfDir] [verifyOutDir]
# An existing verifyOutDir is reused (the engine pass is the long pole);
# delete it to force a re-run.
set -e
N=${1:?round number, e.g. 15}
SF=${2:-/tmp/graft_sf1}
OUT=${3:-/tmp/sf1_verify_out}

[ -f "$SF/documents.parquet" ] || python3 scripts/gen_sf1.py "$SF"
if [ ! -f "$OUT/oracle_sql.json" ]; then
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} bash scripts/verify.sh "$SF" "$OUT"
fi

# Split the oracle set by MEASURED DuckDB cost at sf1 (each twin timed
# in isolation, 90 s budget, threads=8 — r15 triage; re-measure when a
# twin changes). Everything not listed here oracle-compares at sf1;
# the r9 family-level convention (all d/t/n/mm/st exec-only) left 85
# tractable twins unchecked — the whole t-family runs in seconds, the
# st batch twins are plain rollups, and the n-family's ladders already
# replay at sf1 inside n22/n23. The 13 genuinely intractable ones:
#   d02_minhash_lsh        exact all-pairs Jaccard: C(50k,2)=1.25e9
#                          shingle-set intersections
#   d03_simhash            same all-pairs shape over 64-bit signatures
#   d09_dedup_incremental  replays the d02 twin twice (base + delta)
#   d10_paragraph_dedup    all-pairs at paragraph granularity (235k)
#   d11_paragraph_dup_stats consumes the d10 exact pair set
#   d19_similar_topk       all-pairs cosine topk (20k x 50k-dim space)
#   d21_dup_pagerank       consumes the d02-style exact pair set
#   d23_minhash_calibration exact Jaccard over the full pair space
#   d25_triangle_count     consumes the exact pair set
#   mm06_phash_dedup       all-pairs 64-bit hamming over 50k docs
#                          (planted-fixture contract still gates it)
#   mm13_phash_hot_balanced all-pairs twin incl. the planted hot band
#                          (planted-fixture contract gates it, r15)
#   t23_bpe_train          8 sequential corpus-wide merge rounds as
#                          chained CTEs
#   t24_bpe_token_count    re-derives the t23 merge table first
EXEC_ONLY="d02_minhash_lsh d03_simhash d09_dedup_incremental \
d10_paragraph_dedup d11_paragraph_dup_stats d19_similar_topk \
d21_dup_pagerank d23_minhash_calibration d25_triangle_count \
mm06_phash_dedup mm13_phash_hot_balanced t23_bpe_train t24_bpe_token_count"

python3 - "$OUT" "$EXEC_ONLY" <<'PY'
import json, os, sys
out, exec_only = sys.argv[1], set(sys.argv[2].split())
# Idempotent (r15 advice): on a rerun oracle_sql.json is already the
# filtered subset — the FULL record lives in oracle_sql_full.json, so
# filter from that when present and never overwrite it with a subset.
full_path = f"{out}/oracle_sql_full.json"
if os.path.exists(full_path):
    full = json.load(open(full_path))
else:
    full = json.load(open(f"{out}/oracle_sql.json"))
    json.dump(full, open(full_path, "w"))
kept = {k: v for k, v in full.items() if k not in exec_only}
json.dump(kept, open(f"{out}/oracle_sql.json", "w"))
print(f"oracle set: {len(kept)} of {len(full)} "
      f"({len(full)-len(kept)} exec-only by measured twin cost)")
PY

python3 scripts/check.py "$SF" "$OUT" /tmp/sf1_check.json

ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED"
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
java $ADD_OPENS -Xmx8g -cp "$CP" graft.tools.ContractCheck "$OUT" /tmp/sf1_contracts.json

python3 scripts/merge_sf1.py "CORRECTNESS_sf1_r${N}.json" /tmp/sf1_check.json \
  --exec-only "$OUT" --contracts /tmp/sf1_contracts.json
