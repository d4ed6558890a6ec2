#!/usr/bin/env python3
"""Derive bench_budgets.tsv from a bench_out.json.

The r14 verdict's bench-drift item: the sf0.1 battery's cost rose 1.13x
round-over-round on UNCHANGED queries and nothing failed loudly. Wall
time tracks the host's mood (load-3 windows have repeatedly faked
regressions), but executor-CPU and GC seconds track code, so the budget
gate pins those: each query's budget is its measured best-run CPU with
generous headroom (1.6x + 0.75 s) and GC with 3x + 2.5 s over the
MAX across the generating run's repetitions. CPU budgets use the MIN
across runs (the least-contended window is the code's CPU); GC uses
the MAX because GC attribution is bursty AND bimodal — a major
collection lands on whichever query is running, and the same code
measured p10's min-across-runs GC at 2.3 s in one r16 close and
20.5 s in the next (r15's close similarly tripped t16 at 1.12 s over
a 1.0 s floor). A min-based GC budget flags host heap states, not
code; 3x the worst observed + 2.5 s still catches a genuine
multi-x GC regression. graft.Bench
reads this file when the run's SF dir matches the header and reports
any query whose best (minimum across runs) CPU/GC exceeds budget in the
artifact's `budget_violations` plus stderr; SPARK_GRAFT_BUDGET_STRICT=1
turns violations into a nonzero exit for local gating.

Regenerate at round close from the closing clean-host bench:
    python3 scripts/gen_budgets.py bench_out.json > bench_budgets.tsv
"""
import json
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
    with open(src) as f:
        b = json.load(f)
    # min across ALL runs per query (contention-robust: the least-loaded
    # run's CPU is the code's CPU)
    cpu_min: dict[str, float] = {}
    gc_max: dict[str, float] = {}
    for run in b["runs"]:
        for name, (_wall, _task, cpu, gc) in run["queries"].items():
            cpu_min[name] = min(cpu_min.get(name, float("inf")), cpu)
            gc_max[name] = max(gc_max.get(name, 0.0), gc)
    print(f"# sf={b['sf']}")
    print("# query\tcpu_budget_s\tgc_budget_s  (best-run measured * headroom)")
    for name in sorted(cpu_min):
        cpu_b = round(cpu_min[name] * 1.6 + 0.75, 3)
        gc_b = round(gc_max[name] * 3.0 + 2.5, 3)
        print(f"{name}\t{cpu_b}\t{gc_b}")


if __name__ == "__main__":
    main()
