#!/usr/bin/env python
"""Interleaved A/B drift adjudication (round 12's BASELINE.md protocol).

When BENCH_rN shows queries drifting vs BENCH_r(N-1) on unchanged plans,
this separates rig from code mechanically: run the SAME query list from
two trees (e.g. the previous round's committed tree in a git worktree vs
the current tree) in strict A/B/A/B interleave, fresh JVM per run,
identical warmup + min-of-3 protocol, plus both canaries per run.

Usage:
  git worktree add /tmp/prevtree <prev-round-commit>
  python scripts/ab_drift.py /tmp/prevtree /root/repo \
      --queries agg_decile_lift win_pareto_share ... --rounds 3
  git worktree remove --force /tmp/prevtree

Each line of output is one JSON run record; compare per-tree min-of-runs.
Ratios near 1.0 with canary swings => rig; a reproducible per-query gap
=> code. Round-12 precedent: AB_DRIFT_r12.jsonl + BASELINE.md
§adjudications (round 12).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_RUNNER = r'''
import json, os, sys, time
tree = sys.argv[1]
sys.path.insert(0, tree)
from filemap_spark import all_queries, get_spark
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-drift", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
queries = all_queries()
from pyspark.sql import functions as F
from filemap_spark.io import load_table
li = load_table(spark, SF, "lineitem")
li.where(F.col("l_shipdate") <= "1998-09-02").groupBy("l_returnflag").agg(
    F.sum("l_quantity")).collect()

def timed(build, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter(); build().collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)

canary = timed(lambda: li.where(F.col("l_shipdate") <= "1998-09-02")
    .groupBy("l_returnflag", "l_linestatus")
    .agg(F.sum("l_quantity"), F.sum("l_extendedprice"),
         F.avg("l_discount"), F.count("*")))
shuffle = timed(lambda: li.groupBy("l_orderkey")
    .agg(F.sum("l_quantity").alias("q"), F.count("*").alias("n"))
    .groupBy((F.col("q") % 10).cast("long").alias("b"))
    .agg(F.count("*").alias("no"), F.sum("n").alias("ni")))
out = {"tree": tree, "canary": canary, "shuffle_canary": shuffle, "queries": {}}
for q in sys.argv[2:]:
    out["queries"][q] = timed(lambda q=q: queries[q](spark, SF))
print(json.dumps(out))
'''


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tree_a")
    ap.add_argument("tree_b")
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    with tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False
    ) as f:
        f.write(_RUNNER)
        runner = f.name
    try:
        for _ in range(args.rounds):
            for tree in (args.tree_a, args.tree_b):
                proc = subprocess.run(
                    [sys.executable, runner, tree, *args.queries],
                    capture_output=True, text=True,
                )
                if proc.returncode != 0:
                    # do NOT emit a placeholder record into the JSONL
                    # stream consumers min-of-runs over (ADVICE r12)
                    print(proc.stderr[-500:], file=sys.stderr)
                    return 1
                line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
                print(line, flush=True)
    finally:
        os.unlink(runner)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
