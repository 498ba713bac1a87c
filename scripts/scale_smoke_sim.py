#!/usr/bin/env python
"""10×-replica scale smoke for the similarity/embedding family (round 13,
VERDICT r12 task 4 — SCALE.md's smokes covered text dedup + LSH ingest;
this records the missing datapoints for the blocked-matmul/popcount ops).

Protocol (r9): replicate embeddings sf0.1 ×10 with offset vec_ids
(id-offset keeps keys unique; the vectors themselves repeat, which for
dedup_embedding_cosine is the adversarial every-vector-a-10-member-cluster
corpus), other tables symlinked, warm min-of-2 per op at 1× and 10×.

Expectation to verify, op by op — brute-force pairwise ops (cosine top-k,
maxsim, hamming) do quadratic WORK in corpus size (10× rows → 100× dot
products): the claim under test is NOT linear wall time, it is that the
blocked kernels hold their bounded per-task memory (block×index tiles) and
degrade smoothly — no collect cliff, no OOM, no shuffle blow-up. The
cell-pruned dedup op should stay near-linear (pruning absorbs the blow-up).

Usage: python scripts/scale_smoke_sim.py [--reps 10]
Prints one line per (op, scale) and a summary table to paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filemap_spark import all_queries, get_spark

OPS = (
    "sim_cosine_topk",
    "sim_maxsim_multivector",
    "emb_hamming_topk",
    "dedup_embedding_cosine",
)

SF_DIR = "/root/testdata/sf0.1"


def build_replica_dir(spark, reps: int) -> str:
    out = tempfile.mkdtemp(prefix="sim_smoke_sf01x")
    for t in os.listdir(SF_DIR):
        if t != "embeddings.parquet":
            os.symlink(os.path.join(SF_DIR, t), os.path.join(out, t))
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    # offset by max(vec_id)+1, not count(): uniqueness must not assume
    # dense 0..n-1 ids
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    rep = (
        emb.crossJoin(
            F.broadcast(
                spark.range(reps).select(F.col("id").alias("rep"))
            )
        )
        .select(
            (F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(8)
    )
    rep.write.parquet(os.path.join(out, "embeddings.parquet"))
    return out


def time_warm(fn, spark, sf_dir: str, n: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    fn(spark, sf_dir).collect()  # warm
    for _ in range(n):
        t0 = time.time()
        rows = len(fn(spark, sf_dir).collect())
        best = min(best, time.time() - t0)
    return round(best, 2), rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("sim-scale-smoke")
    queries = all_queries()
    rep_dir = build_replica_dir(spark, args.reps)
    try:
        print(f"| op | 1x warm s | {args.reps}x warm s | wall ratio | "
              f"rows 1x -> {args.reps}x |")
        print("|---|---|---|---|---|")
        for name in OPS:
            t1, r1 = time_warm(queries[name], spark, SF_DIR)
            tn, rn = time_warm(queries[name], spark, rep_dir)
            print(
                f"| `{name}` | {t1} | {tn} | "
                f"{round(tn / t1, 1)}x | {r1} -> {rn} |",
                flush=True,
            )
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
