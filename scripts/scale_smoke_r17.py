#!/usr/bin/env python
"""10×-replica scale smoke, round 17 — the two r17 debuts
(`text_dsir_resample`, `dedup_exact_substring`), so every graded op
keeps a measured scale datapoint (SCALE.md).

Protocol (r9, as scale_smoke_sim.py / scale_smoke_r16.py): replicate
documents ×10 with offset doc_ids, symlink the rest, warm min-of-2 per
op at 1× and 10× including collect().

The claim under test is the designed scaling shape, not linear wall
time: the resampler is text_dsir_importance's plan (bigram explode +
two bucket-keyed aggs + a 64-row broadcast) plus a hash column and
TakeOrdered(k) — expect ≈ the importance op's measured 3.8× and a
CONSTANT k-row result; the substring op is a span-keyed hash agg +
probe join whose span stream grows linearly while the duplicated-window
hit set grows with the planted duplication (each replica duplicates the
base corpus's shared runs, and the replicas do NOT collide with each
other — doc_ids offset but texts identical, so every cross-doc span
gains multiplicity ×10). No collect cliff, no OOM, no shuffle blow-up.

Usage: python scripts/scale_smoke_r17.py [--reps 10]
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

DOC_OPS = (
    "text_dsir_resample",
    "dedup_exact_substring",
)

SF_DIR = "/root/testdata/sf0.1"


def build_replica_dir(spark, reps: int) -> str:
    """documents replicated with offset doc_ids (offset a multiple of 10
    so the mod-10 splits keep their proportions); everything else
    symlinked."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="r17_smoke_sf01x")
    for t in os.listdir(SF_DIR):
        if t != "documents.parquet":
            os.symlink(os.path.join(SF_DIR, t), os.path.join(out, t))

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    d_off = ((d_max + 9) // 10) * 10
    (
        docs.crossJoin(
            F.broadcast(spark.range(reps).select(F.col("id").alias("rep")))
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * d_off)
        .drop("rep")
        .write.parquet(os.path.join(out, "documents.parquet"))
    )
    return out


def time_op(queries, name, spark, sf_dir) -> tuple[float, int]:
    best, rows = None, 0
    for _ in range(2):
        t0 = time.monotonic()
        rows = len(queries[name](spark, sf_dir).collect())
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    os.environ.pop("FILEMAP_MEMO", None)
    spark = get_spark("r17-scale-smoke")
    queries = all_queries()
    ops = DOC_OPS

    rep_dir = build_replica_dir(spark, args.reps)
    try:
        queries["scan_parquet_count"](spark, SF_DIR).collect()
        rows1, rowsN, t1, tN = {}, {}, {}, {}
        for op in ops:
            t1[op], rows1[op] = time_op(queries, op, spark, SF_DIR)
            print(f"{op} 1x: {t1[op]:.2f}s {rows1[op]} rows", flush=True)
        for op in ops:
            tN[op], rowsN[op] = time_op(queries, op, spark, rep_dir)
            print(f"{op} {args.reps}x: {tN[op]:.2f}s {rowsN[op]} rows", flush=True)
        print("\n| op | 1× warm s | 10× warm s | wall ratio | result rows 1×→10× |")
        print("|---|---|---|---|---|")
        for op in ops:
            print(
                f"| `{op}` | {t1[op]:.2f} | {tN[op]:.2f} "
                f"| {tN[op] / t1[op]:.1f}× | {rows1[op]:,} → {rowsN[op]:,} |"
            )
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
