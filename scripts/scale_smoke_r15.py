#!/usr/bin/env python
"""10×-replica scale smoke, round 15 — the two r14 debuts VERDICT r14
task 8 lists as missing their SCALE.md row (`text_bpe_pack_sequences`,
`agg_gini_grouped`) plus the three r15 debuts (`text_quality_classifier`,
`agg_theil_index`, `dedup_cdc_chunks`), so every graded op keeps a
measured scale datapoint.

Protocol (r9, as scale_smoke_sim.py): replicate the op's driving table
×10 with offset keys (documents for the text/dedup ops; orders AND
customer — both key columns offset per replica — for the spend-inequality
pair, so each nation really holds 10× distinct customers), symlink the
rest, warm min-of-2 per op at 1× and 10× including collect().

The claim under test is the designed scaling shape, not linear wall
time: the BPE pack is corpus-proportional explode + hash agg; the
inequality pair is one fact join + per-nation windows/aggs; the
classifier is two token-keyed aggs + a broadcast model join; CDC is an
embarrassingly-parallel Arrow chunking stage + hash-keyed aggs. No
collect cliff, no OOM, no shuffle blow-up.

Usage: python scripts/scale_smoke_r15.py [--reps 10]
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
    "text_bpe_pack_sequences",
    "text_quality_classifier",
    "dedup_cdc_chunks",
)
SPEND_OPS = (
    "agg_gini_grouped",
    "agg_theil_index",
)

SF_DIR = "/root/testdata/sf0.1"


def build_replica_dir(spark, reps: int) -> str:
    """documents replicated with offset doc_ids; orders+customer
    replicated with BOTH keys offset (so per-nation customer counts —
    the inequality ops' group sizes — genuinely grow 10×); everything
    else symlinked."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="r15_smoke_sf01x")
    replicated = {"documents.parquet", "orders.parquet", "customer.parquet"}
    for t in os.listdir(SF_DIR):
        if t not in replicated:
            os.symlink(os.path.join(SF_DIR, t), os.path.join(out, t))

    def reps_frame():
        return F.broadcast(spark.range(reps).select(F.col("id").alias("rep")))

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d_off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    (
        docs.crossJoin(reps_frame())
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * d_off)
        .drop("rep")
        .write.parquet(os.path.join(out, "documents.parquet"))
    )

    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    c_off = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    (
        cust.crossJoin(reps_frame())
        .withColumn("c_custkey", F.col("c_custkey") + F.col("rep") * c_off)
        .drop("rep")
        .write.parquet(os.path.join(out, "customer.parquet"))
    )

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    o_off = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        orders.crossJoin(reps_frame())
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * o_off)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * c_off)
        .drop("rep")
        .write.parquet(os.path.join(out, "orders.parquet"))
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
    spark = get_spark("r15-scale-smoke")
    queries = all_queries()
    ops = DOC_OPS + SPEND_OPS

    rep_dir = build_replica_dir(spark, args.reps)
    try:
        # one warmup query so JIT noise lands outside the timings
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
