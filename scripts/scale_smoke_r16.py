#!/usr/bin/env python
"""10×-replica scale smoke, round 16 — the two r15 debuts VERDICT r15
task 6 lists as missing their SCALE.md row (`ts_periodogram`,
`text_classifier_holdout_eval`) plus the two r16 debuts
(`text_quality_incremental`, `text_dsir_importance`), so every graded op
keeps a measured scale datapoint.

Protocol (r9, as scale_smoke_sim.py): replicate the op's driving table
×10 with offset keys (documents for the text ops; events — event_id
offset, same 30-day/type span — for the periodogram), symlink the rest,
warm min-of-2 per op at 1× and 10× including collect().

The claim under test is the designed scaling shape, not linear wall
time: the periodogram is O(types×days) CELLS regardless of row count,
so 10× events should be near-flat past the scan; the holdout eval is
the classifier's token-explode shape (expect ≈ its 3.7×); the
incremental twin's steady state is delta-agg + broadcast-model scoring
(min-of-2 reports the artifact-warm run); DSIR is one bigram explode +
two bucket-keyed aggs + a 64-row broadcast. No collect cliff, no OOM,
no shuffle blow-up.

Usage: python scripts/scale_smoke_r16.py [--reps 10]
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
    "text_classifier_holdout_eval",
    "text_quality_incremental",
    "text_dsir_importance",
    # second r16 staging wave: KN is the bigram-table shape (model size
    # is vocab²-bounded, probe side scales with tokens); contamination
    # explodes 13-grams map-side and probes the eval-distinct set
    "text_kneser_ney_logprob",
    "text_contamination_ngram",
    # third wave: min-of-2 on a fresh warehouse reports the incremental
    # twin's artifact-warm (delta-only) path, like the NB twin
    "text_contamination_incremental",
)
# cusum: the replica keeps the 30-day/type span, so its cell frame is
# CONSTANT while row count grows 10× — expect near-flat, like the
# periodogram
EVENT_OPS = ("ts_periodogram", "ts_cusum_changepoint", "ts_mad_anomaly")

SF_DIR = "/root/testdata/sf0.1"


def build_replica_dir(spark, reps: int) -> str:
    """documents replicated with offset doc_ids (parities/mod-10 splits
    preserved per replica: the offset is a multiple of 10 so base/delta
    and even/odd splits keep their proportions); events replicated with
    offset event_ids over the SAME 30-day span (the periodogram's cell
    count must stay constant while row count grows 10×); everything
    else symlinked."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="r16_smoke_sf01x")
    replicated = {"documents.parquet", "events.parquet"}
    for t in os.listdir(SF_DIR):
        if t not in replicated:
            os.symlink(os.path.join(SF_DIR, t), os.path.join(out, t))

    def reps_frame():
        return F.broadcast(spark.range(reps).select(F.col("id").alias("rep")))

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    d_off = ((d_max + 9) // 10) * 10  # multiple of 10: splits preserved
    (
        docs.crossJoin(reps_frame())
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * d_off)
        .drop("rep")
        .write.parquet(os.path.join(out, "documents.parquet"))
    )

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    e_off = ev.agg(F.max("event_id")).collect()[0][0] + 1
    (
        ev.crossJoin(reps_frame())
        .withColumn("event_id", F.col("event_id") + F.col("rep") * e_off)
        .drop("rep")
        .write.parquet(os.path.join(out, "events.parquet"))
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
    ap.add_argument(
        "--ops",
        default=None,
        help="comma-list subset of the smoke ops (default: all)",
    )
    args = ap.parse_args()

    os.environ.pop("FILEMAP_MEMO", None)
    # fresh warehouse: the incremental twin must BUILD its base artifact
    # once per corpus here (run 1) and hit it (run 2) — min-of-2 then
    # reports the steady-state path at both scales
    os.environ["FILEMAP_WAREHOUSE"] = tempfile.mkdtemp(prefix="r16_smoke_wh_")
    spark = get_spark("r16-scale-smoke")
    queries = all_queries()
    ops = DOC_OPS + EVENT_OPS
    if args.ops:
        want = set(args.ops.split(","))
        ops = tuple(o for o in ops if o in want)

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
        shutil.rmtree(os.environ["FILEMAP_WAREHOUSE"], ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
