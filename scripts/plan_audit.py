"""Sweep every registered operator's physical plan for scale anti-patterns.

Current invariant: NO operator may plan a `CartesianProduct` (the
non-broadcast nested-loop cross product — the plan shape that cannot
survive fact-sized inputs). BroadcastNestedLoopJoin is allowed: the engine
issues it only with a broadcast scalar/dim side (join_theta_pure,
join_cross, the subquery ops), which is bounded work at any corpus size.

Ops in SKIP_PREFIX do eager work inside the builder (similarity index
construction, connected-components label computation, parquet
materialization) — their plan shapes are pinned individually in
tests/test_plan_shape.py and tests/test_quality.py instead of swept here.

Usage: python scripts/plan_audit.py [--sf /root/testdata/sf0.001]
Exit code 1 if any plan regresses. Run at sf0.001 (plan shape does not
depend on SF; AQE re-planning is exercised separately by
tests/test_runtime_filters.py).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filemap_spark import all_queries, get_spark  # noqa: E402

SKIP_PREFIX = (
    "sim_",
    "dedup_connected",
    "dedup_apply",
    "dedup_materialize",
    "dedup_incremental",
    "dedup_embedding",
    "dedup_survivor",  # builder eagerly runs 20 pagerank rounds
    "dedup_cluster",  # builder eagerly computes CC labels
    "pipeline_",
    "emb_",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark("plan-audit", master="local[8]")
    bad: list[tuple[str, str]] = []
    checked = 0
    for name, fn in all_queries().items():
        if name.startswith(SKIP_PREFIX):
            continue
        try:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            checked += 1
            if "CartesianProduct" in buf.getvalue():
                bad.append((name, "CartesianProduct"))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            bad.append((name, f"builder error: {e!r:.120}"))
    for name, why in bad:
        print(f"[BAD] {name}: {why}")
    print(f"{checked} plans checked, {len(bad)} violations")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
