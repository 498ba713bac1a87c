"""Sweep every registered operator's physical plan for scale anti-patterns.

Current invariants:
1. NO operator may plan a `CartesianProduct` (the non-broadcast
   nested-loop cross product — the plan shape that cannot survive
   fact-sized inputs). BroadcastNestedLoopJoin is allowed: the engine
   issues it only with a broadcast scalar/dim side (join_theta_pure,
   join_cross, the subquery ops), which is bounded work at any corpus size.
2. NO operator may plan an UNPARTITIONED data-sized Window (round 7,
   VERDICT r6 task 2): a Window node with an empty partition spec funnels
   every row through one task. The only allowed unpartitioned windows are
   over BOUNDED relations — detected by the repo convention that every
   bounded-offset window orders exclusively by engine-internal `__`
   marker columns (ranks.py's `__fsr_pid` offsets relation is
   numPartitions rows, i.e. cluster config, not data size). New bounded
   windows must follow that naming convention to pass. Frame-first specs
   (no partition AND no order, e.g. `sum(x) OVER ()`) became detectable
   in round 8 (the ADVICE r7 regex fix) and are banned OUTRIGHT — they
   carry no order columns for the convention to exempt, and the two ops
   that planned them over bounded frames (agg_decile_lift,
   agg_chi2_independence) now broadcast a 1-row total instead.

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


def unpartitioned_window_violations(plan: str) -> list[str]:
    """Specs of every data-sized unpartitioned window in a formatted plan.

    Every Window node's expressions embed `windowspecdefinition(partition
    cols..., order cols ASC|DESC..., specifiedwindowframe(...))`.
    Partition columns print WITHOUT a sort direction, so the spec's FIRST
    argument classifies it: a bare attribute ⇒ partitioned (fine); a
    direction-suffixed attribute ⇒ ORDER-only (single-task sort); a frame
    ⇒ neither (whole input on one task). Bounded-relation windows — every
    order column an engine-internal `__` marker, e.g. ranks.py's
    `__fsr_pid` offsets cumsum over a numPartitions-row relation — are
    exempt by convention."""
    import re

    out = []
    # First-arg alternation (ADVICE r7): a frame-first spec's next char is
    # '(' — `[^,()]+` alone can never match it, so `count(*) OVER ()`
    # windows silently evaded the sweep. Maximal munch makes the trailing
    # delimiter class redundant for the attribute branch.
    for m in re.finditer(
        r"windowspecdefinition\((specifiedwindowframe|[^,()]+)", plan
    ):
        first = m.group(1).strip()
        if first.startswith("specifiedwindowframe"):
            out.append("(no partition, no order)")
            continue
        if not re.search(r"\b(ASC|DESC)\b", first):
            continue  # bare column ⇒ partitioned window
        # order-only spec: collect its order columns for the exemption
        tail = plan[m.start() : m.start() + 400]
        cols = re.findall(r"(\w+)#\d+L? (?:ASC|DESC)", tail)
        if cols and all(c.startswith("__") for c in set(cols)):
            continue  # bounded offsets relation — allowed by convention
        out.append(m.group(0)[:100])
    return sorted(set(out))


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
            plan = buf.getvalue()
            if "CartesianProduct" in plan:
                bad.append((name, "CartesianProduct"))
            for order in unpartitioned_window_violations(plan):
                bad.append((name, f"unpartitioned Window over [{order}]"))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            bad.append((name, f"builder error: {e!r:.120}"))
    for name, why in bad:
        print(f"[BAD] {name}: {why}")
    print(f"{checked} plans checked, {len(bad)} violations")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
