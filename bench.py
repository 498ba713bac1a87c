#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Runs the ★ queries of SURVEY §2 (BASELINE.md's suite) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Per query: two runs, report the warm (min) one —
matching BASELINE.md table 2's warm methodology.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from filemap_spark import all_queries, get_spark

HEADLINE = (
    "agg_pricing_summary",
    "join_multiway_star",
    "topk_global",
    "win_topk_per_group",
    "stream_session_window",
    "stream_tumbling_window",
    "text_wordcount",
    "sim_cosine_topk",
)


def _prev_round_timings(here: str, sf: float | None) -> dict[str, float]:
    """Per-query warm timings from the newest committed BENCH_r{N}.json at
    the same scale factor — the regression baseline for this run."""
    import glob

    best: tuple[int, dict[str, float]] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            parsed = json.load(open(path)).get("parsed") or {}
        except Exception:
            continue
        if not parsed or parsed.get("sf") != sf:
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, parsed.get("queries") or {})
    return best[1] if best else {}


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None
    spark = get_spark("filemap-bench")
    queries = all_queries()

    # Untimed warmup: JVM/JIT/codegen/Arrow initialization otherwise lands
    # entirely on the first timed query (measured ~0.5 s of one-time cost).
    first = queries.get(HEADLINE[0])
    if first is not None:
        first(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # Mechanical regression guard: this_round / prev_round per query
    # (>1.0 = slower than the previous committed round).
    prev = _prev_round_timings(here, sf)
    vs_prev = {
        name: round(t / prev[name], 3)
        for name, t in timings.items()
        if prev.get(name)
    }

    print(
        json.dumps(
            {
                "metric": "headline_suite_warm_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "vs_prev": vs_prev,
            }
        )
    )


if __name__ == "__main__":
    main()
