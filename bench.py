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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None
    spark = get_spark("filemap-bench")
    queries = all_queries()

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

    print(
        json.dumps(
            {
                "metric": "headline_suite_warm_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
