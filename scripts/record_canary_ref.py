#!/usr/bin/env python
"""SHUFFLE_CANARY_REF re-recorder (round 16, VERDICT r15 task 3a).

The 0.48 s shuffle-canary reference recorded in round 10 stopped being
reachable on this rig (r15: five out of five strict `--family shuffle`
certification attempts failed with pre samples 1.47–1.72× even at
load-average 0.2), which made the strict shuffle gate unfalsifiable and
let up to ~17% of rig slowness bake into six shuffle-family bar
denominators (ADVICE r15). This script re-measures the reference itself
under the only protocol that still certifies — a SCAN-certified window —
at the canary's exact bench.py position:

    warmup query → untimed xxhash64 scan of every table
    → scan canary  (min-of-3, the in-position pre_scan)
    → shuffle canary (min-of-3 — THE measurement)
    → scan canary  (min-of-3, post)

The window counts only if BOTH scan samples are ≤ 1.05× of CANARY_REF
(0.52 s): same CPU-quietness evidence the Table 5b'/6/7 denominators
used. One JSON line per attempt; run several attempts with ≥150 s
cooldown and adopt the MINIMUM certified shuffle sample as the new
reference (a minimum over certified-quiet windows can only be biased
HIGH by residual contention, so the adopted reference keeps the gate
conservative: a truly quiet rig can reach it, a contended one cannot).

Usage: python scripts/record_canary_ref.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bench import (
        CANARY_REF,
        _baseline_pricing_form,
        _shuffle_canary_form,
        _time_best,
    )
    from filemap_spark.io import TABLES, load_table
    from filemap_spark.session import get_spark

    os.environ.pop("FILEMAP_MEMO", None)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("filemap-canary-ref")

    _baseline_pricing_form(spark, sf_dir).collect()
    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).selectExpr("max(xxhash64(*))").collect()
        except Exception as e:  # noqa: BLE001 — missing optional table
            print(f"WARMUP SKIPPED for {t}: {e}", file=sys.stderr)

    pre_scan = _time_best(_baseline_pricing_form, spark, sf_dir)
    shuffle = _time_best(_shuffle_canary_form, spark, sf_dir)
    post_scan = _time_best(_baseline_pricing_form, spark, sf_dir)

    certified = (
        pre_scan / CANARY_REF <= 1.05 and post_scan / CANARY_REF <= 1.05
    )
    print(
        json.dumps(
            {
                "certified": certified,
                "scan_ratios": [
                    round(pre_scan / CANARY_REF, 3),
                    round(post_scan / CANARY_REF, 3),
                ],
                "shuffle_canary_in_position": shuffle,
                "sf_dir": sf_dir,
            }
        )
    )
    return 0 if certified else 2


if __name__ == "__main__":
    sys.exit(main())
