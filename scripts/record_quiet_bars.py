#!/usr/bin/env python
"""Certified-quiet bar-denominator recorder (round 14, VERDICT r13 task 4).

Automates the BASELINE.md Table 5b' protocol that round 13 ran by hand:

    warmup (one JVM query + untimed xxhash64 scan of every table)
    PRE  canaries: scan (pricing form) + shuffle (lineitem hash-agg form)
    min-of-3 warm for each requested op
    POST canaries: same pair again

and CERTIFIES the window only if the canary samples are at or under
their recorded references (scan 0.52 s, shuffle 0.48 s) times a small
tolerance (default 1.05 — a truly quiet rig sits well under 1.0). A
failed certification prints the canary evidence and exits 2 WITHOUT
printing denominators, so a contended measurement cannot be adopted by
accident — the r13 re-record discarded exactly one such attempt, and
this script's first two r14 runs were discarded the same way.

--family selects WHICH canary pair gates certification: `both`
(default — Table 5b' exactly, for mixed-family batches) or `scan` /
`shuffle` (strict pre+post on that family's canary; the other pair is
still measured and reported as evidence, it just doesn't veto). The
family gate exists because a bar only ever SCALES by its own family's
canary (bench.py §per-family scaling): a scan-family denominator
recorded while the shuffle canary idles at its standing 1.18–1.24×
(three rounds of bench history; burst amplitude ±15%) is untainted —
the shuffle factor never multiplies that bar — and requiring it under
1.05 would block scan-family recordings on this rig indefinitely.

--window post (round 16) gates on the POST sample(s) only, with the
full 4-sample evidence still printed for the adopting table to quote.
Rationale, measured: across 20 recorder windows in the r16 session the
PRE samples read 1.09–3.3× while the SAME window's post pair sat at or
under ~1.05× in most of them — the pre sample fires during fresh-JVM
JIT warmup (it is the canary's own first-queries position), not during
the min-of-3 op timings that follow. The post pair runs immediately
AFTER the op timings, so real contention overlapping the measurements
still vetoes (observed: one window's post_shuffle read 7.0× when a
background burst landed mid-window — post gating catches exactly that),
while a JIT-cold first sample no longer blocks recording indefinitely.
Denominators adopted under --window post must disclose it.

Warmed-position batches (round 17). The recorder's standard position —
ops timed directly after the canaries on a fresh JVM — charges the
FIRST ops through window-exec/explode/higher-order codepaths their JIT
compilation, which the bench suite (where bars actually gate, deep in a
60-query warm session) never charges: r17 measured 1.7-3.3x inflation
on the first family-op through (ts_cusum 1.641 vs 0.987 in-window
warmed; ts_mad 1.907 vs 0.939). Protocol: record each family TWICE —
once standard, once with already-barred family-mates leading the batch
as JIT warmers (their own inflated first-position samples are discarded
by min(old, new)) and the debut ops listed twice (the denominators dict
keeps the LAST, warmed timing); adopt min over the certified windows.
Disclose both samples in the BASELINE table (Table 9 precedent).

Usage:
    python scripts/record_quiet_bars.py [--family scan] [--window post] mm_decode_png ...

Output: one JSON line {"certified": true, "canaries": {...},
"denominators": {op: warm_s}} for pasting into BASELINE.md; adoption
into bench.py BASELINE_WARM_SF01 follows the min(old, new-certified)
rule by hand (a re-record must never loosen a bar).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOLERANCE = float(os.environ.get("QUIET_TOLERANCE", "1.05"))


def main(argv: list[str]) -> int:
    family = "both"
    window = "prepost"
    while argv and argv[0] in ("--family", "--window"):
        if argv[0] == "--family":
            if len(argv) < 2 or argv[1] not in ("both", "scan", "shuffle"):
                print("--family takes scan|shuffle|both", file=sys.stderr)
                return 1
            family, argv = argv[1], argv[2:]
        else:
            if len(argv) < 2 or argv[1] not in ("prepost", "post"):
                print("--window takes prepost|post", file=sys.stderr)
                return 1
            window, argv = argv[1], argv[2:]
    if not argv:
        print(
            "usage: record_quiet_bars.py [--family scan|shuffle|both] "
            "[--window prepost|post] OP [OP ...]",
            file=sys.stderr,
        )
        return 1

    from bench import (
        CANARY_REF,
        SHUFFLE_CANARY_REF,
        _baseline_pricing_form,
        _shuffle_canary_form,
        _time_best,
    )
    from filemap_spark.io import TABLES, load_table
    from filemap_spark.registry import all_queries
    from filemap_spark.session import get_spark

    os.environ.pop("FILEMAP_MEMO", None)  # denominators time raw plans
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("filemap-quiet-record")
    queries = all_queries()
    missing = [op for op in argv if op not in queries]
    if missing:
        print(f"unknown ops: {missing}", file=sys.stderr)
        return 1

    # Same warmup discipline as bench.py: one JVM query, then an untimed
    # full-column scan of every table so page-cache state matches the
    # references' recording conditions.
    _baseline_pricing_form(spark, sf_dir).collect()
    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).selectExpr("max(xxhash64(*))").collect()
        except Exception as e:  # noqa: BLE001 — missing optional table
            print(f"WARMUP SKIPPED for {t}: {e}", file=sys.stderr)

    canaries: dict[str, float] = {}
    canaries["pre_scan"] = _time_best(_baseline_pricing_form, spark, sf_dir)
    canaries["pre_shuffle"] = _time_best(_shuffle_canary_form, spark, sf_dir)

    denominators: dict[str, float] = {}
    for op in argv:
        denominators[op] = _time_best(queries[op], spark, sf_dir)

    canaries["post_scan"] = _time_best(_baseline_pricing_form, spark, sf_dir)
    canaries["post_shuffle"] = _time_best(_shuffle_canary_form, spark, sf_dir)

    ratios = {
        "pre_scan": canaries["pre_scan"] / CANARY_REF,
        "post_scan": canaries["post_scan"] / CANARY_REF,
        "pre_shuffle": canaries["pre_shuffle"] / SHUFFLE_CANARY_REF,
        "post_shuffle": canaries["post_shuffle"] / SHUFFLE_CANARY_REF,
    }
    gating = {
        "both": tuple(ratios),
        "scan": ("pre_scan", "post_scan"),
        "shuffle": ("pre_shuffle", "post_shuffle"),
    }[family]
    if window == "post":
        gating = tuple(k for k in gating if k.startswith("post"))
    certified = all(ratios[k] <= TOLERANCE for k in gating)
    record = {
        "certified": certified,
        "family": family,
        "window": window,
        "gating_samples": list(gating),
        "tolerance": TOLERANCE,
        "canaries": {k: round(v, 3) for k, v in canaries.items()},
        "canary_ratios": {k: round(v, 3) for k, v in ratios.items()},
        "denominators": denominators if certified else {},
        "sf_dir": sf_dir,
    }
    print(json.dumps(record))
    if not certified:
        print(
            "CERTIFICATION FAILED - rig not quiet, denominators withheld: "
            + json.dumps({k: round(v, 3) for k, v in ratios.items()}),
            file=sys.stderr,
        )
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
