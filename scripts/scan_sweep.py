#!/usr/bin/env python
"""Post-AQE scan-reuse sweep (round 12) — the audit that found the
round-12 single-pass rewrite batch.

`scripts/plan_audit.py` checks PRE-execution plan shapes (cartesians,
unpartitioned windows, pushdown); this sweep catches a different class:
an op whose FINAL adaptive plan scans one table 3+ times because
Catalyst specialized the branches of a shared subtree (different pushed
isnotnull() sets, pruned aggregate outputs), silently defeating AQE's
ReuseExchange. Every op is EXECUTED at the (cheap) given SF and the
final plan's per-table scan counts are reported.

Usage: python scripts/scan_sweep.py [--sf /root/testdata/sf0.001] [name ...]

Exit code 1 if any op not on the triaged allowlist scans one table 3+
times; exit code 2 if any op ERRORED at the sweep SF (reported
separately — an error is not a multi-scan finding, ADVICE r12). The
allowlist carries the round-12 triage: thin-column re-reads (no
text/embedding bytes) and deliberate exactness choices.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filemap_spark import all_queries, get_spark

# Triaged ≥3-scan ops (round 12; emb_pair_distance_hist dropped round 13 —
# its pair map and count now derive from the one loaded frame): every scan
# past the first re-reads only thin key/flag columns (verified column sets
# recorded in SCALE.md), or the re-read is a deliberate exactness choice.
ALLOWED = {
    "sample_temperature_mix",   # doc_id/lang only — dimension-sized reads
    "sample_domain_mix",        # doc_id/source only
    "sample_negative_pairs",    # doc_id/source only
    "agg_skew_kurtosis",        # two numeric columns; centered moments by choice
}

# A scan's Location lists the TABLE directory (".../<table>.parquet") but can
# also list individual part files (".../<table>.parquet/part-...snappy.parquet")
# at multi-file SFs — so count SCAN NODES (one Location: line each), taking
# the first table-directory component per line, instead of counting every
# ".parquet" occurrence in the whole plan (ADVICE r12: the old
# r"(\w+)\.parquet" findall inflated counts once per listed part file).
_TABLE_RE = re.compile(r"/(\w+)\.parquet(?:[,/\]\s]|$)")


def _scan_counts(plan: str) -> Counter:
    tables: Counter = Counter()
    for line in plan.splitlines():
        if "Location" not in line:
            continue
        m = _TABLE_RE.search(line)
        if m:
            tables[m.group(1)] += 1
    return tables


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("scan-sweep")
    queries = all_queries()
    names = args.names or sorted(queries)
    offenders = 0
    errors = 0
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"[SKIP] {name}: not registered")
            continue
        try:
            df = fn(spark, args.sf)
            df.collect()
            plan = (
                df._jdf.queryExecution()
                .executedPlan()
                .toString()
                .split("== Initial Plan ==")[0]
            )
        except Exception as exc:  # surface, keep sweeping
            print(f"[ERR ] {name}: {type(exc).__name__}: {str(exc)[:160]}")
            errors += 1
            continue
        tables = _scan_counts(plan)
        worst = max(tables.values()) if tables else 0
        if worst >= 3:
            flag = "allowed" if name in ALLOWED else "OFFENDER"
            if name not in ALLOWED:
                offenders += 1
            print(f"[{flag}] {name} {dict(tables)} "
                  f"reused={plan.count('ReusedExchange')}")
    print(
        f"swept {len(names)} ops, {offenders} unallowed multi-scan, "
        f"{errors} errored"
    )
    return 1 if offenders else (2 if errors else 0)


if __name__ == "__main__":
    raise SystemExit(main())
