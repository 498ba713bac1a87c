"""Round-N ledger prep: fold the driver's CORRECTNESS_r*.json rows into the
grading-order bookkeeping (SURVEY §5.3's r4 update rule, automated).

Reads every /root/repo/CORRECTNESS_r0*.json, classifies each graded op
(green = rows+schema+hash match, or a clean rows-only run with spark_rows
recorded and err in (None, 'no_oracle')), and prints:

  1. the new cumulative GREEN frozenset body (paste into
     registry._DRIVER_GREEN),
  2. ops graded but NOT green (these go FIRST in the next priority block),
  3. registered ops never graded by any round (next in the block),
  4. a drift check against the live registry.

Pure stdout report — it never edits registry.py itself; the priority
order within group (2)/(3) stays a human decision (cost tiers, family
grouping, flagship priority).

Usage: python scripts/update_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def classify(row: dict) -> str:
    if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
        return "green"
    if (
        row.get("err") in (None, "no_oracle")
        and row.get("rows_match") is None
        and row.get("spark_rows") is not None
    ):
        return "green"  # rows-only op, ran clean
    return "failed"


def main() -> int:
    status: dict[str, str] = {}
    # numeric round sort: lexical order would misplace r10+ after r1 and the
    # r0* glob would miss them entirely (rounds run past 9). Targeted regex —
    # concatenating ALL digits would sort a CORRECTNESS_r5_v2.json as round
    # 52 and crash on a digitless name; skip non-matching files loudly.
    import re

    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    rounds = []
    for p in paths:
        m = re.search(r"_r(\d+)\.json$", os.path.basename(p))
        if m:
            rounds.append((int(m.group(1)), p))
        else:
            print(f"# (!) skipping non-round file: {os.path.basename(p)}")
    rounds = [p for _, p in sorted(rounds)]
    for path in rounds:
        with open(path) as f:
            for name, row in json.load(f).items():
                # later rounds overwrite earlier verdicts (re-grades count)
                status[name] = classify(row)

    from filemap_spark.registry import _META, all_queries

    all_queries()  # load registry
    registered = set(_META)

    green = sorted(n for n, s in status.items() if s == "green" and n in registered)
    failed = sorted(n for n, s in status.items() if s == "failed" and n in registered)
    never = sorted(registered - set(status))
    ghosts = sorted(set(status) - registered)

    print(f"# rounds read: {[os.path.basename(p) for p in rounds]}")
    print(f"# graded {len(status)} | green {len(green)} | failed {len(failed)}"
          f" | never-graded {len(never)} | unregistered-ghosts {len(ghosts)}")
    print()
    print("# (1) cumulative green ledger — paste as the new frozenset body:")
    body = ", ".join(f'"{n}"' for n in green)
    print(textwrap.fill(body, width=76, initial_indent="    ",
                        subsequent_indent="    "))
    print()
    print("# (2) graded but NOT green (head of next priority block):")
    for n in failed:
        print(f"    {n}")
    print()
    print("# (3) never driver-graded (next in the block):")
    for n in never:
        print(f"    {n}")
    if ghosts:
        print()
        print("# (!) graded names no longer registered — investigate:")
        for n in ghosts:
            print(f"    {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
