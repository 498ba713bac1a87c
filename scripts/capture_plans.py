#!/usr/bin/env python
"""Capture `.explain("formatted")` for every bench-suite query (guide §1).

Writes plans/<round>/<query>_<tag>.txt for each query in the bench suites
(HEADLINE + EXTENDED + STAGED + LLM); <round> comes from
$FILEMAP_PLAN_ROUND (default r18). Usage:

    python scripts/capture_plans.py before [query ...]
    python scripts/capture_plans.py after  [query ...]

With no query names, captures the whole suite. Building a DataFrame is
enough to print the pre-execution plan (AdaptiveSparkPlan isFinalPlan=false);
ops whose builders run eager jobs (localCheckpoint, incremental state) pay
that build cost here, which is fine — nothing is timed.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENDED_HEADLINE, HEADLINE, LLM_HEADLINE, STAGED_HEADLINE
from filemap_spark import all_queries, get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        here, "plans", os.environ.get("FILEMAP_PLAN_ROUND", "r18")
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("filemap-plan-capture")
    queries = all_queries()
    suite = list(dict.fromkeys(
        list(HEADLINE) + list(EXTENDED_HEADLINE) + list(STAGED_HEADLINE)
        + list(LLM_HEADLINE)
    ))
    if only:
        # explicit parens (ADVICE r17): `&` binds tighter than `-`, and the
        # intended set is "requested names outside the suite that ARE
        # registered queries"
        suite = [n for n in suite if n in only] + sorted(
            (only - set(suite)) & set(queries)
        )
        suite = list(dict.fromkeys(n for n in suite if n in queries))
    for name in suite:
        fn = queries.get(name)
        if fn is None:
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        buf = io.StringIO()
        try:
            df = fn(spark, sf_dir)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        except Exception:
            buf.write("PLAN CAPTURE FAILED:\n" + traceback.format_exc())
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
