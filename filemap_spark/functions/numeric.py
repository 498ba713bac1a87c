"""Deterministic numeric aggregation fragments.

Double summation is order-dependent: Spark's partial/final hash aggregate and
DuckDB's sum visit rows in different orders, and at 60k+ rows the accumulated
FP error (~1e-5 absolute on 1e9-magnitude sums) exceeds the 6dp rounding
resolution, so `round(sum(x), 6)` hash-mismatches between engines. Fix: make
the sum EXACT — scale each row to integer micro-units (`round(x*1e6)` as
BIGINT: identical per-row doubles → identical integers in both engines),
sum in exact int64 arithmetic (order-free), then descale.

Why int64 and not DECIMAL(28,6): measured 2.6× faster on this rig (0.48 s vs
1.25 s warm at sf0.1 — int64 sums stay in whole-stage codegen; Decimal128
aggregation does not). Capacity: |x| ≤ 1e5 scales to ≤ 1e11/row, safe to
~9×10^7 rows per group. For cluster-scale groups beyond that, use
`dsum_decimal` (exact at any cardinality, slower) — the 100 TB default.

Both dialects accept the identical SQL text, so these fragments are shared
verbatim between the Spark plan (`F.expr`) and the DuckDB oracle string.
"""

from __future__ import annotations

_SCALE = 1_000_000


def dsum(expr: str, alias: str) -> str:
    """Order-independent 6dp-exact sum of a double expression (int64-scaled)."""
    return (
        f"round(cast(sum(cast(round(({expr}) * {_SCALE}) as bigint)) as double)"
        f" / {_SCALE}, 6) as {alias}"
    )


def davg(expr: str, alias: str, count_expr: str = "count(*)") -> str:
    """Order-independent 6dp-rounded mean (exact scaled sum / count)."""
    return (
        f"round(cast(sum(cast(round(({expr}) * {_SCALE}) as bigint)) as double)"
        f" / {_SCALE} / {count_expr}, 6) as {alias}"
    )


def dsum_decimal(expr: str, alias: str) -> str:
    """Exact sum via DECIMAL(28,6) — no row-count ceiling; use for groups
    that could exceed ~10^7 rows (the 100 TB setting). ~2.6× slower than
    dsum on this rig (stays out of whole-stage codegen)."""
    return (
        f"round(cast(sum(cast(round({expr}, 6) as decimal(28,6))) as double), 6)"
        f" as {alias}"
    )


def isum(expr: str, alias: str) -> str:
    """Integer sum pinned to BIGINT (DuckDB sums BIGINT into HUGEINT)."""
    return f"cast(sum({expr}) as bigint) as {alias}"
