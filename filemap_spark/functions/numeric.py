"""Deterministic numeric aggregation fragments.

Double summation is order-dependent: Spark's partial/final hash aggregate and
DuckDB's sum visit rows in different orders, and at 60k+ rows the accumulated
FP error (~1e-5 absolute on 1e9-magnitude sums) exceeds the 6dp rounding
resolution, so `round(sum(x), 6)` hash-mismatches between engines. Fix: make
the sum EXACT — round each row to 6dp, cast to DECIMAL(28,6) (exact integer
arithmetic in both engines, any order), sum, cast back.

Both dialects accept the identical SQL text, so these fragments are shared
verbatim between the Spark plan (`F.expr`) and the DuckDB oracle string.
"""

from __future__ import annotations


def dsum(expr: str, alias: str) -> str:
    """Order-independent 6dp-exact sum of a double expression."""
    return (
        f"round(cast(sum(cast(round({expr}, 6) as decimal(28,6))) as double), 6)"
        f" as {alias}"
    )


def davg(expr: str, alias: str, count_expr: str = "count(*)") -> str:
    """Order-independent 6dp-rounded mean (exact sum / count, divided as double)."""
    return (
        f"round(cast(sum(cast(round({expr}, 6) as decimal(28,6))) as double)"
        f" / {count_expr}, 6) as {alias}"
    )


def isum(expr: str, alias: str) -> str:
    """Integer sum pinned to BIGINT (DuckDB sums BIGINT into HUGEINT)."""
    return f"cast(sum({expr}) as bigint) as {alias}"
