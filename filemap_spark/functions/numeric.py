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

MAGNITUDE CEILING for 6dp hash-stability: the descaled result is a DOUBLE,
whose ulp at magnitude |v| is ~|v| * 2^-52. Past |v| ≈ 4×10^9 the ulp
exceeds 1e-6, and the engines' decimal→double conversions can land on
ADJACENT doubles that format differently at 6dp (observed round 5:
7478912584.050000 vs .049999 on orders-priority sums at sf0.1). For sums
that can exceed ~4e9, emit an exact scaled INTEGER (e.g. cents as BIGINT)
instead of a descaled double — see sink_compact_small_files.
"""

from __future__ import annotations

_SCALE = 1_000_000


def dsum(expr: str, alias: str) -> str:
    """Order-independent 6dp-exact sum of a double expression (int64-scaled).

    Descale via DECIMAL division, NOT `round(double/1e6, 6)`: the scaled
    sum lands EXACTLY on a 6-decimal boundary, so the double division sits
    1 ulp from a rounding tie where Spark (BigDecimal HALF_UP on the exact
    binary expansion) and DuckDB (multiply-round-divide) systematically
    disagree — observed at sf0.1 (4373995120.140000 vs .140001). The
    decimal path is exact and converts to the identical nearest double in
    both engines. Runs once per group, so the per-row hot path (int64
    scale + sum, whole-stage codegen) is unchanged."""
    return (
        f"cast(cast(sum(cast(round(({expr}) * {_SCALE}) as bigint)) as decimal(38,6))"
        f" / {_SCALE} as double) as {alias}"
    )


def davg(expr: str, alias: str, count_expr: str = "count(*)") -> str:
    """Order-independent 6dp-rounded mean (exact scaled sum / count).

    The exact-decimal descaled sum converts to an identical double in both
    engines (see dsum); dividing by the identical count and rounding a
    generic (non-boundary) double is then engine-stable."""
    return (
        f"round(cast(cast(sum(cast(round(({expr}) * {_SCALE}) as bigint)) as decimal(38,6))"
        f" / {_SCALE} as double) / {count_expr}, 6) as {alias}"
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


def davg_lnsafe(expr: str, alias: str, count_expr: str = "count(*)") -> str:
    """Order-independent mean for expressions built from ln() calls.

    libm ln is NOT guaranteed correctly rounded, so Spark (JVM Math.log)
    and DuckDB (C std::log) can differ by 1 ulp on identical arguments;
    at the davg 1e6 quantization a value sitting ~1e-15 from a .5e-6
    boundary then rounds to DIFFERENT integers and the exact sums diverge
    (observed round 5: text_bigram_logprob's 6th decimal at sf0.1, ~400k
    rows of distinct ln args). Quantizing per-row at 1e4 instead makes a
    boundary hit need ~1e-4-scale luck against a 1e-15 ulp — ~1e-11 per
    row — while the mean keeps 4 exact decimals, rounded once at 6dp."""
    return (
        f"round(cast(cast(sum(cast(round(({expr}) * 10000) as bigint)) as decimal(38,6))"
        f" / 10000 as double) / {count_expr}, 6) as {alias}"
    )
