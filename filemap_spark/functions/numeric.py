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


def quant_pos_fixed(expr: str) -> str:
    """Fast per-row µ-unit quantization for NONNEGATIVE exact-decimal
    measures: `cast(x*1e6 + 0.5 as bigint)` (truncation) instead of
    `cast(round(x*1e6) as bigint)`.

    Why: Spark's Round on a double routes through BigDecimal.valueOf —
    measured 2.2× slower end-to-end on the pricing flagship's 5-measure
    pre-projection (0.76 s vs 0.34 s warm at sf0.1). The +0.5-truncate
    form stays in pure double/int64 codegen.

    PRECONDITION (caller must prove, per column): x ≥ 0 and x's TRUE value
    is an exact decimal of ≤ 6 places with |x*1e6| ≤ ~1e13 — i.e. currency
    /quantity/rate columns and their ≤3-factor products (2dp × 2dp × 2dp =
    6dp). Then the computed double x*1e6 sits within ≪ 0.5 of the integer
    k = x·1e6 (relative FP error ≤ ~6·2^-52 over the product chain, so
    absolute error ≤ 1e13·1.3e-15 ≈ 0.013), and EVERY nearest-integer
    method — this truncation, Spark's BigDecimal round, DuckDB's binary
    round — yields exactly k. The paired DuckDB oracle keeps the
    `round(x*1e6)` spelling; equality on this data class is by the above
    argument, pinned empirically by tests/test_kernels.py and the
    differential contract suite at sf0.001/0.01/0.1.

    Do NOT use for: signed columns (truncation goes toward zero), free
    doubles (ln outputs, norms — a true mid-cell value flips), or measures
    with > 6 decimal places. Those keep `round()` via dsum/davg."""
    return f"cast(({expr}) * {_SCALE} + 0.5d as bigint)"


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


def mean_micro_6dp(s: str, n: str) -> str:
    """Exact 6dp mean: round-half-away-from-zero of integer-micro sum `s`
    over count `n`, computed ENTIRELY in integer arithmetic, then descaled
    via the dsum decimal path.

    Why not `round(double_sum / n, 6)`: when s/n lands EXACTLY on a
    half-micro boundary (hypothesis round 6 found s=396230130000, n=96 →
    4127397187.5 µ-units), the quotient double's shortest repr ends in
    ".5" and the engines' round() split — Spark's Round goes through
    BigDecimal.valueOf (the shortest STRING, sees the literal .5, HALF_UP
    → up) while DuckDB rounds the BINARY value (1/2 ulp below the tie →
    down). Here the tie is decided by `2*|s % n| >= n` — pure int64, same
    both engines (% is C-style truncating in both, verified), half-away
    matches round()'s positive/negative behavior.

    The truncating quotient is spelled `(s - s%n) / n`: the numerator is
    an EXACT multiple of n, so the double division is exact (both
    operands ≤ the documented ~4e15 dsum ceiling < 2^53) — no `div`/`//`
    needed (the two engines spell integer division differently).
    DuckDB capacity note: sum(BIGINT) is HUGEINT there; all the integer
    ops below are hugeint-safe and the only double conversion is the
    exact-multiple quotient."""
    return (
        f"cast(cast((cast((({s}) - (({s}) % ({n}))) / ({n}) as bigint)"
        f" + (case when 2*abs(({s}) % ({n})) >= ({n})"
        f" then (case when ({s}) < 0 then -1 else 1 end) else 0 end))"
        f" as decimal(38,6)) / {_SCALE} as double)"
    )


def davg(expr: str, alias: str, count_expr: str = "count(*)") -> str:
    """Order-independent 6dp-exact mean (exact scaled sum / count).

    Round 6: the division AND the 6dp rounding both happen in exact
    integer arithmetic (see mean_micro_6dp) — the earlier
    `round(double/count, 6)` spelling was engine-divergent exactly on
    half-micro ties."""
    s = f"sum(cast(round(({expr}) * {_SCALE}) as bigint))"
    return f"{mean_micro_6dp(s, count_expr)} as {alias}"


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
    row — while the mean keeps 4 exact decimals, rounded once at 6dp.

    Round 6: the final 6dp rounding uses the same exact-integer tie rule
    as davg (mean_micro_6dp over the 1e4 sum promoted to µ-units; the
    ×100 promotion keeps hugeint/int64 exactness to ~9e15 µ-units — far
    past any |ln| ≤ 20 workload)."""
    s = f"(100 * sum(cast(round(({expr}) * 10000) as bigint)))"
    return f"{mean_micro_6dp(s, count_expr)} as {alias}"


def round6_half_away(expr: str) -> str:
    """Deterministic 6dp rounding of a DOUBLE expression — half away from
    zero, spelled in pure IEEE ops that are bit-identical across engines
    on identical inputs (×1e6 and +0.5 are correctly rounded, floor is
    exact, the final /1e6 is correctly rounded).

    Replaces `round(x, 6)` where x is an engine-identical double QUOTIENT
    (exact-integer numerator over a non-power-of-10 divisor): Spark's
    Round routes through BigDecimal.valueOf — the double's SHORTEST
    string — and HALF_UPs a literal trailing '.5' that DuckDB's
    binary-value round sees as just below the tie, yielding ADJACENT 6dp
    outputs on the SAME double (hypothesis-found round 16:
    `covar_samp` 526698.486863 Spark vs ...862 DuckDB — the quotient's
    shortest repr was exactly ...4868625). Here the tie is decided by
    +0.5-then-floor on the binary value, identically in both engines;
    the result differs from either engine's round() by at most one
    µ-unit AT an exact shortest-repr tie, and — the property that
    matters — never differs BETWEEN them.

    PRECONDITION: |x| ≤ ~9e9 (so x·1e6 stays within int64/2^53 — the
    same magnitude ceiling the module header documents for 6dp hash
    stability). Spark's floor(double) returns BIGINT, DuckDB's returns
    DOUBLE; both are exact integer values ≤ 2^53, and the final division
    converts them to the identical double — the divisor is an explicit
    cast-to-double because a bare `1000000.0` literal is DECIMAL in
    Spark, which would drag the bigint floor into decimal division and
    change the OUTPUT TYPE (9-scale decimal vs double)."""
    return (
        f"(case when ({expr}) < 0"
        f" then -floor(-({expr}) * 1000000.0 + 0.5)"
        f" else floor(({expr}) * 1000000.0 + 0.5) end)"
        f" / cast(1000000 as double)"
    )
