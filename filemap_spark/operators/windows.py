"""§2.5 Window functions.

No filemap analogue — the reference would sort a bucket file and walk it with
awk state (SURVEY §2.5 [K]). Spark windows shuffle once on the partition key
and then evaluate all frames in a single sorted pass per partition; at scale
the thing to avoid is a window with no partitionBy (single-task sort). As of
round 7 NO op here plans one: `win_ntile` and `win_percent_rank_cume` route
through the distributed range-exchange decomposition (functions/ranks.py),
and scripts/plan_audit.py rejects any unpartitioned data-sized WindowExec.

Determinism: every orderBy carries a full tiebreak chain (FIXTURES.md trap
#4); running double sums round at 6dp with per-frame magnitudes far below
the accumulation-noise threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from filemap_spark.io import EVENTS_NORM_SQL, load_table
from filemap_spark.registry import query


@query(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical per-group top-k."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 6).alias("o_totalprice"), "rn")
        .orderBy("o_custkey", "rn")
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS rnk,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk
    FROM part ORDER BY p_brand, p_partkey
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank with real ties (p_size is a small int domain);
    rank values depend only on the sort key, so ties stay deterministic."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size")
    return part.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).orderBy("p_brand", "p_partkey")


@query(
    "win_ntile",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 6) AS c_acctbal,
           ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer ORDER BY c_custkey
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing by account balance (full tiebreak → deterministic).

    Round 7: routed through the distributed range-exchange decomposition
    (functions/ranks.with_global_ntile) instead of `ntile(4) OVER (ORDER
    BY ...)` with no PARTITION BY — the unpartitioned window form funnels
    every row through ONE task, which dies at fact scale. The
    decomposition is result-identical (tile arithmetic on the exact global
    rank; equivalence pytest in tests/test_kernels.py), so the oracle SQL
    keeps the plain window form.

    10× replica smoke (SCALE.md, round 9): 1.8× wall for 10× rows and 10×
    output, max range-partition 5,223 of 150k rows — per-task state is
    the range slice (~n/32), never the table."""
    from filemap_spark.functions.ranks import with_global_ntile

    customer = load_table(spark, sf_dir, "customer")
    return (
        with_global_ntile(
            customer, 4, "c_acctbal", "c_custkey", tile_col="quartile"
        )
        .select(
            "c_custkey",
            F.round("c_acctbal", 6).alias("c_acctbal"),
            "quartile",
        )
        .orderBy("c_custkey")
    )


@query(
    "win_lag_lead",
    oracle=EVENTS_NORM_SQL
    + """
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap via lag; next event type via lead. Gaps are
    integer microseconds (bigint) to dodge float/timestamp formatting."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    ).orderBy("user_id", "event_id")


@query(
    "win_running_sum",
    oracle=EVENTS_NORM_SQL
    + """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 6) AS running_value
    FROM events ORDER BY user_id, event_id
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user sum (ROWS UNBOUNDED PRECEDING)."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 6).alias("running_value")
    ).orderBy("user_id", "event_id")


@query(
    "win_moving_avg",
    oracle=EVENTS_NORM_SQL
    + """
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS avg7
    FROM events ORDER BY user_id, event_id
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average per user."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(-6, 0)
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("avg7")
    ).orderBy("user_id", "event_id")


@query(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id, round(value, 6) AS value,
           count(*) OVER w AS n_in_band,
           round(sum(value) OVER w, 6) AS sum_in_band
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value
                 RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame (value-band aggregation). RANGE peers are defined
    by the value alone, so no tiebreak is needed for determinism."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value").rangeBetween(-10, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
        F.count("*").over(w).alias("n_in_band"),
        F.round(F.sum("value").over(w), 6).alias("sum_in_band"),
    ).orderBy("user_id", "event_id")


@query(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey) OVER w AS priciest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with the explicit full frame — the classic trap
    is last_value over the default frame (ends at CURRENT ROW); both engines
    share it, fixed identically with UNBOUNDED FOLLOWING."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w).alias("priciest_order"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "win_percent_rank_cume",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
           round(cume_dist() OVER (ORDER BY c_acctbal, c_custkey), 6) AS cume,
           ntile(100) OVER (ORDER BY c_acctbal, c_custkey) AS centile
    FROM customer ORDER BY c_custkey
    """,
)
def win_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks over the whole table.

    Round 7: the last unpartitioned-window op, migrated to the
    range-exchange decomposition (functions/ranks). The ORDER BY carries a
    full tiebreak (c_acctbal, c_custkey), so the order is TOTAL and
    rank == row_number; then percent_rank = (rank-1)/(n-1), cume_dist =
    rank/n, and ntile(100) is ntile_expr's arithmetic on (rank, n) — one
    range exchange serves all three. Result-identical to the window form
    (the oracle SQL keeps it), distributed instead of single-task.

    10× replica smoke (SCALE.md, round 9): 2.5× wall for 10× rows and 10×
    output, max range-partition 5,223 of 150k rows — the balanced-slice
    bound of the decomposition holds."""
    from filemap_spark.functions.ranks import ntile_expr, with_global_rank

    customer = load_table(spark, sf_dir, "customer")
    ranked = with_global_rank(
        customer, "c_acctbal", "c_custkey",
        rank_col="_rk", total_col="_n",
    )
    r, n = F.col("_rk"), F.col("_n")
    pct = F.when(n > 1, (r - 1) / (n - 1)).otherwise(F.lit(0.0))
    return ranked.select(
        "c_custkey",
        F.round(pct, 6).alias("pct_rank"),
        F.round(r / n, 6).alias("cume"),
        ntile_expr("_rk", "_n", 100).alias("centile"),
    ).orderBy("c_custkey")


@query(
    "win_gaps_islands",
    oracle=EVENTS_NORM_SQL
    + """
    , days AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_num FROM events
    ), marked AS (
      SELECT user_id, day_num,
             day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num) AS island
      FROM days
    )
    SELECT user_id, cast(min(day_num) AS bigint) AS start_day,
           cast(max(day_num) AS bigint) AS end_day,
           cast(count(*) AS bigint) AS n_days
    FROM marked GROUP BY user_id, island
    ORDER BY user_id, start_day
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: runs of consecutive active days per user (classic
    sessionization-by-calendar). day_num − row_number is constant within a
    consecutive run, so one window + one agg finds every island — no
    self-join, one shuffle on the user key."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id", (F.unix_micros("ts") / 86_400_000_000).cast("long").alias("day_num")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    marked = days.withColumn("island", F.col("day_num") - F.row_number().over(w))
    return (
        marked.groupBy("user_id", "island")
        .agg(
            F.min("day_num").alias("start_day"),
            F.max("day_num").alias("end_day"),
            F.count("*").alias("n_days"),
        )
        .select("user_id", "start_day", "end_day", "n_days")
        .orderBy("user_id", "start_day")
    )


# Shared Spark/DuckDB lambda body for the EWMA fold — literals cast to
# double explicitly so neither engine routes a step through DECIMAL.
_EWMA_STEP = "(acc, x) -> acc * cast(0.8 as double) + x * cast(0.2 as double)"


@query(
    "win_ewma",
    oracle=EVENTS_NORM_SQL
    + f"""
    SELECT user_id,
           cast(count(*) AS bigint) AS n_events,
           round(list_reduce(
             list_prepend(0.0, list_transform(
               array_agg(value ORDER BY ts, event_id),
               v -> cast(v AS double))),
             {_EWMA_STEP}), 6) AS ewma
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    cost=0.6,
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of `value` (final
    state, alpha=0.2) — the canonical RECURSIVE per-key computation that no
    SQL window frame can express (each step depends on the previous
    accumulator, not on a fixed frame of rows). Expressed as a sequential
    array fold: collect the user's events in total (ts, event_id) order,
    then `aggregate` left-folds the identical double arithmetic in both
    engines — bit-reproducible because the fold order is total and every
    step is the same two IEEE ops on the same operands.

    Scale: one shuffle on user_id; state per group is the user's event
    array (bounded by per-user activity — the same bound every per-user
    window op here carries). For keys whose history can't sit in one
    array, the same fold runs as an applyInPandas running state or the
    streaming applyInPandasWithState form (tests/test_streaming.py) —
    fold semantics unchanged."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.expr(
                "round(aggregate(transform(array_sort("
                "collect_list(struct(ts_us, event_id, value))),"
                " s -> cast(s.value as double)), cast(0.0 as double), "
                f"{_EWMA_STEP}), 6)"
            ).alias("ewma"),
        )
        .orderBy("user_id")
    )


@query(
    "win_moving_median",
    oracle=EVENTS_NORM_SQL
    + """
    SELECT event_id, user_id,
           round(quantile_cont(v, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM (SELECT *, cast(value AS double) AS v FROM events)
    ORDER BY user_id, event_id
    """,
    cost=0.5,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row sliding exact MEDIAN per user (round 5) — the robust companion
    to `win_moving_avg`: one outlier event drags a 7-row mean by 1/7 of its
    magnitude but cannot move the median at all, which is what you want
    smoothing metric streams that contain error spikes.

    Spark's `median` aggregate rejects window frames; `percentile(v, 0.5)`
    is the frame-capable spelling and matches DuckDB's `quantile_cont`
    interpolation exactly (even-count frames average the two middle values
    — an IEEE-exact (a+b)/2 in both engines, probed cross-engine on a
    shared fixture before this op landed).

    Scale: one shuffle on user_id, then a sorted per-partition pass; the
    7-row frame keeps per-row median state O(frame), so cost is linear in
    rows regardless of corpus size — same plan shape as win_moving_avg."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(-6, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("med7"),
    ).orderBy("user_id", "event_id")


@query(
    "win_cumulative_distinct",
    oracle=EVENTS_NORM_SQL
    + """
    SELECT event_id, user_id,
           cast(sum(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS bigint)
             AS distinct_types_so_far
    FROM (SELECT *,
                 CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY event_type, ts, event_id) IS DISTINCT FROM event_type
                      THEN 1 ELSE 0 END AS is_first
          FROM events)
    ORDER BY user_id, event_id
    """,
    cost=0.5,
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per user (round 5): how many distinct event
    types has this user touched as of each event — the engagement-breadth
    curve behind activation funnels.

    Neither Spark nor DuckDB (nor the SQL standard) allows
    `count(DISTINCT x) OVER (... ROWS ...)`; the decomposition is two
    plain windows: flag each row that is the FIRST occurrence of its
    (user, type), then running-sum the flags per user in time order.
    The flag window deliberately partitions by user_id ALONE (ordering by
    type, then time — a type's first row in that order is its first
    occurrence, exposed by one lag compare) instead of the textbook
    row_number over (user, type): both windows then share the user_id
    hash partitioning, so the plan carries ONE Exchange and two sorts
    rather than two full shuffles — the difference between 1× and 2×
    network traffic on a 100 TB event log.

    Scale: one user_id exchange, two sorted passes, O(1) window state per
    row; no joins, no distinct aggregation."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w_type = Window.partitionBy("user_id").orderBy("event_type", "ts_us", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_first = F.when(
        ~F.lag("event_type").over(w_type).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    return (
        ev.withColumn("is_first", is_first)
        .select(
            "event_id",
            "user_id",
            F.sum("is_first").over(w_run).cast("bigint").alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_moving_minmax",
    oracle=EVENTS_NORM_SQL
    + """
    SELECT event_id, user_id,
           cast(count(*) OVER w AS bigint) AS n_in_frame,
           round(min(value) OVER w, 6) AS frame_min,
           round(max(value) OVER w, 6) AS frame_max,
           round(max(value) OVER w - min(value) OVER w, 6) AS frame_range
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    cost=0.4,
)
def win_moving_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding extrema per key (round 6): 4-row rolling min/max/range —
    the envelope under Bollinger-style band checks and sensor spike
    masks, and the one rolling statistic win_moving_avg/median don't
    cover. min/max are ORDER-FREE over the frame (unlike a rolling sum),
    so the doubles are engine-exact with no quantization needed; the
    range subtracts the two identical doubles once.

    Scale: one user_id exchange shared by all four frame functions
    (single WindowExec), O(frame) state per row."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(-3, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_in_frame"),
        F.round(F.min("value").over(w), 6).alias("frame_min"),
        F.round(F.max("value").over(w), 6).alias("frame_max"),
        F.round(F.max("value").over(w) - F.min("value").over(w), 6).alias(
            "frame_range"
        ),
    ).orderBy("user_id", "event_id")


@query(
    "win_drawdown",
    oracle=EVENTS_NORM_SQL
    + """
    , q AS (
      SELECT event_id, user_id, ts,
             cast(round(value * 1000000) AS bigint) AS v_u
      FROM events
    ), p AS (
      SELECT event_id, user_id, v_u,
             max(v_u) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS peak_u
      FROM q
    )
    SELECT event_id, user_id,
           cast(cast(v_u AS decimal(38,6)) / 1000000 AS double) AS value_q,
           cast(cast(peak_u AS decimal(38,6)) / 1000000 AS double) AS peak_q,
           cast(cast(peak_u - v_u AS decimal(38,6)) / 1000000 AS double)
             AS drawdown,
           cast(CASE WHEN v_u = peak_u THEN 1 ELSE 0 END AS int) AS at_peak
    FROM p ORDER BY user_id, event_id
    """,
    cost=0.4,
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown per key (round 6): for each event, the
    running maximum of `value` so far (unbounded-preceding frame) and the
    gap back down to the current value — the monitoring primitive behind
    high-water-mark alerts, loss-curve regression detection, and
    financial max-drawdown. Completes the frame-shape family: moving_*
    cover bounded trailing frames, running_sum covers the cumulative sum;
    this is the cumulative EXTREMUM plus a derived difference.

    Numeric discipline: `value` is quantized to int64 micro-units BEFORE
    the window, so the running max, the peak-minus-current difference,
    and the at-peak equality are all exact integer arithmetic; the only
    double conversions are three exact decimal descales (dsum path,
    functions/numeric.py) — no round()-tie surface at all.

    Scale: one user_id exchange, a single WindowExec evaluating one
    running-max frame with O(1) state per row (max over an ever-growing
    prefix needs no buffer, unlike moving_median); derived columns are
    post-window codegen projections. Survives 100x: per-key state is a
    single int64 regardless of history length."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    q = ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.expr("cast(round(value * 1000000) as bigint)").alias("v_u"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def descale(c: str) -> str:
        return f"cast(cast({c} as decimal(38,6)) / 1000000 as double)"

    return (
        q.withColumn("peak_u", F.max("v_u").over(w))
        .select(
            "event_id",
            "user_id",
            F.expr(descale("v_u")).alias("value_q"),
            F.expr(descale("peak_u")).alias("peak_q"),
            F.expr(descale("peak_u - v_u")).alias("drawdown"),
            F.when(F.col("v_u") == F.col("peak_u"), 1)
            .otherwise(0)
            .cast("int")
            .alias("at_peak"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "win_rolling_zscore",
    oracle=EVENTS_NORM_SQL
    + """
    , v AS (
      SELECT event_type, event_id, epoch_us(ts) AS ts_us,
             round(value, 6) AS value,
             cast(round(value * 100) AS bigint) AS vc
      FROM events
    ), f AS (
      SELECT event_type, event_id, ts_us, value, vc,
             count(*) OVER w AS n,
             sum(vc) OVER w AS s,
             sum(vc * vc) OVER w AS ss
      FROM v
      WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id, ts_us, value,
           cast(n AS bigint) AS n_window,
           CASE WHEN n >= 2 AND n * ss - s * s > 0
                THEN round(cast(n * vc - s AS double)
                           / sqrt(cast(n * ss - s * s AS double)
                                  * cast(n AS double)
                                  / cast(n - 1 AS double)), 6)
                ELSE NULL END AS zscore
    FROM f ORDER BY event_type, ts_us, event_id
    """,
    cost=0.6,
)
def win_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window standardization (round 6, staged r7): each event's
    z-score against the trailing 20-observation mean/stddev of its own
    event type — the adaptive-threshold primitive behind drift-aware
    alerting (a fixed global threshold goes stale; a rolling one tracks
    regime changes). Completes the rolling family: moving_avg (level),
    moving_median (robust level), moving_minmax (envelope), EWMA (decay) —
    this one is SPREAD-normalized deviation.

    Determinism: values are exact 2dp → exact int64 centi-units; the frame
    aggregates (n, Σv, Σv²) are integer-exact (vc ≤ 49102 ⇒ Σvc² over 20
    rows ≤ 4.9e10), and the z-score is evaluated as the closed form
    (n·vc − s) / sqrt((n·ss − s²) · n / (n−1)) — every operand an exact
    integer, then three IEEE ops — so both engines land on the identical
    double. The sample-stddev form (n−1) matches stddev_samp; frames with
    n < 2 or zero variance yield NULL, decided by an exact integer test
    (no FP boundary).

    Scale: ONE exchange on event_type, one sorted pass per partition —
    the three frame aggregates share the frame buffer. At 100 TB,
    partition by (entity, coarse time bucket) instead of bare type to
    bound per-key volume — the 19-row frame only needs a 19-row carry
    across bucket seams."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 6).alias("value"),
        F.expr("cast(round(value * 100) as bigint)").alias("vc"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    f = v.select(
        "event_type",
        "event_id",
        "ts_us",
        "value",
        "vc",
        F.count("*").over(w).alias("n"),
        F.sum("vc").over(w).alias("s"),
        F.sum(F.col("vc") * F.col("vc")).over(w).alias("ss"),
    )
    n, s, ss, vc = F.col("n"), F.col("s"), F.col("ss"), F.col("vc")
    var_num = n * ss - s * s
    z = F.round(
        (n * vc - s).cast("double")
        / F.sqrt(
            var_num.cast("double") * n.cast("double") / (n - 1).cast("double")
        ),
        6,
    )
    return (
        f.select(
            "event_type",
            "event_id",
            "ts_us",
            "value",
            n.cast("bigint").alias("n_window"),
            F.when((n >= 2) & (var_num > 0), z).otherwise(F.lit(None)).alias(
                "zscore"
            ),
        )
        .orderBy("event_type", "ts_us", "event_id")
    )


@query(
    "win_pareto_share",
    oracle="""
    WITH sp AS (
      SELECT o_custkey AS custkey,
             sum(cast(round(o_totalprice * 1000000) AS bigint)) AS spend
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT custkey, spend,
             row_number() OVER (ORDER BY spend DESC, custkey) AS rnk,
             sum(spend) OVER (ORDER BY spend DESC, custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_spend,
             sum(spend) OVER () AS total
      FROM sp
    )
    SELECT custkey, cast(rnk AS bigint) AS rnk,
           cast(cum_spend AS bigint) AS cum_spend_micro,
           cast(cum_spend AS double) / cast(total AS double) AS cum_share
    FROM ranked
    """,
    cost=0.5,
)
def win_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration curve (round 6, staged r7): customers ranked by
    total spend, each with its exact global rank and RUNNING share of all
    revenue — the "what fraction of customers produce 80% of revenue"
    curve. The hard part at scale is the unpartitioned running sum: Spark
    would move every customer to one task. This op runs it via
    with_global_cumsum (functions/ranks.py) — the prefix-sum twin of the
    exact-rank decomposition: range-exchange on the order key, partition-
    local cumsum, plus a bounded (numPartitions-row) broadcast of earlier
    partitions' totals. Semantics are IDENTICAL to the window form the
    oracle uses.

    Determinism: spend is an exact µ-unit int64, so the prefix-sum
    reassociation across partitions is exact (integer addition is
    associative — the reason the helper requires integer values); the
    share is a raw IEEE quotient; the (spend DESC, custkey) order is total
    via the negated-micro trick.

    Scale: orders reduce map-side per customer; then ONE range exchange —
    the same plan ntile/rank use; no single-partition window anywhere.
    10× replica smoke (SCALE.md, round 9): 2.0× wall for 10× rows and 10×
    output, max range-partition 5,232 of ~150k customers."""
    from filemap_spark.functions.ranks import with_global_cumsum

    sp = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 1000000) as bigint))"
            ).alias("spend")
        )
        .withColumn("neg_spend", -F.col("spend"))
    )
    summed = with_global_cumsum(
        sp, "spend", "neg_spend", "custkey",
        cumsum_col="cum_spend", total_col="total", rank_col="rnk",
    )
    return summed.select(
        "custkey",
        F.col("rnk").cast("bigint").alias("rnk"),
        F.col("cum_spend").cast("bigint").alias("cum_spend_micro"),
        (
            F.col("cum_spend").cast("double") / F.col("total").cast("double")
        ).alias("cum_share"),
    )


@query(
    "win_interval_coalesce",
    oracle=EVENTS_NORM_SQL
    + """,
    iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + 600000000 AS e
      FROM events
    ), marked AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       >= s
                  THEN 0 ELSE 1 END AS is_new
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), merged AS (
      SELECT user_id, island, count(*) AS n_events,
             min(s) AS m_start, max(e) AS m_end
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, cast(count(*) AS bigint) AS n_intervals,
           cast(sum(n_events) AS bigint) AS n_events,
           cast(sum(m_end - m_start) AS bigint) AS covered_us,
           cast(max(m_end - m_start) AS bigint) AS max_span_us
    FROM merged GROUP BY user_id
    """,
    cost=0.4,
)
def win_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing / span merge (round 6, staged r7): each event
    opens a 10-minute activity interval; overlapping or touching intervals
    per user merge into maximal spans (the classic "merge bookings" /
    genomics `bedtools merge` primitive — the coalescing twin of
    win_gaps_islands, which segments by GAP where this unions by OVERLAP).
    Emits per-user merged-span count, total covered µs, and longest span.

    Mechanics: the sorted-island decomposition — a span begins exactly
    where the running max of prior interval ENDS falls short of the
    current START (touching, >=, merges); a per-user running sum of those
    begin-flags names each island, and per-island min(start)/max(end) are
    the merged bounds. Two stacked per-user window passes + two hash aggs,
    all exact int64 µs arithmetic.

    Determinism: (s, event_id) is a total order (FIXTURES trap #4: ties in
    s are real); BOTH window passes order by it — the begin-flags and the
    island labels are then functions of the same fixed walk, so both
    engines assign identical islands; all arithmetic is exact int64 µs.

    Scale: both windows and both aggregates key on user_id — ONE exchange
    reused end-to-end, no single-partition window; per-user state is the
    sorted event run (spillable sort, O(1) frame). 100 TB posture: works
    per key regardless of corpus size; a pathological single hot user is
    the only skew surface (same as any per-entity sessionization)."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 600_000_000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "is_new",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.withColumn("island", F.sum("is_new").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("n_events"),
        F.min("s").alias("m_start"),
        F.max("e").alias("m_end"),
    )
    return merged.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum(F.col("m_end") - F.col("m_start")).cast("bigint").alias("covered_us"),
        F.max(F.col("m_end") - F.col("m_start")).cast("bigint").alias("max_span_us"),
    )


@query(
    "win_concurrency_peak",
    oracle=EVENTS_NORM_SQL
    + """,
    iv AS (
      SELECT event_type, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + 600000000 AS e
      FROM events
    ), deltas AS (
      SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta, event_id FROM iv
    ), sweep AS (
      SELECT event_type, t,
             sum(delta) OVER (PARTITION BY event_type
                              ORDER BY t, delta, event_id
                              ROWS UNBOUNDED PRECEDING) AS run
      FROM deltas
    ), peaked AS (
      SELECT event_type, t, run,
             max(run) OVER (PARTITION BY event_type) AS peak
      FROM sweep
    )
    SELECT event_type,
           cast(count(*) / 2 AS bigint) AS n_events,
           cast(max(peak) AS int) AS peak,
           cast(min(CASE WHEN run = peak THEN t END) AS bigint)
             AS t_at_peak_us
    FROM peaked GROUP BY event_type
    """,
    cost=0.5,
)
def win_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the sweep line (round 6, staged r7): each
    event opens a 10-minute interval; the maximum number simultaneously
    open per event type, and the earliest instant it is reached — the
    capacity-sizing primitive (max concurrent sessions/connections/jobs),
    the counting twin of win_interval_coalesce's span union.

    Mechanics: intervals explode to +1/-1 boundary deltas; a running sum
    over (t, delta, event_id) — closed-open semantics: at an exact
    touch the −1 sorts before the +1, so back-to-back intervals never
    double-count — is the live count; a stacked same-partition window
    takes the max, and one agg recovers the earliest argmax.

    Determinism: exact int64 µs and integer deltas over a total order;
    ties at the peak resolve by min(t).

    Scale: both windows and the agg key on event_type — ONE exchange;
    2 rows per event through it. A single type's sweep serializes per
    partition (inherent to running state); the with_global_cumsum
    decomposition (agg_ks_two_sample) is the swap when one key's
    timeline outgrows a task."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 600_000_000).alias("e"),
    )
    deltas = iv.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(
                    F.col("s").alias("t"),
                    F.lit(1).alias("delta"),
                    F.col("event_id").alias("event_id"),
                ),
                F.struct(
                    F.col("e").alias("t"),
                    F.lit(-1).alias("delta"),
                    F.col("event_id").alias("event_id"),
                ),
            )
        ).alias("d"),
    ).select("event_type", "d.t", "d.delta", "d.event_id")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    sweep = deltas.withColumn("run", F.sum("delta").over(w_run)).withColumn(
        "peak", F.max(F.sum("delta").over(w_run)).over(w_all)
    )
    return sweep.groupBy("event_type").agg(
        (F.count("*") / 2).cast("bigint").alias("n_events"),
        F.max("peak").cast("int").alias("peak"),
        F.min(F.when(F.col("run") == F.col("peak"), F.col("t")))
        .cast("bigint")
        .alias("t_at_peak_us"),
    )
