"""§2.3 Joins.

filemap joins by co-sorting text files and running `join(1)` per bucket
(SURVEY §1.1 [K]); Spark picks broadcast-hash vs shuffled sort-merge via
`JoinSelection` + AQE. Scale posture: dimension tables (region/nation/
customer at contract scale) get explicit `F.broadcast` hints so the fact
table never shuffles for star joins; theta-residual predicates ride on the
equi-key so the pure-theta nested-loop path is reserved for genuinely
non-equi conditions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from filemap_spark.functions.numeric import dsum
from filemap_spark.io import EVENTS_NORM_SQL, load_table, register_views
from filemap_spark.registry import query


@query(
    "join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join — filemap `join(1)` on sorted files; Spark chooses
    broadcast or sort-merge by size (AQE re-plans at runtime)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side join — filemap copies the small file to every node; Spark
    broadcasts the dim so the fact side never shuffles."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_urgent_orders
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
      ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer — filemap `join -a1`; unmatched rows surface as NULLs that
    count(col) then ignores."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_urgent_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_f_orders
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') o
      RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer — filemap `join -a2` (mirror of left)."""
    customer = load_table(spark, sf_dir, "customer")
    finished = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        finished.join(customer, finished.o_custkey == customer.c_custkey, "right")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_f_orders"))
    )


@query(
    "join_full_outer",
    oracle=f"""
    SELECT a.o_orderkey AS left_key, b.l_orderkey AS right_key,
           a.o_totalprice, b.sum_rev
    FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'P') a
    FULL JOIN (SELECT l_orderkey, {dsum('l_extendedprice', 'sum_rev')}
               FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey) b
      ON a.o_orderkey = b.l_orderkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer — filemap `join -a1 -a2`; both inputs filtered so both
    sides contribute unmatched rows."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = orders.where(F.col("o_orderstatus") == "P").select("o_orderkey", "o_totalprice")
    b = (
        li.where(F.col("l_quantity") > 45)
        .groupBy("l_orderkey")
        .agg(F.expr(dsum("l_extendedprice", "sum_rev")))
    )
    return a.join(b, a.o_orderkey == b.l_orderkey, "full").select(
        a.o_orderkey.alias("left_key"),
        b.l_orderkey.alias("right_key"),
        "o_totalprice",
        "sum_rev",
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join — customers having at least one pending order (filemap:
    `join | cut | sort -u`). No right columns, no row multiplication."""
    customer = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return customer.join(
        pending, customer.c_custkey == pending.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — customers with no pending order (filemap `join -v1`)."""
    customer = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return customer.join(
        pending, customer.c_custkey == pending.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (125 rows) — nested loop over two small files."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "join_theta_range",
    oracle=f"""
    SELECT p_brand, count(*) AS n_pairs,
           {dsum('l_extendedprice - p_retailprice', 'sum_margin')}
    FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_extendedprice > p_retailprice
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + non-equi residual — the residual rides the hash join as a
    post-filter, so no nested-loop blowup at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(
            part,
            (li.l_partkey == part.p_partkey) & (li.l_extendedprice > part.p_retailprice),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_pairs"),
            F.expr(dsum("l_extendedprice - p_retailprice", "sum_margin")),
        )
        .orderBy("p_brand")
    )


@query(
    "join_theta_pure",
    oracle="""
    SELECT n1.n_name AS a_name, n2.n_name AS b_name
    FROM nation n1 JOIN nation n2
      ON n1.n_nationkey < n2.n_nationkey AND n1.n_regionkey = n2.n_regionkey
    """,
)
def join_theta_pure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi pair generation (a<b within region) — broadcast
    nested-loop; only sane for small/filtered inputs, which Catalyst enforces
    by requiring a broadcastable side."""
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_nationkey") < F.col("n2.n_nationkey"))
        & (F.col("n1.n_regionkey") == F.col("n2.n_regionkey")),
    ).select(F.col("n1.n_name").alias("a_name"), F.col("n2.n_name").alias("b_name"))


@query(
    "join_multiway_star",
    oracle=f"""
    SELECT r_name, n_name, count(*) AS n_orders,
           {dsum('o_totalprice', 'sum_price')}
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join + rollup-grain agg — all dims broadcast, so the fact
    table streams through map-side joins with zero shuffle before the final
    two-key aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"), F.expr(dsum("o_totalprice", "sum_price")))
        .orderBy("r_name", "n_name")
    )


@query(
    "join_asof",
    oracle=EVENTS_NORM_SQL
    + """
    SELECT e.event_id, e.user_id, epoch_us(s.ts) AS signup_us
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — each event matched to the user's most recent signup at or
    before it. Spark has no native batch as-of (SURVEY §4.3.2): expressed as
    a running `max(ts where signup)` window over the event stream itself —
    one shuffle on user_id, no join at all, which also scales better than the
    sort-merge-asof a direct port would do."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    signup_ts = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts_us"))
    ).over(w)
    return ev.select("event_id", "user_id", signup_ts.alias("signup_us"))


@query(
    "join_self_sequential",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
           round(a.l_extendedprice + b.l_extendedprice, 6) AS pair_price
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber + 1 = b.l_linenumber
    """,
)
def join_self_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-line self join — filemap `paste` of consecutive lines; equi
    join on (orderkey, linenumber+1) stays a hash join."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", "l_linenumber", "l_extendedprice").alias("a")
    b = li.select("l_orderkey", "l_linenumber", "l_extendedprice").alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") + 1 == F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("ln_a"),
        F.col("b.l_linenumber").alias("ln_b"),
        F.round(F.col("a.l_extendedprice") + F.col("b.l_extendedprice"), 6).alias("pair_price"),
    )


@query(
    "join_snowflake_q5",
    oracle=f"""
    SELECT n_name, {dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           cast(count(*) AS bigint) AS n_lines
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey AND r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name ORDER BY n_name
    """,
)
def join_snowflake_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue per nation — the 6-table
    snowflake (two independent dim chains meeting at the fact table plus
    the customer-nation = supplier-nation residual).

    Scale: every true dim chain (supplier→nation→region, customer) is an
    explicit broadcast; orders is left UNHINTED — Catalyst auto-broadcasts
    it under the threshold at test scale, and at 100 TB AQE plans the
    lineitem⋈orders sort-merge on o_orderkey, the only unavoidable
    fact-fact shuffle. The region filter prunes before any join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              (li.l_suppkey == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "revenue")),
            F.count("*").alias("n_lines"),
        )
        .orderBy("n_name")
    )


@query(
    "join_interval_events",
    oracle=EVENTS_NORM_SQL
    + """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND epoch_us(p.ts) > epoch_us(c.ts)
     AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
    ORDER BY c.user_id, click_id, purchase_id
    """,
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: click→purchase attribution pairs where the
    purchase lands within 30 minutes after the click, per user.

    The equi-key (user_id) carries the shuffle; the time range is a
    residual predicate on the joined pairs, so the plan is a plain
    hash/sort-merge join per user — never a cross product. This batch form
    is exactly Spark's stream-stream inner join shape (equi key +
    event-time range), where the range bound doubles as the watermark
    state-eviction rule."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_us").alias("c_us")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("p_us"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_us") > F.col("c_us"))
            & (F.col("p_us") <= F.col("c_us") + 1_800_000_000),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (F.col("p_us") - F.col("c_us")).alias("lag_us"),
        )
        .orderBy("user_id", "click_id", "purchase_id")
    )


@query(
    "join_fuzzy_levenshtein",
    oracle="""
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           cast(levenshtein(a.c_name, b.c_name) AS int) AS dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY cust_a, cust_b
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join: near-identical customer names (edit distance ≤ 1)
    within a blocking key (nation). The equi-key carries the shuffle and
    bounds the candidate set to block-size² — the standard scalable
    fuzzy-matching layout (at 100 TB the block key is a cheap canopy like
    a name prefix or phonetic code); levenshtein runs JVM-side only on
    in-block pairs, never the global cross product."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    a = cust.alias("a")
    b = cust.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey"))
            & (dist <= 1),
        )
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            dist.cast("int").alias("dist"),
        )
        .orderBy("cust_a", "cust_b")
    )


@query(
    "join_shipping_priority_q3",
    oracle=f"""
    SELECT l_orderkey, {dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           epoch_us(o_orderdate) AS orderdate_us, o_orderpriority
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def join_shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one market
    segment — opposing date predicates on orders (placed before the cutoff)
    and lineitem (shipped after it), both pushed to their scans; the
    filtered customer segment broadcasts so lineitem only shuffles for the
    orders equi-join, and the top-10 collapses to TakeOrderedAndProject."""
    cutoff = F.lit("2000-03-15").cast("timestamp_ntz")
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(dsum("l_extendedprice * (1 - l_discount)", "revenue")))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "join_range_bucket",
    oracle=EVENTS_NORM_SQL
    + """
    SELECT a.event_id AS click_id,
           b.event_id AS purchase_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
    FROM events a JOIN events b
      ON epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    ORDER BY click_id, purchase_id
    """,
    cost=1.2,
)
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed RANGE join — the interval join with NO equi key (any click →
    any purchase within the next 30 minutes, across all users). Without a
    key, Spark's only native plan is a broadcast-nested-loop cross product —
    O(n·m) comparisons, the classic 100 TB killer. The scalable rewrite
    quantizes time into buckets the width of the range (30 min): a match
    can only land in the click's own bucket or the next one, so the probe
    side explodes to exactly those two bucket ids and the join becomes a
    plain hash equi-join on bucket, with the precise bound as a residual
    filter. 2x probe duplication buys an O(n+m) shuffle layout; each
    (click, purchase) pair survives in exactly one bucket cell, so no
    dedup pass is needed.

    Scale: shuffle keys are time buckets — at 100 TB add a coarse salt
    within hot buckets (functions/skew.salted_join composes) or widen the
    bucket to keep cells executor-sized; the plan stays a two-table hash
    join either way."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    width = 1_800_000_000  # 30 min in microseconds
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("ts_us").alias("c_us"))
        .withColumn("c_bucket", F.floor(F.col("c_us") / width))
        .select(
            "click_id",
            "c_us",
            F.explode(
                F.array(F.col("c_bucket"), F.col("c_bucket") + 1)
            ).alias("bucket"),
        )
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("ts_us").alias("p_us"))
        .withColumn("bucket", F.floor(F.col("p_us") / width))
    )
    return (
        clicks.join(purchases, "bucket")
        .where(
            (F.col("p_us") > F.col("c_us"))
            & (F.col("p_us") <= F.col("c_us") + width)
        )
        .select(
            "click_id",
            "purchase_id",
            (F.col("p_us") - F.col("c_us")).alias("lag_us"),
        )
        .orderBy("click_id", "purchase_id")
    )


@query(
    "join_asof_nearest",
    oracle=EVENTS_NORM_SQL
    + """
    , sig AS (SELECT user_id, epoch_us(ts) AS s_us FROM events
              WHERE event_type = 'signup'),
    e AS (SELECT user_id, event_id, epoch_us(ts) AS e_us FROM events
          WHERE event_type <> 'signup')
    SELECT e.user_id, e.event_id,
           s_us AS nearest_signup_us,
           abs(e_us - s_us) AS abs_lag_us
    FROM e JOIN sig USING (user_id)
    QUALIFY row_number() OVER (PARTITION BY e.user_id, e.event_id
                               ORDER BY abs(e_us - s_us), s_us) = 1
    ORDER BY user_id, event_id
    """,
    cost=0.7,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIDIRECTIONAL as-of join: each non-signup event matched to its
    temporally NEAREST same-user signup, before OR after (join_asof is the
    backward-only variant; 'nearest' is what feature pipelines want for
    enrichment around an anchor event). Tie rule: equidistant signups
    resolve to the earlier one.

    The Spark plan is the union-tag window trick run in BOTH directions —
    conditional `last(ignorenulls)` up to the current row gives the prior
    signup, conditional `first(ignorenulls)` from the current row the next
    one; a CASE picks the nearer. One shuffle on user, one sort, zero
    join — O(n log n) however dense the signups. The oracle deliberately
    takes the OTHER plan (quadratic per-user join + QUALIFY), so the two
    sides share no structure — a real differential check of the window
    encoding, including the equal-timestamp and equidistant edge cases."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    sig_ts = F.when(F.col("event_type") == "signup", F.col("ts_us"))
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_prior = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.last(sig_ts, ignorenulls=True).over(w_prior).alias("prior_us"),
        F.first(sig_ts, ignorenulls=True).over(w_next).alias("next_us"),
    )
    pick_prior = F.col("prior_us").isNotNull() & (
        F.col("next_us").isNull()
        | (
            (F.col("ts_us") - F.col("prior_us"))
            <= (F.col("next_us") - F.col("ts_us"))
        )
    )
    nearest = F.when(pick_prior, F.col("prior_us")).otherwise(F.col("next_us"))
    return (
        tagged.where(F.col("event_type") != "signup")
        .select(
            "user_id",
            "event_id",
            nearest.alias("nearest_signup_us"),
            F.abs(F.col("ts_us") - nearest).alias("abs_lag_us"),
        )
        .where(F.col("nearest_signup_us").isNotNull())
        .orderBy("user_id", "event_id")
    )


@query(
    "join_skew_salted",
    cost=0.8,
    oracle=f"""
    SELECT p.p_brand,
           cast(count(*) AS bigint) AS n_items,
           cast(sum(l.l_quantity) AS bigint) AS sum_qty,
           {dsum('l.l_extendedprice', 'sum_price')}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact-to-dim equi-join as a GRADED operator: the fact side
    scatters across 8 salt sub-keys by a deterministic row-content hash
    and the dim side replicates once per salt (functions/skew.salted_join)
    — turning one hot-key reducer into 8 evenly-loaded ones when a key
    floods a shuffled join. The oracle is the PLAIN join + aggregate:
    salting must be invisible in the result (row multiset identical), so
    an off-by-one in salt replication or a dropped sub-key mismatches.

    Scale: the trade is a salts× blow-up of the DIM side only — the
    standard move when the dim is too big (or the join type wrong) for a
    broadcast and one fact key dominates; AQE's skew-join split only
    covers sort-merge joins, so the pre-planned salt stays relevant.
    tests/test_skew.py pins the helper's multiset equality; the plan test
    pins the salt replication shape."""
    from filemap_spark.functions.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, part, "p_partkey", salts=8)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.expr(dsum("l_extendedprice", "sum_price")),
        )
        .orderBy("p_brand")
    )


@query(
    "join_point_in_time_scd2",
    oracle="""
    WITH dim AS (
      SELECT s_suppkey, v AS version,
             CASE v WHEN 1 THEN TIMESTAMP '1990-01-01'
                    WHEN 2 THEN TIMESTAMP '1996-01-01'
                           + to_days(CAST(s_suppkey % 365 AS INT))
                    ELSE TIMESTAMP '1998-07-01'
                         + to_days(CAST(s_suppkey % 365 AS INT)) END AS valid_from,
             CASE v WHEN 1 THEN TIMESTAMP '1996-01-01'
                           + to_days(CAST(s_suppkey % 365 AS INT))
                    WHEN 2 THEN TIMESTAMP '1998-07-01'
                           + to_days(CAST(s_suppkey % 365 AS INT))
                    ELSE TIMESTAMP '9999-01-01' END AS valid_to
      FROM supplier CROSS JOIN (SELECT unnest([1, 2, 3]) AS v)
    )
    SELECT d.version, count(*) AS n_items,
           cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty,
           count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem l
    JOIN dim d ON l.l_suppkey = d.s_suppkey
              AND l.l_shipdate >= d.valid_from AND l.l_shipdate < d.valid_to
    GROUP BY d.version ORDER BY d.version
    """,
    cost=0.8,
)
def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD Type-2 dimension join (round 5) — the warehouse
    correctness classic: a slowly-changing dimension keeps one row PER
    VERSION with [valid_from, valid_to) intervals, and every fact row must
    join to the version that was in force at ITS OWN timestamp, never
    "latest wins". Three versions per supplier are manufactured with
    per-supplier staggered boundaries (the corpus ships no versioned dim);
    each lineitem matches exactly one version at its shipdate — half-open
    intervals make the boundaries airtight. Graded as the per-version
    rollup so a single misattributed row mismatches.

    Scale: this is an EQUI-join on the dimension key with the interval
    predicate as a cheap residual — never a range-only join: Spark plans
    hash/sort-merge on s_suppkey (or broadcasts the dim, here 3×|supplier|
    rows), and the residual filters in the join's generated code. The
    version explosion stays on the DIM side (tiny), the fact never
    duplicates."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    stagger = F.col("s_suppkey") % 365
    b1 = F.expr("TIMESTAMP '1996-01-01'") + F.make_dt_interval(days=stagger)
    b2 = F.expr("TIMESTAMP '1998-07-01'") + F.make_dt_interval(days=stagger)
    dim = (
        supp.withColumn("version", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))))
        .withColumn(
            "valid_from",
            F.when(F.col("version") == 1, F.expr("TIMESTAMP '1990-01-01'"))
            .when(F.col("version") == 2, b1)
            .otherwise(b2),
        )
        .withColumn(
            "valid_to",
            F.when(F.col("version") == 1, b1)
            .when(F.col("version") == 2, b2)
            .otherwise(F.expr("TIMESTAMP '9999-01-01'")),
        )
    )
    joined = li.join(
        dim,
        (F.col("l_suppkey") == F.col("s_suppkey"))
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("l_shipdate") < F.col("valid_to")),
    )
    return (
        joined.groupBy("version")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
        .orderBy("version")
    )


@query(
    "join_null_safe",
    oracle="""
    WITH cust AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_nationkey END AS k
      FROM customer
    ), dim AS (
      SELECT nullif(n_nationkey, 13) AS k, n_name FROM nation
    )
    SELECT coalesce(d.n_name, '<null-key>') AS n_name,
           count(*) AS n_customers, min(c.c_custkey) AS min_custkey
    FROM cust c JOIN dim d ON c.k IS NOT DISTINCT FROM d.k
    GROUP BY d.n_name ORDER BY n_name
    """,
    cost=0.4,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (round 5) — `<=>` / IS NOT DISTINCT FROM:
    in dirty data a NULL key is a real population (unattributed rows), and
    a plain equi-join silently DROPS it (NULL = NULL is NULL). Null-safe
    equality treats NULL as a joinable value: here customers with a
    manufactured NULL nation key land on the dimension row whose key was
    nullified (nation 13), instead of vanishing from the report.

    Scale: Spark plans `<=>` as a normal hash/sort-merge equi-join
    (EqualNullSafe is a valid hash key — coalesce-tagged internally), NOT
    a nested loop; same shuffle shape as the plain join, pinned in the
    plan sweep."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("int"))
        .otherwise(F.col("c_nationkey"))
        .alias("k"),
    )
    dim = load_table(spark, sf_dir, "nation").select(
        F.nullif(F.col("n_nationkey"), F.lit(13)).alias("k"), "n_name"
    )
    joined = cust.join(dim, cust["k"].eqNullSafe(dim["k"]))
    return (
        joined.groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
        )
        .select(
            F.coalesce("n_name", F.lit("<null-key>")).alias("n_name"),
            "n_customers",
            "min_custkey",
        )
        .orderBy("n_name")
    )


_GRID_R = 25  # spatial match radius; grid cell size = R


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH a AS (
      SELECT c_custkey AS a_id, c_custkey % 1000 AS ax,
             (c_custkey * 7) % 1000 AS ay
      FROM customer
    ), b AS (
      SELECT s_suppkey AS b_id, s_suppkey % 1000 AS bx,
             (s_suppkey * 13) % 1000 AS by
      FROM supplier
    )
    SELECT count(*) AS n_pairs,
           count(DISTINCT a_id) AS n_a_matched,
           count(DISTINCT b_id) AS n_b_matched,
           cast(coalesce(sum((ax-bx)*(ax-bx) + (ay-by)*(ay-by)), 0) AS bigint)
             AS sum_dist2
    FROM a JOIN b
      ON (ax-bx)*(ax-bx) + (ay-by)*(ay-by) <= {_GRID_R * _GRID_R}
    """,
    cost=0.8,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial join (round 5) — join_range_bucket's technique
    lifted to 2D: points within radius R of each other, found WITHOUT the
    O(n·m) distance cross product. Each right-side point indexes into its
    (x//R, y//R) grid cell exactly once; each left point probes its own
    cell plus the 8 neighbors (any pair within R is at most one cell apart
    in each axis, so the 3x3 probe is exhaustive — and since the right
    point's cell is unique, every pair survives in exactly ONE probed
    cell, no dedup needed). The exact bound is a cheap residual on the
    hash equi-join. Points are manufactured on an integer lattice from
    customer/supplier keys, so the distance² math is EXACT int64 — no
    floating point anywhere. The oracle is the direct quadratic theta
    join; the hash-match proves the grid decomposition reaches every pair.

    Scale: shuffle is O(9·|A| + |B|) cell-keyed rows instead of |A|·|B|
    candidate pairs; cell size tracks R, so candidate density per cell is
    data-independent. The same shape handles geohash joins and
    fixed-radius near-neighbor searches."""
    r = _GRID_R
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("a_id"),
        (F.col("c_custkey") % 1000).alias("ax"),
        ((F.col("c_custkey") * 7) % 1000).alias("ay"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("b_id"),
        (F.col("s_suppkey") % 1000).alias("bx"),
        ((F.col("s_suppkey") * 13) % 1000).alias("by"),
    )
    b_cells = supp.withColumn(
        "cx", F.floor(F.col("bx") / r)
    ).withColumn("cy", F.floor(F.col("by") / r))
    offsets = F.expr("explode(flatten(transform(sequence(-1, 1), dx -> "
                     "transform(sequence(-1, 1), dy -> struct(dx, dy)))))")
    a_probes = (
        cust.select("a_id", "ax", "ay", offsets.alias("o"))
        .withColumn("cx", F.floor(F.col("ax") / r) + F.col("o.dx"))
        .withColumn("cy", F.floor(F.col("ay") / r) + F.col("o.dy"))
        .drop("o")
    )
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    pairs = a_probes.join(b_cells, ["cx", "cy"]).where(dist2 <= r * r)
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("a_id").alias("n_a_matched"),
        F.countDistinct("b_id").alias("n_b_matched"),
        F.coalesce(F.sum(dist2), F.lit(0)).cast("bigint").alias("sum_dist2"),
    )


_ASOF_TOL_US = 3 * 24 * 3600 * 1_000_000  # 3-day staleness tolerance


@query(
    "join_asof_tolerance",
    oracle=EVENTS_NORM_SQL
    + f"""
    , j AS (
      SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
             epoch_us(s.ts) AS signup_us
      FROM events e
      ASOF LEFT JOIN (SELECT user_id, ts FROM events
                      WHERE event_type = 'signup') s
        ON e.user_id = s.user_id AND e.ts >= s.ts
    )
    SELECT event_id, user_id,
           CASE WHEN signup_us IS NOT NULL
                     AND ts_us - signup_us <= {_ASOF_TOL_US}
                THEN signup_us END AS signup_us,
           (signup_us IS NOT NULL
            AND ts_us - signup_us > {_ASOF_TOL_US}) AS stale
    FROM j
    """,
    cost=0.5,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness TOLERANCE (round 5) — pandas
    merge_asof(tolerance=...) semantics: the most recent prior signup
    counts only if it is at most 3 days old at event time; older matches
    are rejected to NULL and flagged `stale` (attribution windows, sensor
    freshness, session stitching all need this cutoff — an unbounded
    as-of silently attributes to arbitrarily old anchors).

    Same scale shape as join_asof: running conditional-max window over
    the unioned stream — ONE shuffle on user_id, no join at all; the
    tolerance is a per-row comparison after the window, free at any
    scale. Oracle: DuckDB's native ASOF JOIN (no tolerance support) with
    the cutoff applied on top — two different decompositions, one
    hash."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    raw = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts_us"))
    ).over(w)
    fresh = F.col("ts_us") - raw <= F.lit(_ASOF_TOL_US)
    return ev.select(
        "event_id",
        "user_id",
        F.when(raw.isNotNull() & fresh, raw).alias("signup_us"),
        (raw.isNotNull() & ~fresh).alias("stale"),
    )


_OVL_LEN_US = 10 * 60 * 1_000_000  # interval length = bucket size (10 min)


@query(
    "join_interval_overlap",
    oracle=EVENTS_NORM_SQL
    + f"""
    , a AS (
      SELECT event_id AS a_id, epoch_us(ts) AS sa,
             epoch_us(ts) + {_OVL_LEN_US} AS ea
      FROM events WHERE event_type = 'click'
    ), b AS (
      SELECT event_id AS b_id, epoch_us(ts) AS sb,
             epoch_us(ts) + {_OVL_LEN_US} AS eb
      FROM events WHERE event_type = 'purchase'
    )
    SELECT (greatest(sa, sb) // 3600000000) * 3600000000 AS hour_us,
           count(*) AS n_pairs,
           min(a_id) AS min_a, max(b_id) AS max_b
    FROM a JOIN b ON sa <= eb AND sb <= ea
    GROUP BY hour_us ORDER BY hour_us
    """,
    cost=1.0,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval-OVERLAP join (round 5) — both sides are INTERVALS
    (join_range_bucket's points and join_interval_events' point-in-window
    are the easier cousins): click and purchase activity windows (10 min
    each, manufactured from event timestamps) that overlap in time,
    with no shared key to hash on. The O(n·m) theta join decomposes
    exactly: with bucket size >= interval length, each interval covers at
    most 2 buckets; exploding BOTH sides to their covered buckets and
    equi-joining on the bucket finds every overlapping pair, and keeping
    a pair only in the bucket containing greatest(start_a, start_b)
    counts it EXACTLY once (that bucket is unique and both intervals are
    live in it). Graded as the per-hour overlap histogram with witness
    ids; the oracle is the direct quadratic theta join.

    Scale: shuffle is O(2·|A| + 2·|B|) bucket-keyed rows; per-bucket
    candidate density tracks activity rate, not corpus size — the same
    decomposition genomics overlap joins and booking-conflict queries
    use."""
    bucket = _OVL_LEN_US  # bucket size = interval length
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    a = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_id"),
        F.col("ts_us").alias("sa"),
        (F.col("ts_us") + _OVL_LEN_US).alias("ea"),
    )
    b = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"),
        F.col("ts_us").alias("sb"),
        (F.col("ts_us") + _OVL_LEN_US).alias("eb"),
    )

    def explode_buckets(df, s, e):
        return df.withColumn(
            "bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket), F.floor(F.col(e) / bucket)
                )
            ),
        )

    pairs = (
        explode_buckets(a, "sa", "ea")
        .join(explode_buckets(b, "sb", "eb"), "bkt")
        .where(
            (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
            # exactly-once cell: the bucket holding the later start
            & (F.floor(F.greatest("sa", "sb") / bucket) == F.col("bkt"))
        )
    )
    return (
        pairs.groupBy(
            (
                F.floor(F.greatest("sa", "sb") / 3_600_000_000) * 3_600_000_000
            ).alias("hour_us")
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("a_id").alias("min_a"),
            F.max("b_id").alias("max_b"),
        )
        .orderBy("hour_us")
    )


# Shared SQL text (identical in Spark and DuckDB) for join_lateral_topn.
_LATERAL_TOPN_SQL = """
SELECT o.o_orderkey, o.o_custkey, l.l_linenumber, l.price
FROM orders o, LATERAL (
  SELECT l_linenumber, round(l_extendedprice, 6) AS price
  FROM lineitem WHERE l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
) l
WHERE o.o_orderkey % 7 = 0
ORDER BY o.o_orderkey, price DESC, l.l_linenumber
"""


@query("join_lateral_topn", oracle=_LATERAL_TOPN_SQL, cost=0.5)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (round 5): for each order, its top-2
    lineitems by price — the Postgres-idiom spelling of per-entity top-N
    (`FROM a, LATERAL (SELECT ... WHERE key = a.key ORDER BY x LIMIT k)`),
    which the engine must accept verbatim because it is how analysts who
    grew up on laterals will write it. Same RESULT surface as
    `win_topk_per_group`; completely different resolution path — Catalyst
    decorrelates the per-row subquery into a joined/ranked plan instead of
    executing it N times, which is the whole point: a naive engine runs the
    inner query once per outer row (150k scans at sf0.1), a decorrelating
    one runs it as one keyed plan.

    Scale: the decorrelated plan is a keyed join + per-key ordering —
    shuffle on the correlation key, never an outer-row loop; pinned
    BNLJ/Cartesian-free in tests/test_plan_shape.py. The LIMIT inside the
    lateral bounds per-key state to k rows exactly like the window top-k.

    The % 7 outer filter keeps the graded frame bounded and, because it is
    on the CORRELATION key's parent row, must push through the
    decorrelation into the lineitem side's join — visible in the plan as a
    filter below the join, not above it."""
    return register_views(spark, sf_dir).sql(_LATERAL_TOPN_SQL)


@query(
    "join_prefilter_minmax",
    oracle="""
    SELECT o_orderkey, l_linenumber, l_quantity, o_totalprice
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
    ORDER BY o_orderkey, l_linenumber
    """,
    cost=0.5,
)
def join_prefilter_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max) runtime prefilter ahead of a selective join
    (round 6) — the hand-rolled form of what Spark's runtime row-level
    filtering and dynamic partition pruning inject automatically: reduce
    the filtered dim to a single (min_key, max_key) row, BROADCAST it onto
    the fact, and drop every fact row outside the key envelope BEFORE the
    join shuffle. The envelope is always a superset of the matching keys,
    so the exact equi-join afterwards makes the result identical to the
    plain join (the oracle IS the plain join).

    Scale: the envelope is a 1-row aggregate (partial-agg, no shuffle) and
    the prefilter is a map-side BETWEEN — at 100 TB this skips the fact
    shuffle for every row outside the dim's key range, and when the fact
    layout is key-sorted/z-ordered (sink_zorder_cluster) the same
    predicate prunes parquet row groups at scan time. Pruning power is
    layout-dependent (a uniformly-spread key range prunes nothing — this
    dataset's worst case), correctness is not."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp_ntz")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    envelope = orders.agg(
        F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mx")
    )
    prefiltered = (
        lineitem.join(F.broadcast(envelope))
        .where(F.col("l_orderkey").between(F.col("mn"), F.col("mx")))
        .drop("mn", "mx")
    )
    return (
        orders.join(prefiltered, orders.o_orderkey == prefiltered.l_orderkey)
        .select("o_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
        .orderBy("o_orderkey", "l_linenumber")
    )


@query(
    "join_returned_rev_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           count(*) AS n_items
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    cost=0.5,
)
def join_returned_rev_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (round 6, staged r7): top-20 customers by RETURNED
    item revenue in one quarter — the churn-risk report. Star pattern:
    the returnflag predicate pushes into the lineitem scan, the quarter
    predicate into orders; customer and nation BROADCAST so the fact
    shuffles once, for the orders equi-join; the top-20 collapses to
    TakeOrderedAndProject (no global sort materialization).

    Determinism: revenue rides dsum (exact int64 micro-units), so the
    DESC-revenue ranking compares identical doubles in both engines, with
    c_custkey as the total-order tiebreak.

    Scale: fact work is one filtered scan + one keyed shuffle; dims stay
    broadcast-sized at any fact scale. Group count is bounded by active
    returning customers, and the driver only ever sees 20 rows."""
    cutlo = F.lit("1996-01-01").cast("timestamp_ntz")
    cuthi = F.lit("1996-04-01").cast("timestamp_ntz")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi))
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "revenue")),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "join_late_shipment_q12",
    oracle="""
    SELECT l_returnflag,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS bigint) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE epoch_us(l_shipdate) - epoch_us(o_orderdate) > 5184000000000
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    cost=0.4,
)
def join_late_shipment_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (round 6, staged r7): late-shipment priority audit —
    among lineitems shipped more than 60 days after their order date, how
    many belong to high- vs low-priority orders, per return flag. The
    original's shipmode column does not exist in this corpus; the return
    flag plays its grouping role and the commit/receipt lag becomes the
    ship-order lag. One fact-fact equi-join on the order key (the late
    predicate is a RESIDUAL on the joined row — it references both sides,
    so it cannot push below the join), then conditional counts in one agg.

    Determinism: the lag test is exact integer µs arithmetic (Spark
    unix_micros ≡ DuckDB epoch_us on the normalized timestamps); counts
    are integers — nothing floats anywhere.

    Scale: lineitem and orders co-shuffle on the order key once (the same
    key a bucketed layout pre-clusters — see sink_bucketed_table, which
    makes this join exchange-free); the agg output is 3 rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_us"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ord_us"),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("ship_us") - F.col("ord_us") > 5184000000000)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "subq_small_qty_q17",
    oracle=f"""
    WITH b AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#13'
    ), thr AS (
      SELECT l_partkey,
             0.2 * (cast(sum(cast(round(l_quantity * 1000000) AS bigint))
                         AS double) / 1000000.0 / count(*)) AS qty_cap
      FROM b GROUP BY l_partkey
    )
    SELECT count(*) AS n_small_lines,
           {dsum('l_extendedprice', 'small_qty_revenue')}
    FROM b JOIN thr ON b.l_partkey = thr.l_partkey
    WHERE l_quantity < qty_cap
    """,
    cost=0.4,
)
def subq_small_qty_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (round 6, staged r7): small-quantity-order revenue —
    lineitems of one brand whose quantity falls below 20% of that part's
    own average order quantity. The correlated-scalar-subquery pattern
    (per-part AVG compared against each row of the same part), resolved
    the scalable way: the brand-filtered join output is aggregated once
    per part, and the O(parts) threshold relation joins BACK by part key —
    two passes over the small filtered set, zero correlated re-execution.

    Determinism: the threshold is 0.2 × (exact-int64 micro sum / count) —
    identical integer operands, then two IEEE ops (divide, multiply) on
    identical doubles; the `<` compare therefore agrees bit-for-bit in
    both engines. Revenue rides dsum.

    Scale: part dim broadcasts into the brand filter; the per-part agg and
    the threshold join both key on l_partkey — co-partitioned, one shuffle
    each over the ~1/25-selectivity brand subset only."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    b = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = b.groupBy("l_partkey").agg(
        (
            0.2
            * (
                F.sum(F.expr("cast(round(l_quantity * 1000000) as bigint)"))
                .cast("double")
                / 1000000.0
                / F.count("*")
            )
        ).alias("qty_cap")
    )
    return (
        b.join(thr, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.count("*").alias("n_small_lines"),
            F.expr(dsum("l_extendedprice", "small_qty_revenue")),
        )
    )


@query(
    "join_top_orders_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, cast(sum(cast(round(l_quantity) AS bigint)) AS bigint)
               AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(cast(round(l_quantity) AS bigint)) > 250
    )
    SELECT c_custkey, c_name, o_orderkey,
           epoch_us(o_orderdate) AS orderdate_us,
           round(o_totalprice, 6) AS o_totalprice, sum_qty
    FROM big
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    cost=0.4,
)
def join_top_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (round 6, staged r7): large-volume orders — the
    top-10 orders whose total line quantity exceeds 250 units, with their
    customers. The HAVING-on-a-fact-aggregate pattern: lineitem collapses
    to one row per order FIRST (partial-agg-friendly hash agg), the >250
    gate reduces that to a tiny survivor set (p99 of order quantity sums
    is ~262 in this corpus), and only the survivors join to orders and
    customer — the join input is orders of magnitude smaller than the
    fact. Top-10 collapses to TakeOrderedAndProject.

    Determinism: quantities are integral doubles — round() makes each an
    exact int64, so the HAVING gate is integer-exact; o_totalprice values
    are raw parquet doubles, identical in both engines, so DESC ordering
    with the o_orderkey tiebreak is total.

    Scale: one fact agg on the order key + two survivor-sized joins; at
    100 TB the survivor relation stays small (the gate is the point), and
    customer broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr("cast(round(l_quantity) as bigint)").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").cast("bigint").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
            F.round("o_totalprice", 6).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT p_brand, count(*) AS n_lines,
           {dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size = 10
    GROUP BY p_brand ORDER BY p_brand
    """,
    cost=3.0,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime join prefilter (round 6, staged r7): the
    general-key sibling of join_prefilter_minmax — when the filtered dim's
    surviving keys are NOT an interval, a min/max envelope prunes nothing,
    but a Bloom filter of the survivor keys still drops most fact rows
    MAP-SIDE, before the join shuffle. Hand-rolled and fully inspectable
    (this is what spark.sql.optimizer.runtime.bloomFilter.enabled injects
    automatically on the JVM side): k=3 xxhash64 probes into an m=65536-bit
    filter; the dim side aggregates the 1024-word int64 bitmap with bit_or
    (order-free), the bounded O(m/64) bitmap is collected once and
    rebroadcast as a LITERAL array, and the fact filter is pure codegen
    bit arithmetic — zero extra shuffle, zero UDF. False positives are
    harmless: the prefilter is a SUPERSET gate and the exact equi-join
    still runs, so the result is plan-identical to the plain join (the
    oracle IS the plain join).

    Determinism: the Bloom gate only affects WHICH rows reach the exact
    join, never the joined values; the revenue sum rides dsum.

    Scale: dim-side bitmap build is O(|filtered dim| × k) map work + a
    1024-row shuffle; the collect is O(m/64) — constant, like the PCA Gram
    partials. Fact-side work is map-only. Size m for the survivor-key
    cardinality at deployment (m ≈ 10 bits/key for ~1% FP); the bitmap
    literal stays kilobytes up to millions of keys."""
    m_bits, n_words, k = 1 << 16, 1 << 10, 3
    part = load_table(spark, sf_dir, "part")
    dim = part.where(F.col("p_size") == 10).select("p_partkey", "p_brand")

    # dim side: k probe positions per key -> per-word OR of the bit masks
    probes = dim.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64("p_partkey", F.lit(i)), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("bit")
    )
    words = (
        probes.select(
            F.expr("cast(bit div 64 as int)").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(bit % 64 as int))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for row in words:
        bitmap[row["word"]] = row["bits"]
    bloom = F.array(*[F.lit(w).cast("bigint") for w in bitmap])

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    fact = li.withColumn("_bloom", bloom)
    gate = None
    for i in range(k):
        b = f"pmod(xxhash64(l_partkey, {i}), {m_bits})"
        hit = F.expr(
            f"(shiftright(element_at(_bloom, cast({b} div 64 as int) + 1),"
            f" cast({b} % 64 as int)) % 2) != 0"
        )
        gate = hit if gate is None else (gate & hit)
    prefiltered = fact.where(gate).drop("_bloom")

    return (
        prefiltered.join(
            F.broadcast(dim), prefiltered.l_partkey == dim.p_partkey
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "revenue")),
        )
        .orderBy("p_brand")
    )


@query(
    "join_min_cost_supplier_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             cast(sum(cast(round(l_extendedprice * 1000000) AS bigint)) AS double)
               / cast(sum(cast(round(l_quantity * 1000000) AS bigint)) AS double)
               AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ), europe AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), cand AS (
      SELECT p_partkey, p_name, s_name, n_name, s_acctbal, unit_cost,
             min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM part JOIN ps ON p_partkey = l_partkey
                JOIN europe ON l_suppkey = s_suppkey
      WHERE p_size BETWEEN 10 AND 40 AND p_type = 'STANDARD'
    )
    SELECT p_partkey, p_name, s_name, n_name, s_acctbal, unit_cost
    FROM cand WHERE unit_cost = min_cost
    """,
    cost=0.4,
)
def join_min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (round 6, staged r7): minimum-cost supplier per part —
    for every STANDARD part in a size band, the EUROPE supplier offering it
    at the lowest observed unit cost. The corpus has no partsupp table, so
    the part-supplier offer relation is DERIVED from shipment history: one
    (partkey, suppkey) hash agg over lineitem whose unit cost is exact
    µ-unit price-sum over exact µ-unit qty-sum. The correlated
    min-subquery of the original becomes a per-part window MIN + equality
    — the standard decorrelation.

    Determinism: unit_cost is a RAW double quotient of two exact int64
    sums (each < 2^53, so the int→double conversions are exact and the one
    IEEE division returns the identical correctly-rounded double in both
    engines) — no round() anywhere, so no BigDecimal-vs-binary tie risk;
    the window MIN and the equality then compare identical doubles.

    Scale: lineitem reduces FIRST (map-side partial agg on (part, supp) —
    the offer relation is |parts|×|suppliers-who-shipped| ≪ |lineitem|);
    part and the EUROPE supplier dim broadcast; the per-part window MIN
    re-keys the offer relation by partkey alone (AQE-sized exchange, input
    already part-clustered). At 100 TB the two sums stay int64-safe to
    ~9e15 µ-units per offer cell (~10^9 rows of 1e5-priced lines); past
    that, promote to dsum_decimal per the numeric module's ceiling note."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.expr(
            "sum(cast(round(l_extendedprice * 1000000) as bigint))"
        ).alias("price_micro"),
        F.expr("sum(cast(round(l_quantity * 1000000) as bigint))").alias(
            "qty_micro"
        ),
    )
    ps = ps.select(
        "l_partkey",
        "l_suppkey",
        (
            F.col("price_micro").cast("double")
            / F.col("qty_micro").cast("double")
        ).alias("unit_cost"),
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_size").between(10, 40)) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    europe = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(europe), ps.l_suppkey == europe.s_suppkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal", "unit_cost")
    )


@query(
    "join_nation_volume_q7",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS ship_year,
           {dsum('l_extendedprice * (1 - l_discount)', 'volume')},
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    cost=0.5,
)
def join_nation_volume_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (round 6, staged r7): bilateral trade volume — shipped
    value between every (supplier nation, customer nation) pair, per ship
    year, cross-border pairs only. The original fixes two nations; here the
    full pair matrix is kept (bounded: |nations|² × years groups) so the
    op stays non-degenerate at every scale factor.

    Determinism: volume rides dsum; the pair/year keys are exact.

    Scale: ONE fact-fact exchange (lineitem⋈orders on the order key, the
    ship-window predicate pushed into the lineitem scan); customer,
    supplier and both nation role-joins broadcast, so the joined fact
    never re-shuffles until the final bounded-cardinality group-by. The
    `sn <> cn` inequality is a residual on broadcast columns — no
    cartesian anywhere."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("sn_key") != F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "volume")),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "join_custdist_q13",
    oracle="""
    WITH co AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM co GROUP BY c_count
    """,
    cost=0.4,
)
def join_custdist_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (round 6, staged r7): customer order-count
    distribution — how many customers placed exactly k qualifying orders,
    INCLUDING the zero bucket (the left-outer that a plain group-by of
    orders can never produce). The original's o_comment NOT LIKE exclusion
    becomes an order-priority exclusion (this corpus has no comment
    column); the join-predicate placement is the point: the filter sits in
    the ON clause, not WHERE, so excluded-order customers still surface
    with count 0.

    Spark side pre-aggregates orders to (custkey, count) BEFORE the outer
    join — the count-then-join decorrelation — so the join carries one row
    per customer per side instead of one per order. count(o_orderkey) over
    a left join counts only matched rows (COUNT ignores the NULLs the
    outer join manufactures), which is exactly coalesce(cnt, 0) on the
    pre-aggregated form.

    Determinism: integer counts only.

    Scale: orders reduce map-side on custkey; the outer join then
    co-shuffles two customer-cardinality relations on the same key; the
    final histogram group-by is O(distinct counts) ≪ O(customers). No
    broadcast needed at any scale."""
    cnt = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_ord"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(cnt, cust.c_custkey == cnt.o_custkey, "left")
        .select(F.coalesce(F.col("n_ord"), F.lit(0).cast("bigint")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "join_sole_late_shipper_q21",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey, l_shipdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ), om AS (
      SELECT l_orderkey, max(l_shipdate) AS max_ship,
             count(DISTINCT l_suppkey) AS n_supp
      FROM li GROUP BY 1
    ), latest AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN om ON li.l_orderkey = om.l_orderkey
      WHERE li.l_shipdate = om.max_ship AND om.n_supp > 1
    ), sole AS (
      SELECT l_orderkey FROM latest GROUP BY 1 HAVING count(*) = 1
    )
    SELECT s_name, count(*) AS numwait
    FROM latest JOIN sole ON latest.l_orderkey = sole.l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
    cost=0.5,
)
def join_sole_late_shipper_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (round 6, staged r7): suppliers who kept orders
    waiting — on finished multi-supplier orders, the supplier whose
    shipment was the SOLE latest one (an EXISTS another-supplier
    lineitem + NOT EXISTS another-equally-late-supplier pair in the
    original). The corpus has no commit/receipt dates, so "late" is the
    order's max ship date. The two correlated existence tests collapse
    into per-order aggregates: distinct-supplier count (EXISTS a second
    supplier) and a count of max-achieving suppliers == 1 (NOT EXISTS a
    tied one) — same sets, no correlated re-scans.

    Determinism: µs-exact timestamp equality against the per-order MAX;
    integer counts.

    Scale: everything up to the final per-supplier tally is keyed by
    l_orderkey — the fact⋈orders status join, the per-order aggregate,
    the join-back, the distinct, and the sole-shipper window all reuse
    ONE order-key partitioning (a single exchange under AQE); the
    supplier name join broadcasts. Per-order state is O(suppliers per
    order), never materializing pairs."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .drop("o_orderkey")
    )
    om = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    latest = (
        li.join(om, "l_orderkey")
        .where((F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") > 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = latest.withColumn(
        "n_latest", F.count("*").over(Window.partitionBy("l_orderkey"))
    ).where(F.col("n_latest") == 1)
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(supp), sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "join_fk_orphans",
    oracle="""
    WITH o_c AS (
      SELECT count(*) AS n_rows,
             sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS n_fk,
             sum(CASE WHEN c.c_custkey IS NULL OR c.c_acctbal <= 0
                      THEN 1 ELSE 0 END) AS n_policy
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ), l_p AS (
      SELECT count(*) AS n_rows,
             sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS n_fk,
             sum(CASE WHEN p.p_partkey IS NULL OR p.p_size > 25
                      THEN 1 ELSE 0 END) AS n_policy
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    ), l_o AS (
      SELECT (SELECT count(*) FROM lineitem) AS n_rows,
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS n_fk
    )
    SELECT 'orders->customer' AS check_name,
           cast(n_rows AS bigint) AS n_rows, cast(n_fk AS bigint) AS n_viol,
           round(cast(n_fk AS double) / n_rows, 6) AS viol_rate FROM o_c
    UNION ALL
    SELECT 'orders->customer:goodstanding', cast(n_rows AS bigint),
           cast(n_policy AS bigint), round(cast(n_policy AS double) / n_rows, 6)
    FROM o_c
    UNION ALL
    SELECT 'lineitem->part', cast(n_rows AS bigint), cast(n_fk AS bigint),
           round(cast(n_fk AS double) / n_rows, 6) FROM l_p
    UNION ALL
    SELECT 'lineitem->part:small', cast(n_rows AS bigint),
           cast(n_policy AS bigint), round(cast(n_policy AS double) / n_rows, 6)
    FROM l_p
    UNION ALL
    SELECT 'lineitem->orders', cast(n_rows AS bigint), cast(n_fk AS bigint),
           round(cast(n_fk AS double) / n_rows, 6) FROM l_o
    """,
    cost=0.6,
)
def join_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity / policy audit (round 6, staged r7): the data-
    quality gate every warehouse load runs before publishing — for each
    declared FK edge, how many child rows have NO parent (strict orphans)
    or a parent outside policy (inactive customer, oversize part). Emits
    one row per check: (check_name, n_rows, n_viol, viol_rate). The strict
    checks SHOULD be zero on contract data — a nonzero is the alarm; the
    policy checks are nonzero by construction so the hash grades real
    counts, not a table of zeros.

    Mechanics: dim-parent checks ride ONE left outer join each (the null
    parent key detects strict orphans, the parent attribute the policy
    breach — both flags from the same probe). ALL THREE lineitem-rooted
    checks share ONE lineitem scan (round-12 rewrite — the r7 shape
    scanned lineitem three times: part probe, total count, orders anti
    join): the broadcast part probe computes per-row flags map-side, the
    orders membership check runs as a LEFT OUTER join on the key (an
    anti join is a left join + null filter — folding it keeps the
    matched rows, whose flags the same aggregate consumes), and one
    1-row agg emits every lineitem counter.

    Scale: customer/part broadcast (dim-sized); the lineitem->orders
    probe shuffles the key plus two small int flags per row — within
    rounding of the old keys-only anti-join exchange, for two fewer
    full fact scans. At 100 TB the join is the same shape
    dedup_cross_split ships; orphan auditing never needs more than the
    key columns."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")

    o_c = (
        orders.select("o_custkey")
        .join(
            F.broadcast(customer.select("c_custkey", "c_acctbal")),
            orders.o_custkey == customer.c_custkey,
            "left",
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
            ).alias("n_fk"),
            F.sum(
                F.when(
                    F.col("c_custkey").isNull() | (F.col("c_acctbal") <= 0), 1
                ).otherwise(0)
            ).alias("n_policy"),
        )
    )
    li_flags = (
        lineitem.select("l_partkey", "l_orderkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left",
        )
        .select(
            "l_orderkey",
            F.when(F.col("p_partkey").isNull(), 1).otherwise(0).alias("p_fk"),
            F.when(F.col("p_partkey").isNull() | (F.col("p_size") > 25), 1)
            .otherwise(0)
            .alias("p_policy"),
        )
    )
    l_all = (
        li_flags.join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("p_fk").alias("n_fk_part"),
            F.sum("p_policy").alias("n_policy_part"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                "n_fk_orders"
            ),
        )
    )

    # Each audit subtree is referenced ONCE: the report rows per join
    # explode out of the 1-row aggregate (a naive union of per-check
    # selects would re-execute the whole join+agg per row — observed as a
    # doubled lineitem scan in the physical plan before this rewrite).
    def rrow(name: str, viol_col: str):
        return F.struct(
            F.lit(name).alias("check_name"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col(viol_col).cast("bigint").alias("n_viol"),
            # try_divide: NULL (not an ANSI error) when the audited table
            # is empty — matching DuckDB's NULL-on-zero-divisor oracle
            F.round(
                F.try_divide(F.col(viol_col).cast("double"), F.col("n_rows")), 6
            ).alias("viol_rate"),
        )

    def report(src: DataFrame, *rows) -> DataFrame:
        return src.select(F.explode(F.array(*rows)).alias("r")).select("r.*")

    return report(
        o_c,
        rrow("orders->customer", "n_fk"),
        rrow("orders->customer:goodstanding", "n_policy"),
    ).unionAll(
        report(
            l_all,
            rrow("lineitem->part", "n_fk_part"),
            rrow("lineitem->part:small", "n_policy_part"),
            rrow("lineitem->orders", "n_fk_orders"),
        )
    )
