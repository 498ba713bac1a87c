"""§2.6 Sorts / limits / top-k.

filemap: `sort -k1,1 -k2,2nr | head` (SURVEY §2.6 [K]). Spark global sort is
a range-partitioned exchange (sampled split points) — scales linearly; a
sort+limit collapses to TakeOrderedAndProject, which takes top-k per
partition and merges k·P rows on the driver — no global sort at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemap_spark.functions.numeric import dsum
from filemap_spark.io import EVENTS_NORM_SQL, load_table
from filemap_spark.registry import query


@query(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, o_orderpriority, round(o_totalprice, 6) AS o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort with LIMIT — full tiebreak chain makes
    the limited prefix deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(
            F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .select("o_orderkey", "o_orderpriority", F.round("o_totalprice", 6).alias("o_totalprice"))
        .limit(100)
    )


@query(
    "topk_global",
    oracle=f"""
    SELECT c_custkey, c_name, {dsum('o_totalprice', 'total_spend')}
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 20
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by total spend — join + agg + TakeOrderedAndProject
    (filemap `sort -nr | head`)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.expr(dsum("o_totalprice", "total_spend")))
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "reduce_sorted_runs",
    oracle=EVENTS_NORM_SQL
    + """
    , g AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    )
    SELECT user_id, cast(count(*) AS bigint) AS n_events,
           min(ts_us) AS first_us, max(ts_us) AS last_us,
           cast(coalesce(max(gap), 0) AS bigint) AS max_gap_us
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)
def reduce_sorted_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filemap's `sort -m` merge-reduce mode, pinned as an explicit op:
    hash-shuffle events by user, `sortWithinPartitions` produces PRE-SORTED
    RUNS (Spark's shuffle-merge is literally a k-way `sort -m` of spilled
    sorted runs), and a streaming mapInPandas reduce consumes each
    partition's ordered stream with O(1) state per key — carrying partial
    state across Arrow batches exactly like a reducer consuming
    concatenated sorted files. Per user: event count, first/last timestamp,
    and the max gap between consecutive events (an order-DEPENDENT
    aggregate — the reason merge-reduce exists; equal timestamps make the
    consecutive-gap multiset order-independent, so the result is
    deterministic).

    Scale: one shuffle on the reduce key; the reducer never holds more
    than one Arrow batch plus one run's state — bounded memory at any
    group size, which is the property `collect_list` reducers lack."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    runs = ev.repartition(F.col("user_id")).sortWithinPartitions(
        "user_id", "ts_us", "event_id"
    )

    def merge_reduce(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry = [user, n, first, last, max_gap] for the run that may
        # continue into the next batch of this partition's sorted stream
        carry: list | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            u = pdf["user_id"].to_numpy(np.int64)
            t = pdf["ts_us"].to_numpy(np.int64)
            change = np.nonzero(u[1:] != u[:-1])[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(u)]))
            # gaps between consecutive rows, zeroed at user boundaries so a
            # segment-max over [start_i, start_{i+1}) is the run's max gap
            gaps = np.append(np.where(u[1:] == u[:-1], np.diff(t), 0), 0)
            max_gap = np.maximum.reduceat(gaps, starts)
            users, counts = u[starts], ends - starts
            first, last = t[starts], t[ends - 1]
            out = [users, counts, first, last, max_gap]
            if carry is not None:
                if users[0] == carry[0]:
                    # stitch the carried run to this batch's first run
                    bridge = first[0] - carry[3]
                    counts[0] += carry[1]
                    first[0] = carry[2]
                    max_gap[0] = max(max_gap[0], carry[4], bridge)
                else:
                    yield pd.DataFrame(
                        {
                            "user_id": [carry[0]],
                            "n_events": [carry[1]],
                            "first_us": [carry[2]],
                            "last_us": [carry[3]],
                            "max_gap_us": [carry[4]],
                        }
                    )
            carry = [users[-1], counts[-1], first[-1], last[-1], max_gap[-1]]
            if len(users) > 1:
                yield pd.DataFrame(
                    {
                        "user_id": out[0][:-1],
                        "n_events": out[1][:-1],
                        "first_us": out[2][:-1],
                        "last_us": out[3][:-1],
                        "max_gap_us": out[4][:-1],
                    }
                )
        if carry is not None:
            yield pd.DataFrame(
                {
                    "user_id": [carry[0]],
                    "n_events": [carry[1]],
                    "first_us": [carry[2]],
                    "last_us": [carry[3]],
                    "max_gap_us": [carry[4]],
                }
            )

    return runs.mapInPandas(
        merge_reduce,
        schema="user_id long, n_events long, first_us long, last_us long, max_gap_us long",
    ).orderBy("user_id")
