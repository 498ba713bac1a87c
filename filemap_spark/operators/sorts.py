"""§2.6 Sorts / limits / top-k.

filemap: `sort -k1,1 -k2,2nr | head` (SURVEY §2.6 [K]). Spark global sort is
a range-partitioned exchange (sampled split points) — scales linearly; a
sort+limit collapses to TakeOrderedAndProject, which takes top-k per
partition and merges k·P rows on the driver — no global sort at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemap_spark.functions.numeric import dsum
from filemap_spark.io import load_table
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
