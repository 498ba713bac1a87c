"""§2.4 Aggregations.

filemap's reduce = hash-bucket shuffle + per-bucket shell command (SURVEY
§1.1 [K], cite:PENDING — reference mount empty). Spark's `groupBy().agg()`
subsumes it with automatic partial (map-side) + final aggregation; at 100 TB
the partial agg is what keeps shuffle volume proportional to group count, not
row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemap_spark.functions.numeric import davg, dsum
from filemap_spark.io import load_table
from filemap_spark.registry import query

_PRICING_CUTOFF = "2000-09-02"


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity', 'sum_qty')},
           {dsum('l_extendedprice', 'sum_base_price')},
           {dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {davg('l_quantity', 'avg_qty')},
           {davg('l_extendedprice', 'avg_price')},
           {davg('l_discount', 'avg_disc')},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_PRICING_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship — TPC-H Q1 shape (pricing summary per returnflag/linestatus).

    Single hash-agg over a filtered scan: the shipdate predicate pushes into
    the parquet scan and only 7 of 11 columns are read.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(_PRICING_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(dsum("l_quantity", "sum_qty")),
            F.expr(dsum("l_extendedprice", "sum_base_price")),
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")),
            F.expr(dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")),
            F.expr(davg("l_quantity", "avg_qty")),
            F.expr(davg("l_extendedprice", "avg_price")),
            F.expr(davg("l_discount", "avg_disc")),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
