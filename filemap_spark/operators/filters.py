"""§2.2 Projection / filter / predicates.

filemap expresses these as `awk`/`grep` stages in a shell pipeline (SURVEY
§1.1 [K]); here they are Catalyst `Filter`/`Project` nodes, which means
predicate pushdown into the parquet scan and column pruning come for free —
at 100 TB these are the difference between reading a row group and skipping
it (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemap_spark.io import load_table
from filemap_spark.registry import query


@query(
    "filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
      AND l_quantity BETWEEN 10 AND 40
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates — filemap `awk '$x > a && $x < b'`; both predicates
    push into the parquet scan (min/max row-group skipping)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & F.col("l_quantity").between(10, 40)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


@query(
    "filter_in_set",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def filter_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set membership — filemap `grep -E 'BUILDING|MACHINERY'`."""
    return (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_type LIKE '%O%' AND p_name LIKE 'small%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LIKE — filemap `grep` with fixed patterns (LIKE semantics are
    identical across both engines)."""
    part = load_table(spark, sf_dir, "part")
    return part.where(
        F.col("p_type").like("%O%") & F.col("p_name").like("small%")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "filter_regexp",
    oracle="""
    SELECT event_id, event_type, user_id FROM events
    WHERE regexp_matches(event_type, '^(click|view)$')
    """,
)
def filter_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate — filemap `grep -E`. Spark RLIKE is unanchored search,
    same as DuckDB regexp_matches; the pattern carries its own anchors."""
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").rlike("^(click|view)$"))
        .select("event_id", "event_type", "user_id")
    )


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 100000)
       OR (o_orderpriority LIKE '1%' AND NOT o_orderstatus = 'P')
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT mix — filemap `awk` boolean expressions."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
        | (F.col("o_orderpriority").like("1%") & ~(F.col("o_orderstatus") == "P"))
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "filter_null_handling",
    oracle="""
    SELECT count(*) AS n_rows,
           count(nullif(event_type, 'click')) AS n_nonclick,
           count(distinct coalesce(nullif(event_type, 'click'), 'CLICKED')) AS n_kinds
    FROM events
    """,
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics — the contract data has no NULLs (FIXTURES.md), so they
    are manufactured with nullif and counted back via count/coalesce."""
    ev = load_table(spark, sf_dir, "events")
    masked = F.nullif(F.col("event_type"), F.lit("click"))
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.count(masked).alias("n_nonclick"),
        F.countDistinct(F.coalesce(masked, F.lit("CLICKED"))).alias("n_kinds"),
    )


@query(
    "project_compute",
    cost=1.1,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS revenue,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 25 THEN 'mid'
                ELSE 'big' END AS qty_tier
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection — filemap `awk '{print $1*$2}'`. Per-row IEEE
    arithmetic is deterministic across engines (same expression tree), so
    round(,6) alone is safe here — no aggregation order involved."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 25, "mid")
        .otherwise("big")
        .alias("qty_tier"),
    )


@query(
    "project_cast",
    oracle="""
    SELECT o_orderkey,
           cast(cast(o_orderkey AS varchar) AS bigint) AS key_roundtrip,
           cast(floor(o_totalprice) AS bigint) AS price_floor,
           round(o_totalprice, 2) AS price_2dp,
           cast(o_orderkey AS double) AS key_double
    FROM orders
    """,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts — filemap relies on awk/printf coercion. Divergence trap encoded:
    DuckDB CAST(double AS int) ROUNDS while Spark truncates, so integerizing
    goes through an explicit floor() on both sides."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_floor"),
        F.round(F.col("o_totalprice"), 2).alias("price_2dp"),
        F.col("o_orderkey").cast("double").alias("key_double"),
    )
