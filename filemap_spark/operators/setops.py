"""§2.7 Set operations.

filemap: `cat` / `sort -u` / `comm` over sorted files (SURVEY §2.7 [K]).
Spark plans UNION as a zero-shuffle concatenation; INTERSECT/EXCEPT become
distinct-aggregated semi/anti joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemap_spark.io import load_table
from filemap_spark.registry import query


def _users_of(spark, sf_dir: str, event_type: str) -> DataFrame:
    """High-value (value > 150) users of one event type — banded so the set
    operands genuinely overlap AND differ in the contract data."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        (F.col("event_type") == event_type) & (F.col("value") > 150)
    ).select("user_id")


@query(
    "set_union_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 150
    UNION ALL
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — filemap `cat`; no shuffle, partitions concatenate."""
    return _users_of(spark, sf_dir, "click").unionAll(_users_of(spark, sf_dir, "purchase"))


@query(
    "set_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 150
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — filemap `sort -u` after cat."""
    return (
        _users_of(spark, sf_dir, "click")
        .union(_users_of(spark, sf_dir, "purchase"))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view' AND value > 150
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users doing both — filemap `comm -12` on sorted uniq files."""
    return _users_of(spark, sf_dir, "view").intersect(_users_of(spark, sf_dir, "purchase"))


@query(
    "set_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view' AND value > 150
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewers who never purchased — filemap `comm -23` (distinct EXCEPT)."""
    return _users_of(spark, sf_dir, "view").subtract(_users_of(spark, sf_dir, "purchase"))
