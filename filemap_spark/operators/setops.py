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
    "set_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view' AND value > 150
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (round 5) — `EXCEPT ALL` keeps max(m_A − m_B, 0)
    COPIES per user, so a user with 3 qualifying views and 1 qualifying
    purchase survives twice. This is the event-attribution variant the
    distinct `set_except` erases: it answers "how many UNMATCHED view
    events remain per user", not just "which users".

    Scale: Spark plans exceptAll as a counted aggregate per side + a
    generator replay (one shuffle per side on the row key, partial-agg
    friendly) — never a sort of the whole bag. Bag semantics are the SQL
    standard's, so the oracle is the literal EXCEPT ALL."""
    return _users_of(spark, sf_dir, "view").exceptAll(
        _users_of(spark, sf_dir, "purchase")
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view' AND value > 150
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (round 5) — `INTERSECT ALL` keeps min(m_A, m_B)
    copies per user: the matched-event-count companion to
    `set_except_all` (m_A = matched + unmatched). Same counted-aggregate
    physical shape; no distinct pass, no full-bag sort."""
    return _users_of(spark, sf_dir, "view").intersectAll(
        _users_of(spark, sf_dir, "purchase")
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
