"""Bucketed-table co-located join (SCALE.md deployment knob): pre-shuffling
both fact tables into matching buckets at write time removes the join-time
Exchange entirely — the 100 TB repeated-join layout."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from filemap_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # spark.sql.warehouse.dir is a static conf — managed tables land in the
    # session's default warehouse; DROP TABLE removes their files.
    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable("li_b"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable("orders_b"))
    yield "li_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_b, orders_b = bucketed_tables
    # disable auto-broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li_b)
            .join(spark.table(orders_b),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # bucket layout satisfies the join's distribution: the only Exchange
        # in the plan belongs to the post-join aggregate, so everything
        # before the first HashAggregate (scan → sort → join) is shuffle-free
        pre_agg = plan.split("HashAggregate")[0]
        assert "Exchange" not in pre_agg
        # result sanity vs unbucketed join
        sf = "/root/testdata/sf0.001"
        expect = (
            load_table(spark, sf, "lineitem")
            .join(load_table(spark, sf, "orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        )
        got = {(r["o_orderpriority"], r["n"]) for r in joined.collect()}
        want = {(r["o_orderpriority"], r["n"]) for r in expect.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
