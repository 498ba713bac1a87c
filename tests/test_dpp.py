"""Dynamic partition pruning (SCALE.md / SURVEY §4.2): a selective dim
filter prunes fact partitions at RUNTIME via a subquery broadcast — the
mechanism that keeps a date-partitioned 100 TB fact scan proportional to
the dimension filter, not the table."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from filemap_spark.io import load_table


@pytest.fixture(scope="module")
def partitioned_orders(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dpp") / "orders_by_prio")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    return out


def test_dim_filter_prunes_fact_partitions_dynamically(spark, partitioned_orders):
    fact = spark.read.parquet(partitioned_orders)
    dim = spark.createDataFrame(
        [
            ("1-URGENT", 1),
            ("2-HIGH", 2),
            ("3-MEDIUM", 3),
            ("4-NOT SPECIFIED", 4),
            ("5-LOW", 5),
        ],
        "prio string, rank int",
    )
    joined = (
        fact.join(dim.where(F.col("rank") <= 1), fact.o_orderpriority == dim.prio)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # runtime pruning shows up as a dynamicpruning subquery in PartitionFilters
    assert "dynamicpruning" in plan.lower(), plan
    rows = joined.collect()
    assert len(rows) == 1 and rows[0]["o_orderpriority"] == "1-URGENT"
    # and the result matches the unpartitioned source
    expect = (
        load_table(spark, "/root/testdata/sf0.001", "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert rows[0]["n"] == expect
