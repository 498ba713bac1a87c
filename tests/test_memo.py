"""Memoization layer semantics (SURVEY §4.3.1): hit/miss behavior, plan
keying, and make-style invalidation on input change."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from filemap_spark.io import load_table
from filemap_spark.plans.memo import cached, plan_key
from filemap_spark.testing import canonical_rows


def _agg(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"))
        .orderBy("n_regionkey")
    )


def test_miss_then_hit_same_result(spark, sf_dir):
    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/nation.parquet"]
    r1, hit1 = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    r2, hit2 = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    assert (hit1, hit2) == (False, True)
    direct = _agg(spark, sf_dir).toPandas()
    assert canonical_rows(r1.toPandas()) == canonical_rows(direct)
    assert canonical_rows(r2.toPandas()) == canonical_rows(direct)


def test_plan_equivalent_queries_share_key(spark, sf_dir):
    inputs = [f"{sf_dir}/nation.parquet"]
    a = _agg(spark, sf_dir)
    # different construction order, same optimized plan modulo aliasing
    b = _agg(spark, sf_dir)
    assert plan_key(a, inputs) == plan_key(b, inputs)


def test_different_plan_different_key(spark, sf_dir):
    inputs = [f"{sf_dir}/nation.parquet"]
    a = _agg(spark, sf_dir)
    b = _agg(spark, sf_dir).where(F.col("n") > 1)
    assert plan_key(a, inputs) != plan_key(b, inputs)


def test_input_change_invalidates(spark, sf_dir):
    """make-semantics: touching an input file changes the key."""
    wh = tempfile.mkdtemp(prefix="memo_wh_")
    src = os.path.join(wh, "copy.parquet")
    load_table(spark, sf_dir, "nation").write.parquet(src)
    df = spark.read.parquet(src).groupBy("n_regionkey").agg(F.count("*").alias("n"))
    k1 = plan_key(df, [src])
    time.sleep(0.01)
    part = next(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    os.utime(part)
    k2 = plan_key(df, [src])
    assert k1 != k2
