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


def test_self_join_left_vs_right_projection_distinct_keys(spark, sf_dir):
    """Round-2 regression (ADVICE): erasing exprIds collided a self-join
    projecting the LEFT copy of a column with one projecting the RIGHT copy
    — canonical renumbering must keep those keys distinct while staying
    stable for plan-equivalent queries."""
    inputs = [f"{sf_dir}/nation.parquet"]
    n = load_table(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    joined = a.join(b, F.col("a.n_nationkey") == F.col("b.n_nationkey"))
    left = joined.select(F.col("a.n_name").alias("nm"), F.col("a.n_regionkey").alias("rk"))
    right = joined.select(F.col("b.n_name").alias("nm"), F.col("a.n_regionkey").alias("rk"))
    assert plan_key(left, inputs) != plan_key(right, inputs)
    # and re-deriving the same side still shares a key (fresh exprIds)
    n2 = load_table(spark, sf_dir, "nation")
    a2, b2 = n2.alias("a"), n2.alias("b")
    joined2 = a2.join(b2, F.col("a.n_nationkey") == F.col("b.n_nationkey"))
    left2 = joined2.select(
        F.col("a.n_name").alias("nm"), F.col("a.n_regionkey").alias("rk")
    )
    assert plan_key(left, inputs) == plan_key(left2, inputs)


def test_materialization_leaves_no_staging_dirs(spark, sf_dir):
    """The atomic temp-dir + rename path must clean its staging dirs on
    success and leave exactly the keyed dataset behind."""
    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/nation.parquet"]
    _r, hit = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    assert hit is False
    entries = sorted(os.listdir(wh))
    assert len(entries) == 1 and not entries[0].startswith("."), entries
    assert os.path.exists(os.path.join(wh, entries[0], "_SUCCESS"))


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


def test_crashed_writer_leftover_is_replaced(spark, sf_dir):
    """A dataset dir WITHOUT the _SUCCESS marker (writer died mid-flight)
    must be treated as garbage and replaced, not block materialization."""
    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/nation.parquet"]
    key = plan_key(_agg(spark, sf_dir), inputs)
    stale = os.path.join(wh, key)
    os.makedirs(stale)
    open(os.path.join(stale, "part-junk.parquet"), "w").write("not parquet")
    r, hit = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    assert hit is False
    assert os.path.exists(os.path.join(stale, "_SUCCESS"))
    assert canonical_rows(r.toPandas()) == canonical_rows(_agg(spark, sf_dir).toPandas())
