"""Synthetic pins for the structural unpartitioned-window sweep
(scripts/plan_audit.py, round 9 — VERDICT r8 task 6 + ADVICE r8).

Each test builds a minimal DataFrame exhibiting one branch of the
classifier and asserts the sweep's verdict, so a regression in the tree
walk (rather than in any operator) fails loudly. The expression-ordered
case (`lower(x) ASC`) is the r7/r8 regex blind spot the structural
detector exists to close."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from plan_audit import unpartitioned_window_violations  # noqa: E402


def _customer(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))


def test_partitioned_window_is_clean(spark, sf_dir):
    df = _customer(spark, sf_dir).select(
        "c_custkey",
        F.row_number()
        .over(Window.partitionBy("c_nationkey").orderBy("c_custkey"))
        .alias("rn"),
    )
    assert unpartitioned_window_violations(df) == []


def test_unpartitioned_window_over_scan_flagged(spark, sf_dir):
    df = _customer(spark, sf_dir).select(
        "c_custkey",
        F.row_number().over(Window.orderBy("c_acctbal", "c_custkey")).alias("rn"),
    )
    v = unpartitioned_window_violations(df)
    assert len(v) == 1 and "FileSourceScanExec" in v[0], v


def test_expression_ordered_unpartitioned_window_flagged(spark, sf_dir):
    """The r7/r8 regex blind spot: `lower(x) ASC` extracts to a `_w0`
    projected alias the old first-arg parse misclassified as a partition
    column. The structural sweep flags it via the subtree file scan."""
    df = _customer(spark, sf_dir).select(
        "c_custkey",
        F.row_number().over(Window.orderBy(F.expr("lower(c_name)"))).alias("rn"),
    )
    v = unpartitioned_window_violations(df)
    assert len(v) == 1 and "FileSourceScanExec" in v[0], v


def test_frame_first_window_flagged_even_on_bounded_input(spark, sf_dir):
    """`agg OVER ()` carries no order columns — banned outright, even over
    a 1-row bounded frame (the agg_decile_lift precedent: broadcast a
    1-row total instead)."""
    one = _customer(spark, sf_dir).agg(F.count("*").alias("n"))
    df = one.select(
        F.sum("n").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("t")
    )
    v = unpartitioned_window_violations(df)
    assert v and ("no order" in v[0] or "frame-only" in v[0]), v


def test_marker_named_window_over_file_scan_still_flagged(spark, sf_dir):
    """Round-9 hardening: the `__` naming convention NO LONGER exempts a
    window whose subtree reads a file scan — the structural check closes
    the rename-evader the r8 verdict called out."""
    df = (
        _customer(spark, sf_dir)
        .withColumn("__fsr_pid", F.col("c_custkey"))
        .select(
            "c_custkey",
            F.row_number().over(Window.orderBy("__fsr_pid")).alias("rn"),
        )
    )
    v = unpartitioned_window_violations(df)
    assert len(v) == 1 and "FileSourceScanExec" in v[0], v


def test_limit_bounded_window_is_exempt(spark, sf_dir):
    """A window over a TakeOrdered/GlobalLimit frame sees ≤ k rows no
    matter what the scan below produced (the text_zipf_fit top-100 rank)
    — exempt structurally, with ordinary column names."""
    top = _customer(spark, sf_dir).orderBy(F.desc("c_acctbal")).limit(50)
    df = top.select(
        "c_custkey",
        F.row_number().over(Window.orderBy("c_acctbal", "c_custkey")).alias("rn"),
    )
    assert unpartitioned_window_violations(df) == []


def test_ranks_offsets_window_stays_exempt(spark, sf_dir):
    """The one legitimate exempt shape: ranks.py's bounded offsets cumsum
    (numPartitions rows behind the persisted ranged relation) — the sweep
    must stay clean on every with_global_cumsum consumer."""
    from filemap_spark.functions.ranks import with_global_rank

    df = with_global_rank(
        _customer(spark, sf_dir), "c_acctbal", "c_custkey", rank_col="rk"
    )
    assert unpartitioned_window_violations(df) == []
