"""Salted-join skew mitigation: correctness (== the plain join) and plan
shape (the shuffle key includes the salt, so a hot key spreads over `salts`
reducers instead of one straggler)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from filemap_spark.functions.skew import SALT_COL, salted_join


def _skewed_frames(spark):
    # 20k rows, ~90% of them on key 0 — the classic hot-key fact table.
    big = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise(F.pmod(F.col("id"), F.lit(100)))
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    return big, small


def _checksum(df):
    n = df.count()
    if n == 0:
        return (0, 0)
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    h = df.select(
        F.bit_xor(F.xxhash64(*cols)).alias("x"), F.count("*").alias("n")
    ).collect()[0]
    return (h["x"], h["n"])


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _checksum(salted) == _checksum(plain)


def test_salted_left_join_keeps_unmatched(spark):
    big, small = _skewed_frames(spark)
    lonely = small.where(F.col("k") >= 50)  # keys 0..49 unmatched in small
    plain = big.join(lonely, "k", "left")
    salted = salted_join(big, lonely, "k", salts=4, how="left")
    assert _checksum(salted) == _checksum(plain)


def test_salt_reaches_the_shuffle_key(spark):
    """The whole point: the exchange must partition on (k, salt), not k."""
    big, small = _skewed_frames(spark)
    # disable broadcast so the join actually shuffles both sides
    joined = salted_join(big.hint("merge"), small, "k", salts=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert any(
        "hashpartitioning" in line and SALT_COL in line and "k#" in line
        for line in plan.splitlines()
    ), plan


def test_salt_is_deterministic_across_builds(spark):
    big, small = _skewed_frames(spark)
    a = _checksum(salted_join(big, small, "k", salts=8))
    b = _checksum(salted_join(big, small, "k", salts=8))
    assert a == b


def test_aqe_skew_join_enabled_in_session(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_salted_join_rejects_outer_types(spark):
    """right/full outer would surface unmatched small-side rows once per
    salt replica — the helper must refuse rather than silently corrupt."""
    import pytest

    big, small = _skewed_frames(spark)
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", salts=4, how=how)
    # the preserved-big-side types still build a plan
    for how in ("inner", "left", "left_semi", "left_anti"):
        salted_join(big, small, "k", salts=4, how=how).schema
