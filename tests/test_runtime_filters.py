"""Runtime-adaptive scale mechanisms, demonstrated END-TO-END rather than
asserted as session confs: (1) AQE detects and splits a genuinely skewed
sort-merge-join partition (`SortMergeJoin(skew=true)` + `AQEShuffleRead
... skewed` in the finalized adaptive plan); (2) the runtime bloom-filter
rule injects a `might_contain` pruning predicate on the fact side of a
selective dim join. These are the two built-in mechanisms SCALE.md leans on
for the 100 TB hot-key and selective-join paths, complementing the manual
`salted_join` helper (tests/test_skew.py).

Both tests temporarily tighten thresholds (local data is tiny vs the
multi-MB/GB production defaults) and restore every conf afterwards so the
shared session is untouched.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from filemap_spark.io import load_table

_UNSET = object()


@contextlib.contextmanager
def _confs(spark, settings: dict[str, str]):
    saved: dict[str, object] = {}
    for key, val in settings.items():
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = _UNSET
        spark.conf.set(key, val)
    try:
        yield
    finally:
        for key, old in saved.items():
            if old is _UNSET:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def test_aqe_splits_skewed_join_partition(spark):
    """A 90%-hot-key fact joined without broadcast must come out of AQE with
    the hot partition SPLIT (skew=true), not as one straggler task. The
    consumer is a global agg on purpose: skew splitting destroys the join
    output's hash distribution, so a keyed consumer would make AQE decline
    the rewrite (it never adds an extra shuffle) — exactly why SCALE.md
    routes keyed-output hot joins through salted_join instead."""
    settings = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.shuffle.partitions": "8",
    }
    with _confs(spark, settings):
        big = spark.range(300000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.pmod(F.col("id"), F.lit(1000)))
            .alias("k"),
            F.col("id").alias("v"),
        )
        med = spark.range(1000).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        q = big.join(med, "k").agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        [row] = q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead" in plan and "skewed" in plan
    # sanity: the answer is still the plain-join answer (90% of rows hit k=0)
    assert row["s"] is not None and row["s"] > 0


def test_bloom_filter_injected_for_selective_dim_join(spark, sf_dir):
    """A selective filter on the dim side of a shuffle join must inject a
    runtime bloom filter on the fact side (`might_contain` over a
    `bloom_filter_agg`), so at scale the fact scan drops non-joining rows
    before the shuffle. Plan-level check (the rule fires at optimization
    time); thresholds lowered because local tables are far below the
    production 10 GB application-side default."""
    settings = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    with _confs(spark, settings):
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").where("p_size = 1")
        q = li.join(part, li.l_partkey == part.p_partkey).select(
            "l_orderkey", "p_name"
        )
        plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, plan
    assert "bloom_filter_agg" in plan
