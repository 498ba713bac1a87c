"""Round-2 mechanism tests: alternating-star connected components,
simhash join plan shape, floor-semantics timestamp normalization, and the
bounded executor-side index cache."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from filemap_spark import all_queries
from filemap_spark.io import load_table

QUERIES = all_queries()


def test_alternating_star_on_deep_path_graph(spark):
    """A 64-node path is the worst case for plain min-label propagation
    (needs 64 = diameter rounds); the alternating star algorithm must
    resolve it within its 12-round O(log n) budget. A second component and
    edge-duplication/reversal are thrown in to exercise canonicalization."""
    from filemap_spark.operators.relational import alternating_star_components

    path_edges = [(i, i + 1) for i in range(63)]  # component min = 0
    other = [(1000 + i, 1001 + i) for i in range(5)]  # component min = 1000
    noisy = path_edges + [(v, u) for (u, v) in path_edges] + other + [(3, 3)]
    edges = spark.createDataFrame(noisy, "u long, v long")
    got = {
        r["node"]: r["component"]
        for r in alternating_star_components(edges).collect()
    }
    assert got == {**{i: 0 for i in range(64)}, **{1000 + i: 1000 for i in range(6)}}


def test_simhash_candidate_join_is_not_nested_loop(spark, sf_dir):
    """The round-1 OR-of-block-equalities predicate planned a
    BroadcastNestedLoopJoin (O(N^2) at scale); the exploded
    (block_idx, block_val) form must plan a hash-partitioned equi-join."""
    plan = QUERIES["dedup_simhash"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ns_timestamp_normalization_floors_pre_epoch(spark, tmp_path):
    """io.load_table's ns->us conversion must FLOOR (DuckDB's `//`), not
    truncate toward zero — pre-1970 timestamps differ by 1us otherwise."""
    sf_dir = str(tmp_path)
    ns_values = [-2_000_000_001, -1500, -1000, -999, 0, 999, 1500, 2500]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(ns_values)], "event_id long, ts long"
    )
    df.write.parquet(os.path.join(sf_dir, "events.parquet"))
    got = {
        r["event_id"]: r["us"]
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    expected = {i: v // 1000 for i, v in enumerate(ns_values)}  # python // floors
    assert got == expected


def test_stream_topk_is_block_size_invariant(spark):
    """The streaming top-k merge must produce IDENTICAL results whatever the
    index block size — including pathological 7-row blocks where every merge
    straddles block boundaries and ties must re-rank by real nbr_id. This is
    the exactness proof that lets the worker hold O(block) memory instead of
    the whole index (round-3 rewrite)."""
    import pyarrow.parquet as pq

    from filemap_spark.operators.similarity import (
        _index_location,
        _normalized_matrix,
        _stream_topk_chunk,
    )

    path, _ = _index_location("/root/testdata/sf0.001")
    pdf = pq.read_table(path, columns=["vec_id", "embedding"]).to_pandas()
    q_ids, q_mat = _normalized_matrix(pdf.head(40))
    reference = _stream_topk_chunk(q_ids, q_mat, path, k=5, block_rows=1 << 20)
    assert len(reference) == 40 * 5
    for block_rows in (7, 64, 250):
        got = _stream_topk_chunk(q_ids, q_mat, path, k=5, block_rows=block_rows)
        assert got.to_dict("list") == reference.to_dict("list"), block_rows
