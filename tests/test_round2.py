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


def test_ohlc_tie_resolution_is_event_id_deterministic(spark, tmp_path):
    """ts_resample_ohlc's open/close under EQUAL timestamps must resolve by
    event_id through the shared okey — manufactured ties, since the
    contract data's sub-second timestamps may never collide."""
    import os

    from filemap_spark import all_queries

    sf_dir = str(tmp_path)
    rows = [
        # one hour bucket, two events at the SAME microsecond
        (1, 1_700_000_000_000_000, 10, "click", 5.0, "{}"),
        (2, 1_700_000_000_000_000, 11, "click", 9.0, "{}"),
        (3, 1_700_000_100_000_000, 12, "click", 7.0, "{}"),
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["event_id", "us", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["us"], unit="us")
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    ).write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))

    got = all_queries()["ts_resample_ohlc"](spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    # open = event 1 (lower event_id among the tied pair), close = event 3
    assert r["open"] == 5.0 and r["close"] == 7.0
    assert r["high"] == 9.0 and r["low"] == 5.0 and r["n_events"] == 3


def test_scd2_half_open_boundary(spark, tmp_path):
    """join_point_in_time_scd2's [valid_from, valid_to) bounds: a fact at
    EXACTLY a version boundary must land in the NEW version, never both or
    neither — manufactured boundary-exact rows."""
    import os

    from filemap_spark import all_queries

    sf_dir = str(tmp_path)
    import pandas as pd

    supp = pd.DataFrame({"s_suppkey": [0], "s_name": ["S0"], "s_nationkey": [0],
                         "s_acctbal": [0.0]})
    spark.createDataFrame(supp).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "supplier.parquet")
    )
    # suppkey 0: stagger 0 days -> boundaries exactly 1996-01-01 / 1998-07-01
    li = pd.DataFrame(
        {
            "l_suppkey": [0, 0, 0, 0],
            "l_shipdate": pd.to_datetime(
                ["1995-12-31", "1996-01-01", "1998-06-30", "1998-07-01"]
            ),
            "l_quantity": [1.0, 2.0, 4.0, 8.0],
        }
    )
    spark.createDataFrame(li).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    )
    got = {
        r["version"]: (r["n_items"], r["sum_qty"])
        for r in all_queries()["join_point_in_time_scd2"](spark, sf_dir).collect()
    }
    # v1 gets only 1995-12-31; v2 gets BOTH boundary starts 96-01-01 and
    # interior 98-06-30; v3 gets exactly 1998-07-01
    assert got == {1: (1, 1), 2: (2, 6), 3: (1, 8)}
    assert sum(n for n, _ in got.values()) == 4  # every fact exactly once
