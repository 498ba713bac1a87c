"""Output-schema guard (round 5, VERDICT r4 task 3) — kills the
r1 agg_collect_sorted / r4 emb_pca_project failure class permanently.

The grading driver pandas-lexsorts EVERY declared result, including
rows-only ones; a top-level array/map/struct cell is unhashable there and
crashes the canonicalizer. Two layers of defense, both exercised here:

  1. `complex_output_columns` — a lazy schema inspection wired into
     `run_one`, so the full-registry contract test (tests/test_contract.py)
     and `scripts/verify_local.py` reject any declared query whose schema
     contains a complex type, with no extra execution cost.
  2. `driver_canon` — a faithful reproduction of the driver's raw-frame
     lexsort, applied to every result in `run_one` so a canon crash that
     somehow slips past the schema check still reproduces locally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from filemap_spark.testing import complex_output_columns, driver_canon, run_one


def test_guard_red_on_array_column(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
    assert complex_output_columns(df.schema) == ["v"]


def test_guard_red_on_map_and_struct(spark):
    df = spark.sql(
        "SELECT 1 AS id, map('a', 1) AS m, named_struct('x', 1) AS s"
    )
    assert complex_output_columns(df.schema) == ["m", "s"]


def test_guard_green_on_scalars(spark):
    df = spark.sql(
        "SELECT 1 AS i, 1.5 AS d, 'x' AS s, timestamp'2024-01-01' AS t, "
        "cast(NULL AS binary) AS b"
    )
    assert complex_output_columns(df.schema) == []


def test_run_one_rejects_arrayed_query(spark, sf_dir):
    """run_one must fail (not crash, not pass) on a deliberately-arrayed
    dummy query — the exact shape that shipped the r4 emb_pca_project
    FAIL."""

    def arrayed(spark, sf_dir):
        return spark.createDataFrame(
            [(1, np.array([1.0, 2.0]).tolist())], "id long, pc array<double>"
        )

    res = run_one("dummy_arrayed", arrayed, None, spark, sf_dir)
    assert not res.ok
    assert "complex-typed" in res.detail


def test_driver_canon_crashes_on_ndarray_cell():
    """The faithful driver canonicalizer must raise on unhashable cells
    exactly as the driver does (CORRECTNESS_r04 emb_pca_project row)."""
    pdf = pd.DataFrame({"id": [2, 1], "pc": [np.zeros(2), np.ones(2)]})
    with pytest.raises(TypeError):
        driver_canon(pdf)


def test_driver_canon_sorts_scalars():
    pdf = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    out = driver_canon(pdf)
    assert list(out.columns) == ["a", "b"]
    assert list(out["b"]) == [1, 2]


def test_all_registered_schemas_scalar_only(spark, sf_dir):
    """Every declared query's output schema is complex-type-free. Schema
    inspection is lazy for the overwhelming majority of ops, but the
    checkpoint-bearing ones execute their materialization jobs at plan
    build — sweeping 327 ops serially took 139 s (r18 durations
    profile), the single slowest test in the suite. Plan building is
    driver-side and Spark job submission is thread-safe, so the sweep
    fans out over a 16-thread pool (same assertions, 139 s → ~40 s —
    VERDICT r17 task 3, making the suite fit the driver's verify
    window)."""
    from concurrent.futures import ThreadPoolExecutor

    from filemap_spark import all_queries

    def check(item):
        name, fn = item
        return name, complex_output_columns(fn(spark, sf_dir).schema)

    with ThreadPoolExecutor(max_workers=16) as pool:
        results = list(pool.map(check, sorted(all_queries().items())))
    offenders = {name: cols for name, cols in results if cols}
    assert not offenders, offenders
