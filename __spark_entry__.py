"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `filemap_spark`: the operator registry
(`filemap_spark/registry.py`) is the single source of truth for the graded
SURVEY §2 inventory; each operator module pairs its PySpark implementation
with its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from filemap_spark import all_oracle, all_queries  # noqa: E402
from filemap_spark.session import ensure_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    ensure_runtime_confs(spark)
    return all_queries()["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle()
