"""Operator registry — the single source of truth for the graded inventory.

Each operator module registers its queries with the `@query` decorator,
pairing the PySpark implementation with the DuckDB oracle SQL (or
`oracle=None` for rows-only ops: approx sketches, sinks, streaming-semantic
checks). `__spark_entry__.py` re-exports `all_queries()` / `all_oracle()`
straight from here, so a SURVEY §2 row is "done" exactly when it appears in
this registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Operator modules; importing them populates the registry.
_MODULES = (
    "filemap_spark.operators.scans",
    "filemap_spark.operators.filters",
    "filemap_spark.operators.joins",
    "filemap_spark.operators.aggregates",
    "filemap_spark.operators.windows",
    "filemap_spark.operators.sorts",
    "filemap_spark.operators.setops",
    "filemap_spark.operators.scalars",
    "filemap_spark.operators.streaming",
    "filemap_spark.operators.udfs",
    "filemap_spark.operators.text",
    "filemap_spark.operators.similarity",
    "filemap_spark.operators.pipeline",
    "filemap_spark.operators.multimodal",
    "filemap_spark.operators.relational",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    for mod in _MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracle() -> dict[str, str]:
    _load_all()
    return dict(_ORACLE)
