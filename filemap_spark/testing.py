"""Local differential harness mirroring the driver's correctness gate.

The driver runs each `queries()[name]` on Spark and `oracle_sql()[name]` on
DuckDB over the same parquet, then compares row-count + schema +
order-insensitive value-hash (SURVEY §5.2). This module reproduces that
check locally so every operator is validated before the driver ever sees it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from filemap_spark.io import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _fmt_scalar(v: Any) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, (np.floating, float)):
        if isinstance(v, float) and math.isnan(v) or isinstance(v, np.floating) and np.isnan(v):
            return "<NULL>"
        r = round(float(v), 6)
        if r == 0:
            r = 0.0  # normalize -0.0
        return format(r, ".6f")
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(_fmt_scalar(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if v is pd.NaT:
        return "<NULL>"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    """Sort columns by name, stringify values (floats at 6dp), sort rows."""
    cols = sorted(pdf.columns)
    pdf = pdf.reindex(cols, axis=1)
    rows = [tuple(_fmt_scalar(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    rows.sort()
    return list(cols), rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = 0
    oracle_rows: int = 0
    diffs: list[str] = field(default_factory=list)

    def __str__(self) -> str:  # pragma: no cover - debug aid
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name} ({self.spark_rows} rows)"
        if not self.ok:
            msg += f" — {self.detail}"
            for d in self.diffs[:6]:
                msg += f"\n    {d}"
        return msg


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name, ok=True, spark_rows=len(spark_pdf), oracle_rows=len(duck_pdf))
    s_cols, s_rows = canonical_rows(spark_pdf)
    d_cols, d_rows = canonical_rows(duck_pdf)
    if s_cols != d_cols:
        res.ok = False
        res.detail = f"schema mismatch: spark={s_cols} oracle={d_cols}"
        return res
    if len(s_rows) != len(d_rows):
        res.ok = False
        res.detail = f"row-count mismatch: spark={len(s_rows)} oracle={len(d_rows)}"
    if s_rows != d_rows:
        res.ok = False
        res.detail = res.detail or "value mismatch"
        for sr, dr in zip(s_rows, d_rows):
            if sr != dr:
                res.diffs.append(f"spark={sr} oracle={dr}")
            if len(res.diffs) >= 6:
                break
    return res


def run_one(name: str, fn, sql: str | None, spark, sf_dir: str) -> CompareResult:
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if sql is None:
        ok = len(spark_pdf) >= 0
        return CompareResult(name, ok=ok, detail="rows-only", spark_rows=len(spark_pdf))
    con = duck_connect(sf_dir)
    try:
        duck_pdf = con.execute(sql).df()
    finally:
        con.close()
    return compare_frames(name, spark_pdf, duck_pdf)
