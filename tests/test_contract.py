"""Differential contract test — every registered query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS gate (SURVEY §5.2) at sf0.001 for speed;
`scripts/verify_local.py --sf /root/testdata/sf0.01` is the pre-commit
full-scale run.
"""

from __future__ import annotations

import pytest

from filemap_spark import all_oracle, all_queries
from filemap_spark.testing import run_one

QUERIES = all_queries()
ORACLE = all_oracle()


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert len(df.collect()) > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    res = run_one(name, QUERIES[name], ORACLE.get(name), spark, sf_dir)
    assert res.ok, str(res)
