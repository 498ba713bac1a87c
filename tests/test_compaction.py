"""Small-file compaction (round 5, VERDICT r4 task 6): the rewrite must
produce exactly the target file count, lose/duplicate nothing, and leave
the data range-clustered on the sort key (disjoint per-file min/max →
row-group pruning works on later scans)."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq

from filemap_spark.io import load_table
from filemap_spark.operators.scans import compact_parquet_dataset


def _parquet_files(d: str) -> list[str]:
    return sorted(glob.glob(os.path.join(d, "*.parquet")))


def test_compaction_file_count_and_fidelity(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="filemap_compact_test_")
    frag, compact = os.path.join(base, "frag"), os.path.join(base, "out")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(64).write.mode("overwrite").parquet(frag)
    assert len(_parquet_files(frag)) == 64

    compact_parquet_dataset(spark, frag, compact, "o_orderkey", 4)
    files = _parquet_files(compact)
    assert len(files) == 4

    # row fidelity: nothing lost, nothing duplicated
    src = orders.select("o_orderkey").toPandas()["o_orderkey"]
    dst = spark.read.parquet(compact).select("o_orderkey").toPandas()["o_orderkey"]
    assert sorted(src) == sorted(dst)

    # range clustering: per-file [min, max] spans are disjoint
    spans = []
    for f in files:
        pdf = pq.read_table(f, columns=["o_orderkey"]).to_pandas()
        if len(pdf):
            spans.append((pdf["o_orderkey"].min(), pdf["o_orderkey"].max()))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo, spans


def test_compaction_max_records_cap_splits_skew(spark, sf_dir):
    """A skewed range slice must split at the maxRecordsPerFile cap rather
    than produce one oversized file."""
    base = tempfile.mkdtemp(prefix="filemap_compact_cap_")
    frag, compact = os.path.join(base, "frag"), os.path.join(base, "out")
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    orders.repartition(16).write.mode("overwrite").parquet(frag)
    cap = max(n // 8, 1)
    compact_parquet_dataset(
        spark, frag, compact, "o_orderkey", 2, max_records_per_file=cap
    )
    files = _parquet_files(compact)
    assert len(files) >= 4  # 2 range slices, each split by the cap
    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= cap
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == n
