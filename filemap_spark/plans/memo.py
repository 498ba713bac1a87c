"""Dataset memoization — filemap's signature feature re-expressed for Spark
(SURVEY §4.1/§4.3.1).

The reference caches every dataset-directory output keyed by
(input files, command) and re-executes only work whose inputs or command
changed — "make for map-reduce" [K]. Catalyst has no cross-session result
cache, so this layer provides one: a content-addressed parquet warehouse
keyed by sha256(canonical optimized plan + input-file fingerprints).

- The plan string comes from Catalyst's OPTIMIZED logical plan, so two
  syntactically different but plan-equivalent queries share a cache entry.
- Input fingerprints are (path, size, mtime_ns) of every file under the
  registered input paths — touching an input invalidates, exactly like the
  reference's make-semantics.
- Materialization is a plain parquet write: on a cluster the warehouse is
  any shared path (HDFS/S3); hits replace the whole subtree with a scan,
  which also restores predicate pushdown over the cached result.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

_DEFAULT_WAREHOUSE = os.path.join(tempfile.gettempdir(), "filemap_warehouse")


def _input_fingerprint(paths: Iterable[str]) -> str:
    parts: list[str] = []
    for root in sorted(paths):
        if os.path.isfile(root):
            st = os.stat(root)
            parts.append(f"{root}:{st.st_size}:{st.st_mtime_ns}")
            continue
        for dirpath, _dirnames, filenames in sorted(os.walk(root)):
            for fname in sorted(filenames):
                fpath = os.path.join(dirpath, fname)
                st = os.stat(fpath)
                parts.append(f"{fpath}:{st.st_size}:{st.st_mtime_ns}")
    return "\n".join(parts)


def plan_key(df: DataFrame, input_paths: Iterable[str]) -> str:
    """Content address = sha256(canonical optimized plan ⊕ input fingerprints).

    Catalyst allocates fresh expression IDs (`col#123`) per plan
    construction, so raw plan strings never collide across sessions. The
    IDs are canonically RENUMBERED (first occurrence → e0, e1, ...), not
    erased: erasing would merge two plans that differ only in *which*
    same-named column they reference (e.g. the left vs right copy in a
    self-join), silently returning the wrong cached result. Renumbering
    keeps plan-equivalent queries on one key while distinct column
    references stay distinguishable.
    """
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    ids: dict[str, str] = {}
    plan = re.sub(
        r"#(\d+L?)", lambda m: "#" + ids.setdefault(m.group(1), f"e{len(ids)}"), plan
    )
    digest = hashlib.sha256()
    digest.update(plan.encode())
    digest.update(b"\x00")
    digest.update(_input_fingerprint(input_paths).encode())
    return digest.hexdigest()


def cached(
    spark: SparkSession,
    df: DataFrame,
    input_paths: Iterable[str],
    warehouse: str | None = None,
) -> tuple[DataFrame, bool]:
    """Memoize df's result. Returns (result_df, was_hit).

    Miss: materialize to warehouse/<key> and return a scan over it.
    Hit: return the scan without touching the computation.
    """
    warehouse = warehouse or os.environ.get("FILEMAP_WAREHOUSE", _DEFAULT_WAREHOUSE)
    key = plan_key(df, input_paths)
    out = os.path.join(warehouse, key)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return spark.read.parquet(out), True
    # Materialize to a temp dir and atomically rename into place: writing the
    # final path directly with overwrite races concurrent sessions sharing a
    # warehouse (overwrite deletes _SUCCESS mid-flight under a reader that
    # just passed the marker check). rename() failing means another writer
    # won — their result is byte-equivalent by construction of the key.
    import shutil

    os.makedirs(warehouse, exist_ok=True)
    staging = tempfile.mkdtemp(dir=warehouse, prefix=f".{key[:16]}.tmp.")
    tmp_out = os.path.join(staging, "data")
    try:
        df.write.parquet(tmp_out)
        if os.path.isdir(out) and not os.path.exists(marker):
            # leftover from a writer that died mid-materialization — the
            # marker is the commit point, so an unmarked dir is garbage
            shutil.rmtree(out, ignore_errors=True)
        try:
            os.rename(tmp_out, out)
        except OSError:
            if not os.path.exists(marker):
                raise
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return spark.read.parquet(out), False
