"""filemap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference file-based map-reduce system
(`mfisk/filemap`, mounted read-only at /root/reference — empty at build time,
see SURVEY.md §0 for the capability model and provenance tags).

Architecture: declarative DataFrame/SQL plans optimized by Catalyst; Python
only at the quarantined UDF / RDD.pipe boundaries (SURVEY §3.2). Every
operator is registered in `filemap_spark.registry` together with its DuckDB
oracle SQL so the driver's differential check covers the full inventory.
"""

from filemap_spark.registry import all_oracle, all_queries  # noqa: F401
from filemap_spark.session import get_spark  # noqa: F401

__all__ = ["all_oracle", "all_queries", "get_spark"]
