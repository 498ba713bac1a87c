"""Skew mitigation utilities (SCALE.md "skew" section).

Spark's own defenses cover most skew: partial aggregation combines hot
grouping keys map-side, and AQE's skew-join split
(`spark.sql.adaptive.skewJoin.enabled`, on in the session factory) splits
oversized SORT-MERGE join partitions at runtime. The remaining gap is a
skewed SHUFFLED HASH or pre-AQE join where one key floods a single reducer:
the classic fix is salting, provided here as a first-class helper so
pipelines don't re-derive it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__fm_salt"


def salted_join(
    big: DataFrame, small: DataFrame, key: str, salts: int = 8, how: str = "inner"
) -> DataFrame:
    """Skew-safe equi-join of a skewed `big` frame against a `small` frame.

    `big` rows scatter across `salts` sub-keys via a deterministic
    row-content hash (pmod(xxhash64(all cols)) — no rand(), so replays and
    retries land identically); `small` is replicated once per salt id with
    `explode(sequence(...))`. Joining on (key, salt) turns one hot-key
    reducer into `salts` evenly-loaded ones at the cost of a `salts`×
    blow-up of the SMALL side only — the standard trade when the small side
    is dim-sized but too big (or the join type wrong) for a broadcast.

    Result is column-identical to `big.join(small, key, how)` for the
    SUPPORTED join types (salt columns are internal); row multiset equality
    is pinned by tests/test_skew.py. Only inner/left/left_semi/left_anti
    (big side preserved) are supported: in a right or full outer join an
    unmatched small-side row would surface once PER SALT REPLICA — a
    multiset-wrong result — so those types raise instead of silently
    corrupting.
    """
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "replicating the small side per salt would emit unmatched "
            "small-side rows once per replica under right/full outer"
        )
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    )
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<long>"))
    )
    return big_s.join(small_s, [key, SALT_COL], how).drop(SALT_COL)
