"""Block-pigeonhole candidate generation for Hamming-bounded signature
pairs — shared by `dedup_simhash` (8×8-bit blocks, T ≤ 7) and
`mm_dhash_near_dup` (16×4-bit blocks, T ≤ 15). Extracted round 13: the
two ops carried near-verbatim copies of this join, which is exactly how
a fix to one silently misses the other.

The guarantee: splitting an (n_blocks · block_bits)-bit signature into
n_blocks equal blocks, any pair with Hamming distance ≤ threshold <
n_blocks must agree on at least one whole block (pigeonhole: the
differing bits touch at most `threshold` blocks). A block-equality
equi-join therefore has PERFECT recall at the threshold, shuffles like
LSH bucketing (one hash exchange on the block key), and never goes
cross-product — an OR of block equalities would fall back to a
broadcast-nested-loop O(N²) plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block_pigeonhole_pairs(
    frame: DataFrame,
    id_col: str,
    sig_col: str,
    n_blocks: int,
    block_bits: int,
    threshold: int,
) -> DataFrame:
    """Pairs (id_a, id_b, hamming) with id_a < id_b and
    hamming(sig_a, sig_b) <= threshold, generated via the block join.

    `frame` has one row per signer; `id_col` orders/identifies the pair
    sides (a doc id, or the signature itself when signers ARE distinct
    signatures — pass id_col == sig_col and the select collapses).
    Requires threshold < n_blocks for the recall guarantee."""
    if threshold >= n_blocks:
        raise ValueError(
            f"pigeonhole needs threshold < n_blocks, got {threshold} >= {n_blocks}"
        )
    mask = (1 << block_bits) - 1
    cols = [id_col] if id_col == sig_col else [id_col, sig_col]
    blocks = frame.select(
        *cols,
        F.posexplode(
            F.array(
                *[
                    F.shiftright(sig_col, b * block_bits).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("blk_idx", "blk_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    hamming = F.bit_count(
        F.col(f"a.{sig_col}").bitwiseXOR(F.col(f"b.{sig_col}"))
    )
    return (
        a.join(
            b,
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(hamming <= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()  # a pair can agree on several blocks
    )
