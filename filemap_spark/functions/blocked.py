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


def fingerprint_near_dup_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    n_blocks: int,
    block_bits: int,
    threshold: int,
) -> DataFrame:
    """Doc-level near-dup pairs from a (id, 64-bit fingerprint) frame —
    the full rep-collapse → pigeonhole → expansion pipeline shared by
    `mm_dhash_near_dup` and `mm_audio_fingerprint_dedup` (extracted
    round 13 for the same no-silent-divergence reason as
    `block_pigeonhole_pairs`):

    1. collapse to one row per DISTINCT fingerprint (identical items
       share a fingerprint, so a k-member cluster contributes ONE
       signature to the join, not k²/2 candidate rows per block);
    2. cross-fingerprint candidates via the pigeonhole join;
    3. expand to id level — cross-group via two membership joins,
       intra-group (hamming 0) via a same-fingerprint self-join.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b, ordered."""
    reps = hashes.select(hash_col).distinct()
    hash_pairs = block_pigeonhole_pairs(
        reps, id_col=hash_col, sig_col=hash_col,
        n_blocks=n_blocks, block_bits=block_bits, threshold=threshold,
    ).select(
        F.col("id_a").alias("ha"), F.col("id_b").alias("hb"), "hamming"
    )
    ma = hashes.select(
        F.col(hash_col).alias("ha"), F.col(id_col).alias("id_a")
    )
    mb = hashes.select(
        F.col(hash_col).alias("hb"), F.col(id_col).alias("id_b")
    )
    cross = (
        hash_pairs.join(ma, "ha")
        .join(mb, "hb")
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            "hamming",
        )
    )
    x, y = hashes.alias("x"), hashes.alias("y")
    intra = (
        x.join(
            y,
            (F.col(f"x.{hash_col}") == F.col(f"y.{hash_col}"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(intra).orderBy("doc_a", "doc_b")
