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

import logging
import os
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger("filemap_spark.blocked")

# The deployed parameterizations, as CODE (round 14, VERDICT r13 task 5 —
# the scale knob was prose before). (n_blocks, block_bits, threshold):
#
# CORPUS_MATCHED_KNOB — this synthetic corpus is all-distinct with nearest
# pairs at hamming 13-15, so catching them needs threshold 15 < n_blocks,
# forcing 16 x 4-bit blocks. 4-bit buckets take only 16 values, so the
# block join's candidate volume is ~ n_distinct²/32 — fine at corpus size,
# QUADRATIC at web scale.
#
# WEB_SCALE_KNOB — a web deployment hunting re-encodes/near-identicals at
# hamming <= 7 runs the SAME plan with 8 x 8-bit blocks; 256-value buckets
# collapse candidate volume to per-bucket group sizes (the
# `dedup_simhash` setting, measured flat in SCALE.md).
CORPUS_MATCHED_KNOB = (16, 4, 15)
WEB_SCALE_KNOB = (8, 8, 7)

# Per-run candidate budget: the counter below warns when the measured
# pre-`distinct` candidate volume exceeds this many candidates per
# distinct signature — the signal that the corpus-matched knob is being
# run on a corpus that needs the web-scale one.
CANDIDATE_BUDGET_PER_ITEM = 64


def pigeonhole_candidate_volume(
    reps: DataFrame, sig_col: str, n_blocks: int, block_bits: int
) -> tuple[int, int]:
    """Measured pre-`distinct` candidate volume of the block join over a
    DISTINCT-signature frame: each (blk_idx, blk_val) bucket of m members
    contributes m·(m-1)/2 candidate pairs. One small aggregation over the
    hash-sized exploded frame (n_blocks rows per distinct signature —
    never touches documents or pixels), so it is cheap enough to run
    per-op as the scale counter. Returns (n_distinct, candidate_pairs)."""
    mask = (1 << block_bits) - 1
    buckets = (
        reps.select(
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(sig_col, b * block_bits).bitwiseAND(
                            F.lit(mask)
                        )
                        for b in range(n_blocks)
                    ]
                )
            ).alias("blk_idx", "blk_val")
        )
        .groupBy("blk_idx", "blk_val")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    row = buckets.agg(
        (F.sum(F.col("m") * (F.col("m") - 1)) / 2).alias("cand"),
        (F.sum("m") / n_blocks).alias("n_distinct"),
    ).collect()[0]
    return int(row["n_distinct"] or 0), int(row["cand"] or 0)


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

    The knob (n_blocks, block_bits, threshold) picks the recall/volume
    trade: pass CORPUS_MATCHED_KNOB (16, 4, 15) for corpora whose near
    pairs sit at high hamming distances (candidate volume ~n²/32 — fine
    small, quadratic at web scale) or WEB_SCALE_KNOB (8, 8, 7) for
    re-encode hunting over large corpora. Unless FILEMAP_CANDIDATE_STATS=0,
    every run measures the pre-`distinct` candidate volume (one agg over
    the hash-sized bucket frame), logs it, and emits a RuntimeWarning when
    it exceeds CANDIDATE_BUDGET_PER_ITEM × n_distinct — the switch-knob
    signal.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b, ordered."""
    reps = hashes.select(hash_col).distinct()
    if os.environ.get("FILEMAP_CANDIDATE_STATS", "1") != "0":
        n_distinct, cand = pigeonhole_candidate_volume(
            reps, hash_col, n_blocks, block_bits
        )
        _LOG.info(
            "pigeonhole candidates: %d over %d distinct %s "
            "(knob=%d x %d-bit, T<=%d)",
            cand, n_distinct, hash_col, n_blocks, block_bits, threshold,
        )
        if cand > CANDIDATE_BUDGET_PER_ITEM * max(n_distinct, 1):
            warnings.warn(
                f"pigeonhole candidate volume {cand} exceeds "
                f"{CANDIDATE_BUDGET_PER_ITEM}x the {n_distinct} distinct "
                f"signatures with knob ({n_blocks}, {block_bits}, "
                f"{threshold}); at corpus scale switch to WEB_SCALE_KNOB "
                f"{WEB_SCALE_KNOB} (or raise the block width) before the "
                "join quadratics",
                RuntimeWarning,
                stacklevel=2,
            )
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
