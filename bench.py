#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Runs the ★ queries of SURVEY §2 (BASELINE.md's suite) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Per query: min of THREE full (build + execute)
runs — matching BASELINE.md table 2's warm methodology; round-2 showed two
runs leave enough JIT noise to manufacture phantom 15-70% regressions.

Also emits `calibration`: BASELINE.md's own plain-sum pricing query
measured in the SAME process with alternating (equal-warmth) runs.
`ratio_same_rig` = hash-exact scaled-int64 form / plain-FP-sum form — the
measured exactness premium of the one headline query whose implementation
deliberately differs from the baseline's. The 2x pass bar itself is defined
against BASELINE.md table 2's recorded warm seconds (per its §target), which
`queries` reports; the calibration contextualizes cross-round rig drift.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from filemap_spark import all_queries, get_spark

HEADLINE = (
    "agg_pricing_summary",
    "join_multiway_star",
    "topk_global",
    "win_topk_per_group",
    "stream_session_window",
    "stream_tumbling_window",
    "text_wordcount",
    "sim_cosine_topk",
)

# Declared 2x pass bars (round 6): BASELINE.md Table 2 warm seconds for the
# headline suite, Table 3 for the LLM suite, and Table 4/4b for the round-5
# additions (advisory in round 5, ENFORCED from round 6), all at sf0.1. The
# JSON output reports bar_ratio = measured / (2 * baseline * rig_load) per
# query and a `breach` list of queries over their bar — a regression shows
# up in BENCH_rN.json itself instead of waiting for a judge. (The process
# still exits 0 so the driver always records the bench line.)
BASELINE_WARM_SF01 = {
    "agg_pricing_summary": 0.82,
    "join_multiway_star": 1.95,
    "topk_global": 1.08,
    "win_topk_per_group": 0.97,
    "stream_session_window": 0.57,
    "stream_tumbling_window": 0.54,
    "text_wordcount": 0.16,
    "sim_cosine_topk": 34.53,
    "dedup_near_jaccard": 1.22,
    "dedup_paragraph_jaccard": 1.12,
    "text_unigram_logprob": 0.67,
    "dedup_incremental_lsh_delta": 3.36,
    # round-5 additions (BASELINE.md Table 4/4b), bars effective round 6
    "join_point_in_time_scd2": 1.11,
    "ts_resample_ohlc": 0.62,
    "dedup_url_canonical": 0.44,
    "sample_temperature_mix": 0.59,
    "text_hash_features": 0.49,
    "sink_compact_small_files": 1.27,
    "dedup_line_level": 1.36,
    "agg_corr_cov": 1.18,
    "win_cumulative_distinct": 0.89,
    "stream_stream_join": 0.43,
    # round-6 staged additions, bars ENFORCED from round 7 (BASELINE.md
    # Table 5 = first quiet-rig sf0.1 run, canary 0.416 s)
    "join_min_cost_supplier_q2": 1.17,
    # q7: r6-era 0.79 re-recorded r16 (BASELINE.md §adjudications-r15
    # addendum — the min(old,new) rule's stale-fast exception, applied
    # explicitly: the rig has not reproduced 0.79 since r13, and the bar
    # grazed 0.997 on a certified-quiet r15 run). New denominator = min
    # over two scan-certified r16 windows (1.175 / 1.083).
    "join_nation_volume_q7": 1.08,
    "agg_profit_by_nation_q9": 0.69,
    "join_sole_late_shipper_q21": 0.84,
    "graph_triangle_count": 0.81,
    "text_rouge2_recall": 0.87,
    "sim_maxsim_multivector": 0.99,
    "agg_decile_lift": 0.50,
    "win_pareto_share": 0.41,
    # waves 7-9 (BASELINE.md Table 5b = round-6 driver bench run at
    # rig_load 1.21; Table 5b' r13 re-recorded all seven on a
    # certified-quiet rig — only the two entries marked below came out
    # FASTER, so per min(old, new-certified) they tightened and the
    # other five keep their stricter r6 denominators)
    "agg_ks_two_sample": 0.47,
    "text_ndcg_eval": 1.58,
    "emb_hamming_topk": 0.33,
    "graph_jaccard_neighbors": 1.44,  # 5b' re-record r13
    "text_ngram_novelty": 1.02,  # 5b' re-record r13
    "pack_sequences_bestfit": 0.35,
    "win_concurrency_peak": 0.45,
    # round-13 multimodal family, denominators recorded r14 under the
    # scan-certified window protocol (BASELINE.md Table 6 —
    # scripts/record_quiet_bars.py --family scan; decode-heavy Arrow/numpy
    # CPU work, scan family: no corpus-sized exchange anywhere)
    "mm_decode_png": 2.11,
    "mm_decode_jpeg": 2.20,
    "mm_dhash_near_dup": 12.64,
    "mm_audio_fingerprint_dedup": 10.62,
    # round-14 staged debuts, denominators recorded r15 (BASELINE.md
    # Table 7). Scan half: scan-certified window (pre/post 0.983/0.904).
    "mm_incremental_dhash_dedup": 5.88,
    "mm_incremental_audio_dedup": 3.71,
    "mm_scene_cut_y4m": 1.08,
    "sim_ann_pq": 1.41,
    "emb_matryoshka_eval": 2.60,
    # Shuffle half: first recorded r15 under a disclosed 1.167x window
    # (the strict 0.48 s shuffle gate never certified). RE-RECORDED r16
    # under two post-window-certified rigs (BASELINE.md Table 8 —
    # record_quiet_bars --window post, post scan/shuffle 0.694x/0.902x
    # and 0.706x/0.957x vs the re-recorded 0.54 s reference): five of
    # the six came out FASTER and tightened per min(old, new), which
    # also discharges ADVICE r15's baked-in-slack concern;
    # agg_weighted_percentile keeps its stricter r15 value. The BPE
    # pair's denominators time the merge-ARTIFACT-warm plan (VERDICT
    # r14 task 4) — the op's real steady-state path.
    "text_bpe_apply": 1.55,
    "text_bpe_pack_sequences": 2.36,
    "sample_shuffle_global": 0.30,
    "agg_weighted_percentile": 1.16,
    "graph_label_propagation": 3.26,
    "agg_gini_grouped": 0.74,
    # round-15 staged debuts, denominators recorded r16 (BASELINE.md
    # Table 8). Scan half: min over two scan-certified windows
    # (pre/post 0.935/0.790 and 0.883/0.706). Shuffle half (the NB
    # classifier pair + the Theil index): min over the same two
    # post-window-certified rigs as the re-records above.
    "dedup_cdc_chunks": 1.91,
    "ts_periodogram": 0.87,
    "text_quality_classifier": 1.65,
    "text_classifier_holdout_eval": 1.46,
    "agg_theil_index": 0.98,
    # round-16 staged debuts, denominators recorded r17 (BASELINE.md
    # Table 9): min over two post-certified windows per family, the
    # second with family-mates leading the batch so the denominator is
    # measured at the warmed-JIT position the bench suite actually
    # gates (the canary-adjacent first-op position reads 1.7-3x its
    # in-suite time; protocol note in Table 9). ts_mad_anomaly's
    # denominator times the FIXED odd-span-median plan (ADVICE r16
    # high — recorded after the two-CASE-sum fix landed).
    "ts_cusum_changepoint": 0.99,
    "ts_mad_anomaly": 0.94,
    "text_quality_incremental": 1.79,
    "text_dsir_importance": 1.46,
    "text_kneser_ney_logprob": 1.36,
    "text_contamination_ngram": 1.34,
    "text_contamination_incremental": 0.95,
    # round-17 staged debuts, GRADUATED r18 (BASELINE.md Table 10).
    # The strict certified-quiet protocol never fired in the r18 session
    # (28 probe/recorder windows over ~3 h, shuffle canary 1.3-6.0x —
    # the evidence is quoted in Table 10), so per the r15 Table-7
    # precedent these adopt the MIN over the disclosed loaded windows
    # (driver r17 bench, shuffle rig 1.669; session-1 r18 baseline
    # bench, 1.561) and MUST be re-recorded under min(old, new) at the
    # next certified-quiet opportunity. Both denominators time the
    # pre-C3/C4 plan shapes — conservative for the optimized ops.
    "text_dsir_resample": 1.68,
    "dedup_exact_substring": 1.62,
}

# Per-family bar scaling (round 13, VERDICT r12 task 3). The r12 interleaved
# A/B (AB_DRIFT_r12.jsonl) proved rig drift is FAMILY-shaped: the shuffle
# canary swung ±15% within one session while the scan canary stayed quiet —
# yet every bar scaled only by the scan-based rig_load_factor, so
# shuffle-bound queries read as false regressions on a shuffle-bursty rig
# (the r10→r11 +13% mystery). Each enforced query is classified by its
# dominant cost stage and its bar scales by ITS family's canary.
# Classification provenance: executed-plan audit at sf0.01 (exchange count /
# corpus-sized-exchange check, r13 session) + the per-op plan notes in
# SCALE.md. Queries whose dominant stage is a data-sized exchange — shingle
# or token hash-aggs, shuffle joins of corpus-sized sides, window sorts over
# the full corpus — are shuffle-dominated; single-scan aggs, broadcast-join
# stars, numpy-CPU kernels, and I/O-bound sinks follow the scan canary.
SHUFFLE_DOMINATED = {
    # r14 debuts classified r15 (BASELINE.md Table 7: position-explode
    # join / range-exchange prefix sum / md5-keyed epoch exchange /
    # distinct-value collapse / node-keyed LPA rounds / per-nation
    # agg+rank windows — each dominated by a data-sized exchange)
    "text_bpe_apply",
    "text_bpe_pack_sequences",
    "sample_shuffle_global",
    "agg_weighted_percentile",
    "graph_label_propagation",
    "agg_gini_grouped",
    # r15 debuts classified r16 (BASELINE.md Table 8: the NB pair is
    # dominated by the corpus-sized token-explode exchange; the Theil
    # index by the orders⋈customer fact exchange + per-nation aggs)
    "text_quality_classifier",
    "text_classifier_holdout_eval",
    "agg_theil_index",
    # r16 debuts classified r17 (BASELINE.md Table 9: all five text ops
    # are dominated by corpus-sized token/bigram/13-gram explode
    # exchanges — the NB-pair shape; the two ts debuts are SCAN family:
    # map-side partial agg collapses events to O(types×days) cells, so
    # no corpus-sized exchange exists in their plans)
    "text_quality_incremental",
    "text_dsir_importance",
    "text_kneser_ney_logprob",
    "text_contamination_ngram",
    "text_contamination_incremental",
    # r17 debuts classified r18 (BASELINE.md Table 10: dsir_resample
    # shares dsir_importance's corpus-sized hashed-bigram explode
    # exchange — one reused exchange since C3-r18; exact_substring's
    # dominant stage is the per-token-position span-hash Window
    # exchange, corpus-sized by construction)
    "text_dsir_resample",
    "dedup_exact_substring",
    "agg_decile_lift",
    "agg_ks_two_sample",
    "dedup_incremental_lsh_delta",
    "dedup_line_level",
    "dedup_near_jaccard",
    "dedup_paragraph_jaccard",
    "graph_jaccard_neighbors",
    "graph_triangle_count",
    "join_min_cost_supplier_q2",
    "join_multiway_star",
    "join_point_in_time_scd2",
    "join_sole_late_shipper_q21",
    "sample_temperature_mix",
    "sim_maxsim_multivector",
    "text_hash_features",
    "text_ndcg_eval",
    "text_ngram_novelty",
    "text_rouge2_recall",
    "text_unigram_logprob",
    "text_wordcount",
    "win_cumulative_distinct",
    "win_pareto_share",
}

# Rig-load canary (VERDICT r5 task 5): BASELINE.md's own plain-sum pricing
# form, measured BEFORE the timed suite on this rig vs its recorded
# idle-rig seconds. rig_load_factor = canary_now / CANARY_REF separates
# rig contention from code regressions mechanically: the breach bars scale
# by max(1, rig_load_factor), so a contended rig (r5's phantom pricing
# breach: every JVM query uniformly 1.3-3.2x slower) no longer records
# false breaches, while a true single-query regression on a quiet rig
# still fires. The canary query never changes across rounds.
# Idle-rig canary reference: min-of-3 seconds at sf0.1, measured at the
# canary's exact position in this script (right after the single warmup
# query — NOT in a fully-JIT'd session, which runs ~15% faster), recorded
# round 6 on a quiet rig.
CANARY_REF = 0.52

# Second, SHUFFLE-shaped canary (round 10): the scan canary hit parity
# (0.513 vs 0.52) on a rig where shuffle/write-heavy queries still ran
# ~1.2-1.4× their r8 records — a single scan+agg shape cannot separate
# "same CPU, slower shuffle path" from contention. This form is one full
# lineitem shuffle (150k-group hash agg) + a second tiny exchange.
# Informational in rounds 10-12; PROMOTED round 13 into the bar
# denominators of the SHUFFLE_DOMINATED queries (VERDICT r12 task 3) now
# that it has three rounds of history (r10 1.18, r11 1.24, r12 1.23) and
# the r12 interleaved A/B pinned the drift it measures to the rig, not
# the code. Its burst amplitude (±15% in-session) is why the shuffle rig
# factor is CAPPED at 1.5 in the bar math. Reference: min-of-3 at its
# exact position in this script (right after the scan canary).
# RE-RECORDED round 16 (VERDICT r15 task 3a / ADVICE r15): the r10-era
# 0.476 s reference stopped being reachable on this rig — r15's strict
# shuffle gate failed 5/5 attempts with pre samples 1.47-1.72x at idle,
# making the gate unfalsifiable. Re-measured via
# scripts/record_canary_ref.py + the batch-A record_quiet_bars windows:
# across seven fresh-JVM in-position samples this session the idle floor
# is 0.542-0.557 s, and the two SCAN-CERTIFIED windows (pre/post scan
# 0.935x/0.790x and 0.883x/0.706x) read 0.553 and 0.542. Adopted
# min-of-certified = 0.54 (protocol in BASELINE.md Table 8 notes). With
# the honest reference the POST sample certifies at ~0.90-1.03x on a
# quiet rig (it read 1.0-1.4x against the stale 0.48) while a genuinely
# contended window still fails loudly; the fresh-JVM PRE sample remains
# JIT-burst-prone (1.2-3.3x in 20/20 r16 windows), which is why the
# Table-8 denominators gate on the post pair (record_quiet_bars.py
# --window post, rationale documented there).
SHUFFLE_CANARY_REF = 0.54


def scan_rig(raw_factor: float) -> float:
    """Scan-family bar multiplier: floored at 1 so a quiet rig never
    tightens bars below their recorded denominators."""
    return max(1.0, raw_factor)


def shuffle_rig(raw_factor: float) -> float:
    """Shuffle-family bar multiplier: floored at 1, capped at 1.5 — the
    shuffle canary is bursty (±15% in-session, r12 A/B), and the cap
    bounds how far one contended sample can loosen the family's bars."""
    return min(1.5, max(1.0, raw_factor))


def _shuffle_canary_form(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from filemap_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"), F.count("*").alias("n"))
        .groupBy((F.col("q") % 10).cast("long").alias("b"))
        .agg(F.count("*").alias("n_orders"), F.sum("n").alias("n_items"))
    )

# Round-4 LLM-pipeline additions (BASELINE.md Table 3): reported separately
# so the 8-query `value` total stays comparable across rounds. The
# incremental-LSH entry times the DELTA ingest only (fresh copy of a
# pre-built index per run) — the number a production ingest loop pays.
LLM_HEADLINE = (
    "dedup_near_jaccard",
    "dedup_paragraph_jaccard",
    "text_unigram_logprob",
)

# Round-5 additions (BASELINE.md Table 4/4b): timed between the core
# headline and the LLM suite (the incremental-LSH delta timing leaves
# localCheckpoint state that inflates later timings — observed 2.1 s vs
# 0.9 s on ts_resample_ohlc — so the LLM suite always runs LAST).
EXTENDED_HEADLINE = (
    "join_point_in_time_scd2",
    "ts_resample_ohlc",
    "dedup_url_canonical",
    "sample_temperature_mix",
    "text_hash_features",
    "sink_compact_small_files",
    # final-wave additions (BASELINE.md Table 4b)
    "dedup_line_level",
    "agg_corr_cov",
    "win_cumulative_distinct",
    "stream_stream_join",
    # round-6 staged suite, GRADUATED round 7 (VERDICT r6 task 6): bars
    # from BASELINE.md Table 5 (first 9) and Table 5b (waves 7-9)
    "join_min_cost_supplier_q2",
    "join_nation_volume_q7",
    "agg_profit_by_nation_q9",
    "join_sole_late_shipper_q21",
    "graph_triangle_count",
    "text_rouge2_recall",
    "sim_maxsim_multivector",
    "agg_decile_lift",
    "win_pareto_share",
    "agg_ks_two_sample",
    "text_ndcg_eval",
    "emb_hamming_topk",
    "graph_jaccard_neighbors",
    "text_ngram_novelty",
    "pack_sequences_bestfit",
    "win_concurrency_peak",
    # round-13 multimodal decode/dedup family, bars ENFORCED from round
    # 14 (VERDICT r13 task 4: the newest, most decode-heavy family was
    # the only unbenched one): BASELINE.md Table 6 denominators
    "mm_decode_png",
    "mm_decode_jpeg",
    "mm_dhash_near_dup",
    "mm_audio_fingerprint_dedup",
    # round-14 staged debuts, GRADUATED round 15 (VERDICT r14 task 2):
    # BASELINE.md Table 7 denominators, per-family recording windows
    "mm_incremental_dhash_dedup",
    "mm_incremental_audio_dedup",
    "mm_scene_cut_y4m",
    "sim_ann_pq",
    "emb_matryoshka_eval",
    "text_bpe_apply",
    "text_bpe_pack_sequences",
    "sample_shuffle_global",
    "agg_weighted_percentile",
    "graph_label_propagation",
    "agg_gini_grouped",
    # round-15 staged debuts, GRADUATED round 16 (VERDICT r15 task 2):
    # BASELINE.md Table 8 denominators — scan pair under two
    # scan-certified windows; the NB/Theil shuffle trio under the
    # re-recorded strict shuffle gate
    "dedup_cdc_chunks",
    "ts_periodogram",
    "text_quality_classifier",
    "text_classifier_holdout_eval",
    "agg_theil_index",
    # round-16 staged debuts, GRADUATED round 17 (VERDICT r16 task 2):
    # BASELINE.md Table 9 denominators — the ts pair under a
    # post-certified scan window, the text five under post-certified
    # shuffle windows
    "ts_cusum_changepoint",
    "ts_mad_anomaly",
    "text_quality_incremental",
    "text_dsir_importance",
    "text_kneser_ney_logprob",
    "text_contamination_ngram",
    "text_contamination_incremental",
    # round-17 staged debuts, GRADUATED round 18 (VERDICT r17 task 4):
    # BASELINE.md Table 10 denominators, adopted under the disclosed-
    # loaded-window protocol (no certified-quiet window existed in the
    # r18 session; re-record per min(old, new) when one does)
    "text_dsir_resample",
    "dedup_exact_substring",
)

# Next staging wave: new ops land here first, timed into the DETAIL
# sidecar only, and graduate into EXTENDED_HEADLINE with recorded bars
# the round after their first quiet-rig measurement. Round 16: the
# registry _STAGING debuts, one tuple entry per staged op — no hardcoded
# count here; ADVICE r14 caught the comment drifting from the tuple
# (the five r15 debuts graduated this round with Table 8 denominators).
# Round 18: empty — no new ops landed in the optimization rounds; the
# two r17 debuts graduated above.
STAGED_HEADLINE = ()


def _prev_round_timings(here: str, sf: float | None) -> dict[str, float]:
    """Per-query warm timings from the newest committed BENCH_r{N}.json at
    the same scale factor — the regression baseline for this run."""
    import glob

    best: tuple[int, dict[str, float]] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            parsed = json.load(open(path)).get("parsed") or {}
        except Exception:
            continue
        if not parsed or parsed.get("sf") != sf:
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, {**(parsed.get("queries") or {}),
                        **(parsed.get("llm_queries") or {}),
                        **(parsed.get("r5_queries") or {})})
    return best[1] if best else {}


def _baseline_pricing_form(spark, sf_dir: str):
    """BASELINE.md table 2's q_pricing_summary shape: plain double sums/avgs
    (order-dependent FP, fine for timing), same filter, same grouping."""
    from pyspark.sql import functions as F

    from filemap_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.sum(F.expr("l_extendedprice*(1-l_discount)")), 6).alias("sum_disc_price"),
            F.round(
                F.sum(F.expr("l_extendedprice*(1-l_discount)*(1+l_tax)")), 6
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _time_incremental_delta(spark, sf_dir: str, n: int = 3) -> tuple[float, float]:
    """Warm timing of the incremental-LSH DELTA ingest: build the base
    index once (untimed), then per run hand a fresh COPY of that state to
    the ingest of the arriving split — re-ingesting into the same state
    would hit the seen-docs ledger and time an empty no-op instead.

    Returns (ingest_best, state_copy_best) separately (VERDICT r7 task 6):
    the copytree is bench fixture I/O, not engine work, so the 2x bar
    tracks only the ingest component; the copy cost is recorded alongside
    it in BENCH_DETAIL for transparency."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from filemap_spark.io import load_table
    from filemap_spark.operators.text import incremental_lsh_ingest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_dir = tempfile.mkdtemp(prefix="lsh_bench_base_")
    try:
        incremental_lsh_ingest(
            spark, docs.where(F.col("doc_id") % 10 != 0), base_dir
        ).collect()
        delta_docs = docs.where(F.col("doc_id") % 10 == 0)
        best = float("inf")
        copy_best = float("inf")
        for _ in range(n):
            run_dir = tempfile.mkdtemp(prefix="lsh_bench_run_")
            shutil.rmtree(run_dir, ignore_errors=True)
            t0 = time.time()
            shutil.copytree(base_dir, run_dir)
            copy_best = min(copy_best, time.time() - t0)
            try:
                t0 = time.time()
                incremental_lsh_ingest(spark, delta_docs, run_dir).collect()
                best = min(best, time.time() - t0)
            finally:
                shutil.rmtree(run_dir, ignore_errors=True)
        return round(best, 3), round(copy_best, 3)
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


def _time_best(fn, spark, sf_dir: str, n: int = 3) -> float:
    """Min of n full (build + execute) runs — each run re-builds the
    DataFrame, as a fresh client query would."""
    import time

    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None
    spark = get_spark("filemap-bench")
    # The whole suite (and the memo calibration's 'raw' leg) must time the
    # UNCACHED plans: with FILEMAP_MEMO=1 all_queries() serves memo-wrapped
    # forms, so every 'raw' number would really be a warehouse hit and the
    # raw/miss/hit ratios meaningless (ADVICE r12). Drop the env var for
    # this process rather than bailing — bench owns its own measurement
    # discipline.
    if os.environ.pop("FILEMAP_MEMO", None) is not None:
        print("bench: ignoring FILEMAP_MEMO=1 — suite times raw plans",
              file=sys.stderr)
    queries = all_queries()

    # Untimed warmup: JVM/JIT/codegen/Arrow initialization otherwise lands
    # entirely on the first timed query (measured ~0.5 s of one-time cost).
    first = queries.get(HEADLINE[0])
    if first is not None:
        first(spark, sf_dir).collect()

    # Page-cache warmup (round 10): on a freshly-booted rig the FIRST
    # sf0.1 read of each table comes off disk — measured canary 1.91 s
    # cold vs 0.69 s on the very next run of the same session, with the
    # whole suite uniformly ~1.3-2.8× inflated. The canary's job is to
    # measure CPU contention (its CANARY_REF was recorded warm), so scan
    # every table once untimed first; real I/O regressions still show in
    # the timed queries, just not multiplied into every bar denominator.
    from filemap_spark.io import TABLES, load_table

    for t in TABLES:
        try:
            # xxhash64(*) touches every column JVM-side — a count() would
            # satisfy itself from parquet row-group metadata and warm
            # nothing. MAX, not SUM: summing uniform 64-bit hashes
            # overflows long under ANSI mode (and the except here would
            # swallow it, silently skipping the warmup — observed).
            load_table(spark, sf_dir, t).selectExpr(
                "max(xxhash64(*))"
            ).collect()
        except Exception as e:  # noqa: BLE001 — missing optional table
            # LOUD skip (review finding, round 10): a silent pass here
            # already swallowed one real bug (the SUM overflow) — a
            # cold-canary artifact would then inflate every bar
            # denominator with no trace of why.
            print(f"WARMUP SKIPPED for {t}: {e}", file=sys.stderr)

    # Rig-load canary: fixed JVM-side query, measured before anything else
    # so its number reflects the same rig state the suite is about to see.
    canary = _time_best(_baseline_pricing_form, spark, sf_dir)
    rig_load_factor = round(canary / CANARY_REF, 3) if sf == 0.1 else 1.0
    shuffle_canary = _time_best(_shuffle_canary_form, spark, sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        timings[name] = _time_best(fn, spark, sf_dir)

    ext_timings: dict[str, float] = {}
    for name in EXTENDED_HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        ext_timings[name] = _time_best(fn, spark, sf_dir)

    staged_timings: dict[str, float] = {}
    for name in STAGED_HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        staged_timings[name] = _time_best(fn, spark, sf_dir)

    llm_timings: dict[str, float] = {}
    for name in LLM_HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        llm_timings[name] = _time_best(fn, spark, sf_dir)
    lsh_ingest, lsh_state_copy = _time_incremental_delta(spark, sf_dir)
    llm_timings["dedup_incremental_lsh_delta"] = lsh_ingest

    # Same-rig calibration, ALTERNATING runs so both forms see identical JVM
    # warmth (a sequential tail measurement hands the later form a fully-JIT'd
    # scan path and biases the ratio by >2x — observed).
    ours_fn = queries["agg_pricing_summary"]
    ours_best, base_best = float("inf"), float("inf")
    for _ in range(3):
        t0 = time.time()
        _baseline_pricing_form(spark, sf_dir).collect()
        base_best = min(base_best, time.time() - t0)
        t0 = time.time()
        ours_fn(spark, sf_dir).collect()
        ours_best = min(ours_best, time.time() - t0)
    calibration = {
        "agg_pricing_summary_same_warmth": round(ours_best, 3),
        "agg_pricing_summary_baseline_form": round(base_best, 3),
        "agg_pricing_summary_ratio_same_rig": round(ours_best / base_best, 3),
        # VERDICT r7 task 6: the LSH delta metric split into engine work
        # (ingest — the barred number) vs bench fixture I/O (state copy).
        "dedup_incremental_lsh_delta_ingest": lsh_ingest,
        "dedup_incremental_lsh_delta_state_copy": lsh_state_copy,
    }

    # Wordcount methodology calibration: BASELINE.md table 2's "warm" was the
    # 2nd run, which for sub-second queries re-collects the SAME DataFrame and
    # reuses its shuffle stages — a ~0.1-0.15 s floor no fresh query can hit.
    # Reproduce that recorded methodology here (same rig, same session) next
    # to the honest rebuild number so the ratio is apples-to-apples: if
    # `text_wordcount_2ndrun_same_df` lands at ~the recorded 0.16 s while the
    # rebuild number sits near the fresh-plan floor, the headline gap is
    # measurement methodology, not plan speed.
    wc_fn = queries["text_wordcount"]
    wc_df = wc_fn(spark, sf_dir)
    wc_df.collect()  # 1st run materializes the shuffle
    t0 = time.time()
    wc_df.collect()  # 2nd run = BASELINE.md's recorded "warm" methodology
    calibration["text_wordcount_2ndrun_same_df"] = round(time.time() - t0, 3)
    calibration["text_wordcount_rebuild"] = timings.get("text_wordcount")

    # Mechanical regression guard: this_round / prev_round per query
    # (>1.0 = slower than the previous committed round). Computed AFTER
    # the breach-confirmation pass below updates all_timings (round 10:
    # vs_prev used to capture the PRE-retime spike — a transient that
    # the retime proved away still read as a 3× "regression").
    all_timings = {**timings, **ext_timings, **llm_timings}
    prev = _prev_round_timings(here, sf)

    # Per-query 2x-bar ratios + loud breach list (bars are declared for
    # sf0.1 only — at other SFs the bar fields are omitted). The bar
    # denominator scales by the query's FAMILY canary (round 13: scan- vs
    # shuffle-dominated, each floored at 1, shuffle capped at 1.5):
    # family-shaped rig contention can't manufacture breaches, a true
    # single-query regression on a quiet rig still fires.
    bar_ratios: dict[str, float] = {}
    breach: list[str] = []
    shuffle_rig_factor = (
        round(shuffle_canary / SHUFFLE_CANARY_REF, 3) if sf == 0.1 else 1.0
    )
    if sf == 0.1:
        scan_mult = scan_rig(rig_load_factor)
        shuffle_mult = shuffle_rig(shuffle_rig_factor)

        def _rig(name: str) -> float:
            return shuffle_mult if name in SHUFFLE_DOMINATED else scan_mult

        for name, t in all_timings.items():
            base = BASELINE_WARM_SF01.get(name)
            if base:
                ratio = round(t / (2 * base * _rig(name)), 3)
                bar_ratios[name] = ratio
                if ratio > 1.0:
                    breach.append(name)
        # Confirmation pass (round 7): transient rig spikes shorter than
        # the canary's sampling window can push ONE query over its bar
        # (observed: the same suite run twice breached two different
        # queries, each clean on the other run). A breach candidate is
        # re-timed at suite end; a code regression reproduces, a spike
        # doesn't. Both measurements land in the DETAIL sidecar.
        if breach:
            confirmed = []
            for name in breach:
                fn = queries.get(name)
                if fn is None:
                    # synthetic metric (dedup_incremental_lsh_delta is not a
                    # registry op) — retime through its own harness (ADVICE
                    # r7: queries[name] would KeyError and abort the bench
                    # before the breach report lands in BENCH_DETAIL).
                    retimed, recopy = _time_incremental_delta(spark, sf_dir)
                    # keep the calibration keys coherent with the retimed
                    # metric (ADVICE r8: the earlier-written summary fields
                    # otherwise carry a stale, different value).
                    calibration["dedup_incremental_lsh_delta_ingest"] = min(
                        calibration["dedup_incremental_lsh_delta_ingest"],
                        retimed,
                    )
                    calibration["dedup_incremental_lsh_delta_state_copy"] = min(
                        calibration["dedup_incremental_lsh_delta_state_copy"],
                        recopy,
                    )
                else:
                    retimed = _time_best(fn, spark, sf_dir)
                best = min(all_timings[name], retimed)
                all_timings[name] = best
                for suite in (timings, ext_timings, llm_timings):
                    if name in suite:
                        suite[name] = best
                ratio = round(best / (2 * BASELINE_WARM_SF01[name] * _rig(name)), 3)
                calibration[f"breach_retime_{name}"] = retimed
                bar_ratios[name] = ratio
                if ratio > 1.0:
                    confirmed.append(name)
            breach = confirmed
        if breach:
            print(
                f"BENCH BREACH: {breach} exceed their rig-adjusted 2x bar",
                file=sys.stderr,
            )

    # Memo hit-latency calibration (VERDICT r11 task 5): for every
    # memo-capable registry op — raw uncached plan, warehouse MISS
    # (compute + single-file write + rename), warehouse HIT (key check +
    # scan of the materialized result) — same session, same SF, so the
    # hit-vs-raw speedup and the miss write-overhead are apples-to-
    # apples. Raw reuses the suite's min-of-3 where the op is already
    # timed; miss/hit are single runs into a throwaway warehouse (a hit
    # is key hashing + a small parquet scan — noise floor, not worth 3x).
    import shutil as _shutil
    import tempfile as _tempfile

    from filemap_spark.registry import memo_queries

    memo_detail: dict[str, dict[str, float]] = {}
    memo_wh = _tempfile.mkdtemp(prefix="bench_memo_wh_")
    prev_wh = os.environ.get("FILEMAP_WAREHOUSE")
    os.environ["FILEMAP_WAREHOUSE"] = memo_wh
    try:
        for name, wrapped in sorted(memo_queries().items()):
            raw_t = all_timings.get(name)
            if raw_t is None:
                raw_t = _time_best(queries[name], spark, sf_dir, n=1)
            t0 = time.time()
            wrapped(spark, sf_dir).collect()
            miss_t = round(time.time() - t0, 3)
            t0 = time.time()
            wrapped(spark, sf_dir).collect()
            hit_t = round(time.time() - t0, 3)
            memo_detail[name] = {"raw": raw_t, "miss": miss_t, "hit": hit_t}
    finally:
        if prev_wh is None:
            os.environ.pop("FILEMAP_WAREHOUSE", None)
        else:
            os.environ["FILEMAP_WAREHOUSE"] = prev_wh
        _shutil.rmtree(memo_wh, ignore_errors=True)

    # post-retime: transient spikes the confirmation pass disproved are
    # reported at their confirmed timings
    vs_prev = {
        name: round(t / prev[name], 3)
        for name, t in all_timings.items()
        if prev.get(name)
    }

    # Detail sidecar + stderr: everything the judge wants but the driver's
    # 2000-char stdout tail can't hold. BENCH_r05 recorded parsed:null
    # because the old single line (~2.6 KB with vs_prev + calibration
    # inline) outgrew the tail capture and lost its head — the final
    # stdout line must stay well under 2 KB and be the LAST thing printed.
    detail = {
        "suites": {
            "headline": timings,
            "extended": ext_timings,
            "staged": staged_timings,
            "llm": llm_timings,
        },
        "canary_seconds": canary,
        "rig_load_factor": rig_load_factor,
        "shuffle_canary_seconds": shuffle_canary,
        "shuffle_rig_factor": shuffle_rig_factor,
        "vs_prev": vs_prev,
        "calibration": calibration,
        "bar_ratios": bar_ratios,
        "breach": breach,
        "memo": memo_detail,
    }
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(f"DETAIL: {json.dumps(detail)}", file=sys.stderr)

    # Final stdout line: MUST stay well under the driver's 2000-char tail
    # (BENCH_r05 lost its head to an oversized line). With 42 timed
    # queries, seconds are rounded to 2dp with compact separators, and
    # bar_ratios reports only the queries at >= 0.7 of their bar plus the
    # summary fields — the full per-query map lives in BENCH_DETAIL.json.
    bar_max_q = max(bar_ratios, key=bar_ratios.get) if bar_ratios else None
    print(
        json.dumps(
            {
                "metric": "headline_suite_warm_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf": sf,
                "queries": {n: round(t, 2) for n, t in all_timings.items()},
                "bars_checked": len(bar_ratios),
                "bar_max": bar_ratios.get(bar_max_q),
                "bar_max_query": bar_max_q,
                "bar_ratios": {
                    n: round(r, 2)
                    for n, r in bar_ratios.items()
                    if r >= 0.7
                },
                "breach": breach,
                "rig_load_factor": rig_load_factor,
                "shuffle_rig_factor": shuffle_rig_factor,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
