"""Mechanism tests for the round-7-staged operators (built round 6): each
op's core kernel checked against an independent pure-python/numpy/pandas
reference or a conservation law — the same belt-and-suspenders the oracle
differential can't provide (it shares the SQL shape; these don't)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from filemap_spark import all_queries
from filemap_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_rolling_zscore_matches_pandas_reference(spark):
    """win_rolling_zscore ≡ pandas rolling(20) sample-std z-score on the
    identical (ts, event_id) order, within 6dp rounding."""
    out = (
        all_queries()["win_rolling_zscore"](spark, SF)
        .toPandas()
        .sort_values(["event_type", "ts_us", "event_id"])
        .reset_index(drop=True)
    )
    ev = (
        load_table(spark, SF, "events")
        .select(
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
        .toPandas()
        .sort_values(["event_type", "ts_us", "event_id"])
        .reset_index(drop=True)
    )
    ref_rows = []
    for etype, grp in ev.groupby("event_type", sort=True):
        v = grp["value"].to_numpy()
        r = pd.Series(v).rolling(20, min_periods=2)
        mean, std = r.mean().to_numpy(), r.std(ddof=1).to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (v - mean) / std
        z[~np.isfinite(z)] = np.nan
        for row, zi in zip(grp.itertuples(), z):
            ref_rows.append((etype, row.event_id, zi))
    ref = pd.DataFrame(ref_rows, columns=["event_type", "event_id", "z"])
    merged = out.merge(ref, on=["event_type", "event_id"], validate="1:1")
    got, want = merged["zscore"].to_numpy(), merged["z"].to_numpy()
    both = np.isfinite(got.astype(float)) & np.isfinite(want)
    # NULL pattern matches (n<2 or zero variance)
    assert (np.isnan(got.astype(float)) == np.isnan(want)).all()
    # pandas computes in FP; the engine computes exact-integer — 1e-5 slack
    assert np.abs(got.astype(float)[both] - want[both]).max() < 1e-5


def test_markov_rows_normalize_and_conserve_transitions(spark):
    """agg_markov_transition: per-prev probabilities sum to 1 (within the
    6dp per-cell rounding) and total transitions = n_events − n_users
    (each user contributes exactly one null-prev first event)."""
    out = all_queries()["agg_markov_transition"](spark, SF).toPandas()
    ev = load_table(spark, SF, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert int(out["n_trans"].sum()) == n_events - n_users
    sums = out.groupby("prev_type")["prob"].sum()
    cells = out.groupby("prev_type")["prob"].count()
    assert ((sums - 1.0).abs() <= cells * 5e-7 + 1e-9).all(), sums


def test_cross_correlation_lag0_matches_numpy_corrcoef(spark):
    """ts_cross_correlation's exact-integer kernel ≡ np.corrcoef on the
    independently recomputed day series (lag 0)."""
    out = (
        all_queries()["ts_cross_correlation"](spark, SF)
        .toPandas()
        .set_index("lag_days")
    )
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            "event_type",
        )
        .toPandas()
    )
    piv = (
        ev.groupby(["day", "event_type"]).size().unstack(fill_value=-1)
    )
    both = piv[(piv["click"] > 0) & (piv["purchase"] > 0)]
    want = np.corrcoef(both["click"], both["purchase"])[0, 1]
    assert abs(out.loc[0, "xcorr"] - round(want, 6)) <= 1e-6
    assert int(out.loc[0, "n_days"]) == len(both)


def test_bloom_gate_prunes_without_dropping_matches(spark):
    """join_bloom_prefilter mechanism: rebuild the gate standalone and pin
    (a) zero false negatives — every fact row with a truly matching part
    key passes — and (b) real pruning — passed rows stay within 1% FP of
    the true match count (m=65536, k=3, ~43 keys ⇒ FP ≈ 1e-8)."""
    from filemap_spark.operators.joins import join_bloom_prefilter  # noqa: F401

    part = load_table(spark, SF, "part")
    dim_keys = {
        r["p_partkey"]
        for r in part.where(F.col("p_size") == 10)
        .select("p_partkey")
        .collect()
    }
    li = load_table(spark, SF, "lineitem").select("l_partkey")
    n_true = li.where(F.col("l_partkey").isin(list(dim_keys))).count()
    # run the op; its result equals the plain join (oracle), so here only
    # pin the pruning arithmetic via the op's own building blocks
    m_bits = 1 << 16
    probes = (
        part.where(F.col("p_size") == 10)
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64("p_partkey", F.lit(i)), F.lit(m_bits))
                        for i in range(3)
                    ]
                )
            ).alias("bit")
        )
        .collect()
    )
    bits = {r["bit"] for r in probes}
    fact_bits = li.select(
        "l_partkey",
        *[
            F.pmod(F.xxhash64("l_partkey", F.lit(i)), F.lit(m_bits)).alias(f"b{i}")
            for i in range(3)
        ],
    ).collect()
    passed = [
        r
        for r in fact_bits
        if r["b0"] in bits and r["b1"] in bits and r["b2"] in bits
    ]
    true_pass = [r for r in passed if r["l_partkey"] in dim_keys]
    assert len(true_pass) == n_true  # no false negatives, ever
    n_rows = len(fact_bits)
    assert len(passed) - n_true <= max(1, n_rows // 100)  # actually prunes


def test_pair_hist_conserves_pairs_and_bucket_range(spark):
    """emb_pair_distance_hist: exactly one pair per anchor (Σ n_pairs = n),
    buckets within the cosine range, same-label counts bounded."""
    out = all_queries()["emb_pair_distance_hist"](spark, SF).toPandas()
    n = load_table(spark, SF, "embeddings").count()
    assert int(out["n_pairs"].sum()) == n
    assert out["bucket"].between(-21, 20).all()
    assert (out["n_same_label"] <= out["n_pairs"]).all()


def test_manifest_checksum_layout_and_counts(spark):
    """sink_manifest_checksum: one file per lang dir, row counts conserve
    the corpus, and the xor checksum is nonzero for every partition."""
    out = all_queries()["sink_manifest_checksum"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents")
    by_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert (out["n_files"] == 1).all()
    assert {r.lang: r.n_rows for r in out.itertuples()} == by_lang
    assert (out["content_xor"] != 0).all()


def test_q18_gate_is_integer_exact(spark):
    """join_top_orders_q18: every emitted order's quantity sum exceeds the
    gate, recomputed independently."""
    out = all_queries()["join_top_orders_q18"](spark, SF).toPandas()
    li = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.expr("cast(round(l_quantity) as bigint)")).alias("s"))
        .toPandas()
        .set_index("l_orderkey")["s"]
    )
    for r in out.itertuples():
        assert int(r.sum_qty) == int(li.loc[r.o_orderkey]) > 250


def test_q21_aggregate_collapse_equals_exists_semantics(spark):
    """join_sole_late_shipper_q21 collapses the EXISTS/NOT-EXISTS pair into
    per-order aggregates; this re-derives the answer with literal
    per-order set logic in pandas (for each finished order: does a second
    supplier exist, and is the max-shipdate achiever unique?) and requires
    identical per-supplier tallies."""
    out = (
        all_queries()["join_sole_late_shipper_q21"](spark, SF)
        .toPandas()
        .set_index("s_name")["numwait"]
        .sort_index()
    )
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).toPandas()
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).toPandas()
    supp = load_table(spark, SF, "supplier").select(
        "s_suppkey", "s_name"
    ).toPandas()
    fin = set(orders.loc[orders.o_orderstatus == "F", "o_orderkey"])
    tallies: dict[int, int] = {}
    for okey, grp in li[li.l_orderkey.isin(fin)].groupby("l_orderkey"):
        if grp.l_suppkey.nunique() <= 1:
            continue  # EXISTS-a-second-supplier fails
        mx = grp.l_shipdate.max()
        achievers = set(grp.loc[grp.l_shipdate == mx, "l_suppkey"])
        if len(achievers) == 1:  # NOT EXISTS an equally late second supplier
            s = achievers.pop()
            tallies[s] = tallies.get(s, 0) + 1
    name_of = supp.set_index("s_suppkey")["s_name"]
    ref = (
        pd.Series({name_of[k]: v for k, v in tallies.items()}, name="numwait")
        .sort_index()
    )
    pd.testing.assert_series_equal(
        out.astype("int64"), ref.astype("int64"), check_names=False
    )


def test_q2_min_cost_supplier_matches_pandas_reference(spark):
    """join_min_cost_supplier_q2's window-MIN decorrelation ≡ a literal
    per-part argmin in pandas over the same derived offer relation
    (including multi-supplier ties, which must ALL surface)."""
    out = (
        all_queries()["join_min_cost_supplier_q2"](spark, SF)
        .toPandas()
        .sort_values(["p_partkey", "s_name"])
        .reset_index(drop=True)
    )
    li = load_table(spark, SF, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    ).toPandas()
    part = load_table(spark, SF, "part").toPandas()
    supp = load_table(spark, SF, "supplier").toPandas()
    nation = load_table(spark, SF, "nation").toPandas()
    region = load_table(spark, SF, "region").toPandas()
    li["pm"] = (li.l_extendedprice * 1e6).round().astype("int64")
    li["qm"] = (li.l_quantity * 1e6).round().astype("int64")
    ps = li.groupby(["l_partkey", "l_suppkey"], as_index=False)[["pm", "qm"]].sum()
    ps["unit_cost"] = ps.pm.astype(float) / ps.qm.astype(float)
    eur_nations = nation.merge(
        region[region.r_name == "EUROPE"], left_on="n_regionkey",
        right_on="r_regionkey",
    )
    eur = supp.merge(eur_nations, left_on="s_nationkey", right_on="n_nationkey")
    pok = part[(part.p_size.between(10, 40)) & (part.p_type == "STANDARD")]
    cand = ps.merge(pok, left_on="l_partkey", right_on="p_partkey").merge(
        eur, left_on="l_suppkey", right_on="s_suppkey"
    )
    keep = []
    for pkey, grp in cand.groupby("p_partkey"):
        mc = grp.unit_cost.min()
        keep.append(grp[grp.unit_cost == mc])
    ref = (
        pd.concat(keep)[
            ["p_partkey", "p_name", "s_name", "n_name", "s_acctbal", "unit_cost"]
        ]
        .sort_values(["p_partkey", "s_name"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[ref.columns].reset_index(drop=True), ref, check_dtype=False
    )


def test_triangle_count_matches_pure_python_enumeration(spark):
    """graph_triangle_count ≡ a literal adjacency-set triangle enumeration
    over the same derived co-order edge list."""
    row = all_queries()["graph_triangle_count"](spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas()
    part = load_table(spark, SF, "part").toPandas()
    std = set(part.loc[part.p_type == "STANDARD", "p_partkey"])
    edges = set()
    for _, grp in li[li.l_partkey.isin(std)].groupby("l_orderkey"):
        ps = sorted(set(grp.l_partkey))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    tri = 0
    for u, v in edges:
        tri += len(adj.get(u, set()) & adj.get(v, set()))
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri


def test_cusum_scaled_argmax_equals_textbook_statistic(spark):
    """ts_changepoint_cusum's nd-scaled integer kernel picks the SAME
    changepoint day as the textbook FP CUSUM (cusum_scaled = nd × classic),
    and the deviations match after descaling."""
    out = (
        all_queries()["ts_changepoint_cusum"](spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = load_table(spark, SF, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).toPandas()
    for etype, grp in ev.groupby("event_type"):
        daily = grp.groupby("day").size().sort_index()
        classic = (daily - daily.mean()).cumsum()
        change_day = classic.abs().idxmax()  # pandas: first occurrence of max
        nd = len(daily)
        assert out.loc[etype, "n_days"] == nd
        assert out.loc[etype, "change_day"] == change_day
        assert (
            abs(out.loc[etype, "max_dev_scaled"] / nd - classic.abs().max())
            < 1e-6
        )


def test_maxsim_matches_numpy_reference(spark):
    """sim_maxsim_multivector ≡ a numpy MaxSim over the same pseudo-doc
    grouping (per-token cosines quantized at 1e4, summed, top-3 with d_did
    tiebreak)."""
    out = (
        all_queries()["sim_maxsim_multivector"](spark, SF)
        .toPandas()
        .sort_values(["q_did", "maxsim_score", "d_did"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    emb = load_table(spark, SF, "embeddings").toPandas()
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    did, tok = ids // 8, ids % 8
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(norms, norms)
    q4 = np.round(cos * 10000).astype(np.int64)
    rows = []
    for q in range(4):
        qmask = did == q
        for d in set(did):
            if d == q:
                continue
            dmask = did == d
            sub = q4[np.ix_(qmask, dmask)]
            rows.append((q, d, int(sub.max(axis=1).sum()), int(qmask.sum())))
    ref = pd.DataFrame(rows, columns=["q_did", "d_did", "s4", "n_qtok"])
    top = (
        ref.sort_values(["q_did", "s4", "d_did"],
                        ascending=[True, False, True])
        .groupby("q_did")
        .head(3)
        .reset_index(drop=True)
    )
    assert len(out) == len(top)
    for got, want in zip(out.itertuples(), top.itertuples()):
        assert (got.q_did, got.d_did, got.n_qtok) == (
            want.q_did, want.d_did, want.n_qtok,
        )
        assert abs(got.maxsim_score - want.s4 / 10000.0) < 1e-9


def test_session_path_matches_pandas_reconstruction(spark):
    """agg_session_path ≡ a literal pandas sessionization + path-string
    build over the same (ts, event_id) total order."""
    out = (
        all_queries()["agg_session_path"](spark, SF)
        .toPandas()
        .set_index("path")
        .sort_index()
    )
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
        .toPandas()
        .sort_values(["user_id", "us", "event_id"])
    )
    from collections import Counter, defaultdict

    n_sessions: Counter = Counter()
    users: defaultdict = defaultdict(set)
    for uid, grp in ev.groupby("user_id"):
        path: list[str] = []
        prev_us = None
        for r in grp.itertuples():
            if prev_us is not None and r.us - prev_us > 1800000000:
                p = ">".join(path)
                n_sessions[p] += 1
                users[p].add(uid)
                path = []
            path.append(r.event_type)
            prev_us = r.us
        if path:
            p = ">".join(path)
            n_sessions[p] += 1
            users[p].add(uid)
    for path, row in out.iterrows():
        assert n_sessions[path] == row.n_sessions, path
        assert len(users[path]) == row.n_users, path
    # the gate keeps exactly the >= 5 paths
    assert set(out.index) == {p for p, n in n_sessions.items() if n >= 5}


def test_funnel_windowed_is_subset_of_unwindowed(spark):
    """agg_funnel_windowed conservation: each step count is bounded by the
    unwindowed funnel's step (the 30-min constraint only removes users),
    and step counts are monotone non-increasing."""
    win = all_queries()["agg_funnel_windowed"](spark, SF).collect()[0]
    full = all_queries()["agg_funnel"](spark, SF).collect()[0]
    assert win.step1_view == full.n_view  # step 1 has no window constraint
    assert win.step2_click_30m <= full.n_view_click
    assert win.step3_purchase_30m <= full.n_view_click_purchase
    assert win.step1_view >= win.step2_click_30m >= win.step3_purchase_30m


def test_dim_variance_matches_numpy(spark):
    """emb_dim_variance ≡ numpy population variance over the identically
    quantized µ-int components."""
    out = (
        all_queries()["emb_dim_variance"](spark, SF)
        .toPandas()
        .set_index("dim")
        .sort_index()
    )
    emb = load_table(spark, SF, "embeddings").toPandas()
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    xm = np.round(mat * 1e6)
    assert (out["n"] == len(mat)).all()
    np.testing.assert_allclose(
        out["mean"].to_numpy(), xm.mean(axis=0) / 1e6, rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        out["variance"].to_numpy(),
        xm.var(axis=0) / 1e12,
        rtol=1e-9, atol=1e-12,
    )


def test_patch_features_tile_exactly_covers_grid(spark):
    """mm_patch_features geometry: every asset emits exactly 4 patches
    whose dims are floor(w/2) x floor(h/2) of the decoded asset, and
    sibling patches agree on dims."""
    out = all_queries()["mm_patch_features"](spark, SF).toPandas()
    dims = all_queries()["mm_decode_ppm"](spark, SF).toPandas().set_index("asset_id")
    assert (out.groupby("asset_id").size() == 4).all()
    for aid, grp in out.groupby("asset_id"):
        w, h = int(dims.loc[aid, "width"]), int(dims.loc[aid, "height"])
        assert (grp.patch_w == w // 2).all() and (grp.patch_h == h // 2).all()
        assert len(grp.patch_sha) == 4


def test_chi2_matches_numpy_contingency(spark):
    """agg_chi2_independence ≡ the numpy observed-vs-expected formula over
    an independently built contingency table."""
    row = all_queries()["agg_chi2_independence"](spark, SF).collect()[0]
    orders = load_table(spark, SF, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).toPandas()
    tab = orders.groupby(["o_orderpriority", "o_orderstatus"]).size().unstack(
        fill_value=0
    )
    obs = tab.to_numpy().astype(float)
    rp = obs.sum(axis=1, keepdims=True)
    cs = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    exp = rp @ cs / n
    mask = obs > 0  # the op iterates observed cells only
    chi2 = (((obs - exp) ** 2 / exp)[mask]).sum()
    assert row.n_orders == int(n)
    assert row.n_cells == int(mask.sum())
    assert abs(row.chi2 - chi2) < 1e-9


def test_balanced_classes_kept_counts_equal_min(spark):
    """sample_balanced_classes: every class keeps exactly the min class
    count, and the rank envelope is [1, min_n]."""
    out = all_queries()["sample_balanced_classes"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    min_n = docs.groupby("lang").size().min()
    assert (out["n_kept"] == min_n).all()
    assert (out["first_rn"] == 1).all()
    assert (out["last_rn"] == min_n).all()
    assert set(out["lang"]) == set(docs["lang"])


def test_stem_lite_rules_compress_vocab(spark):
    """text_stem_lite: the cascade is idempotent-ish sanity — stemmed vocab
    is no larger than raw vocab, and a known suffix family collapses."""
    row = all_queries()["text_stem_lite"](spark, SF).collect()[0]
    assert row.vocab_stemmed <= row.vocab_raw
    assert 0 < row.vocab_ratio <= 1.0


def test_interval_coalesce_matches_sweep_line_reference(spark):
    """win_interval_coalesce ≡ a pure-python sweep-line merge of the same
    10-minute intervals per user."""
    out = (
        all_queries()["win_interval_coalesce"](spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", F.unix_micros("ts").alias("s"))
        .toPandas()
    )
    LEN = 600_000_000
    for uid, grp in ev.groupby("user_id"):
        spans = []
        for s in sorted(grp["s"]):
            e = s + LEN
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        row = out.loc[uid]
        assert int(row["n_intervals"]) == len(spans)
        assert int(row["n_events"]) == len(grp)
        assert int(row["covered_us"]) == sum(e - s for s, e in spans)
        assert int(row["max_span_us"]) == max(e - s for s, e in spans)


def test_fk_orphans_strict_zero_policy_counts_match_pandas(spark):
    """join_fk_orphans: strict FK checks are 0 on contract data (its keys
    are referentially closed); policy counts equal independent pandas
    filters."""
    out = (
        all_queries()["join_fk_orphans"](spark, SF)
        .toPandas()
        .set_index("check_name")
    )
    orders = load_table(spark, SF, "orders").toPandas()
    cust = load_table(spark, SF, "customer").toPandas()
    part = load_table(spark, SF, "part").toPandas()
    li = load_table(spark, SF, "lineitem").toPandas()
    assert int(out.loc["orders->customer", "n_viol"]) == 0
    assert int(out.loc["lineitem->part", "n_viol"]) == 0
    assert int(out.loc["lineitem->orders", "n_viol"]) == 0
    bad_cust = set(cust.loc[cust["c_acctbal"] <= 0, "c_custkey"])
    assert int(out.loc["orders->customer:goodstanding", "n_viol"]) == int(
        orders["o_custkey"].isin(bad_cust).sum()
    )
    big_part = set(part.loc[part["p_size"] > 25, "p_partkey"])
    assert int(out.loc["lineitem->part:small", "n_viol"]) == int(
        li["l_partkey"].isin(big_part).sum()
    )
    # the policy checks are NON-vacuous: the graded hash sees real counts
    assert int(out.loc["orders->customer:goodstanding", "n_viol"]) > 0
    assert int(out.loc["lineitem->part:small", "n_viol"]) > 0


def test_dq_profile_matches_pandas_profile(spark):
    """agg_dq_profile ≡ pandas nunique/min/max per profiled column."""
    out = (
        all_queries()["agg_dq_profile"](spark, SF)
        .toPandas()
        .set_index("col_name")
    )
    o = load_table(spark, SF, "orders").toPandas()
    st = o["o_orderstatus"].where(o["o_orderstatus"] != "P")
    assert int(out.loc["o_orderstatus", "n_null"]) == int(st.isna().sum())
    assert int(out.loc["o_orderstatus", "n_distinct"]) == st.nunique()
    assert out.loc["o_orderstatus", "min_s"] == st.dropna().min()
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    assert int(out.loc["o_totalprice_cents", "n_distinct"]) == cents.nunique()
    assert out.loc["o_totalprice_cents", "max_s"] == str(cents.max())
    assert int(out.loc["o_custkey", "n_distinct"]) == o["o_custkey"].nunique()
    assert (
        out.loc["o_orderdate", "min_s"]
        == o["o_orderdate"].min().strftime("%Y-%m-%d")
    )
    assert (out["n_rows"] == len(o)).all()


def test_ks_two_sample_matches_numpy_reference(spark):
    """agg_ks_two_sample ≡ the numpy ECDF sup-distance (scipy-free
    two-sample KS) on the same click/error samples."""
    row = all_queries()["agg_ks_two_sample"](spark, SF).toPandas().iloc[0]
    ev = (
        load_table(spark, SF, "events")
        .select("event_type", "value")
        .toPandas()
    )
    a = np.sort(ev.loc[ev["event_type"] == "click", "value"].to_numpy())
    b = np.sort(ev.loc[ev["event_type"] == "error", "value"].to_numpy())
    assert int(row["n_a"]) == len(a) and int(row["n_b"]) == len(b)
    grid = np.concatenate([a, b])
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d_ref = np.abs(fa - fb).max()
    assert abs(float(row["d_stat"]) - d_ref) < 1e-6
    crit = 1.358 * np.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert abs(float(row["crit_05"]) - crit) < 1e-6
    assert int(row["reject_05"]) == int(d_ref > crit)


def test_holt_winters_matches_pure_python_recurrence(spark):
    """ts_holt_winters ≡ the textbook additive Holt-Winters recurrence
    reimplemented in pure python (same init, same float64 walk)."""
    out = all_queries()["ts_holt_winters"](spark, SF).toPandas()
    daily = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    M, A, B, G, H = 7, 0.3, 0.1, 0.2, 7
    for etype, grp in daily.groupby("event_type"):
        s = grp.sort_values("day").set_index("day")["n"]
        idx = pd.date_range(s.index.min(), s.index.max(), freq="D")
        y = [float(v) for v in s.reindex(idx, fill_value=0)]
        n = len(y)
        if n < 2 * M:
            assert etype not in set(out["event_type"])
            continue
        m1 = sum(y[:M]) / M
        level, trend = m1, (sum(y[M:2 * M]) / M - m1) / M
        season = [y[i] - m1 for i in range(M)]
        abs_err = 0.0
        for t in range(M, n):
            abs_err += abs(y[t] - (level + trend + season[t % M]))
            nl = A * (y[t] - season[t % M]) + (1 - A) * (level + trend)
            trend = B * (nl - level) + (1 - B) * trend
            season[t % M] = G * (y[t] - nl) + (1 - G) * season[t % M]
            level = nl
        mae = abs_err / (n - M)
        sub = out[out["event_type"] == etype].set_index("h")
        for h in range(1, H + 1):
            want = level + h * trend + season[(n + h - 1) % M]
            assert abs(float(sub.loc[h, "forecast"]) - want) < 1e-6
            assert abs(float(sub.loc[h, "mae"]) - mae) < 1e-6


def test_hamming_topk_matches_numpy_popcount(spark):
    """emb_hamming_topk ≡ numpy sign-bit packing + popcount brute force,
    including the (distance, vec_id) tie order."""
    out = all_queries()["emb_hamming_topk"](spark, SF).toPandas()
    emb = load_table(spark, SF, "embeddings").toPandas()
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy())  # (n, 64) float32
    bits = (mat > 0).astype(np.uint64)  # sign bits, exact
    packed = np.zeros(len(ids), dtype=np.uint64)
    for i in range(64):
        packed |= bits[:, i] << np.uint64(i)
    for qid in ids[ids % 64 == 0]:
        qsig = packed[ids == qid][0]
        x = packed ^ qsig
        d = np.array([bin(int(v)).count("1") for v in x])
        mask = ids != qid
        order = np.lexsort((ids[mask], d[mask]))[:5]
        want = list(zip(ids[mask][order], d[mask][order]))
        got_rows = out[out["q_id"] == qid].sort_values("rnk")
        got = list(zip(got_rows["vec_id"], got_rows["hamming"]))
        assert [(int(a), int(b)) for a, b in got] == [
            (int(a), int(b)) for a, b in want
        ], qid


def test_ndcg_eval_matches_pure_python_reimplementation(spark):
    """text_ndcg_eval ≡ an independent pure-python BM25 + NDCG/MRR
    pipeline from the raw documents (tokenize → tf/df/dl → score → rank →
    graded-gain DCG with the same 1e4 quantization)."""
    import math
    from collections import Counter, defaultdict

    out = (
        all_queries()["text_ndcg_eval"](spark, SF)
        .toPandas()
        .set_index("query_id")
    )
    docs = load_table(spark, SF, "documents").toPandas()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    tf = {d: Counter(ws) for d, ws in toks.items()}
    dl = {d: len(ws) for d, ws in toks.items()}
    df = Counter()
    for d, c in tf.items():
        for w in c:
            df[w] += 1
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    queries = defaultdict(list)
    for qid, term in [
        ("q0", "dup"), ("q0", "merge"), ("q0", "hash"),
        ("q1", "spark"), ("q1", "window"), ("q1", "sort"),
        ("q2", "table"), ("q2", "scan"), ("q2", "key"), ("q2", "fast"),
    ]:
        queries[qid].append(term)
    for qid, terms in queries.items():
        scores = Counter()
        for d in toks:
            s = 0
            for t in terms:
                f = tf[d].get(t, 0)
                if f:
                    idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                    s += round(
                        idf * (f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl)))
                        * 10000
                    )
            if s:
                scores[d] = s
        ranked = sorted(scores, key=lambda d: (-scores[d], d))[:10]
        rel = {
            d: sum(tf[d].get(t, 0) for t in terms)
            for d in toks
            if any(t in tf[d] for t in terms)
        }
        dcg = sum(
            round(rel[d] * 10000 / math.log2(r + 2))
            for r, d in enumerate(ranked)
        )
        ideal = sorted(rel, key=lambda d: (-rel[d], d))[:10]
        idcg = sum(
            round(rel[d] * 10000 / math.log2(r + 2))
            for r, d in enumerate(ideal)
        )
        first = next((r + 1 for r, d in enumerate(ranked) if rel[d] >= 3), None)
        row = out.loc[qid]
        assert abs(float(row["ndcg10"]) - dcg / idcg) < 2e-6, qid
        assert abs(float(row["mrr"]) - (1 / first if first else 0.0)) < 1e-9
        assert int(row["n_rel3"]) == sum(1 for v in rel.values() if v >= 3)


def test_collocation_llr_is_global_top30_by_exact_g2(spark):
    """text_collocation_llr ≡ pure-python Dunning G² over ALL adjacent
    bigrams with cb>=5 — same quantization, same (g2, w1, w2) order."""
    import math
    from collections import Counter

    out = all_queries()["text_collocation_llr"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    bc = Counter()
    for text in docs["text"]:
        ws = text.split(" ")
        for a, b in zip(ws, ws[1:]):
            bc[(a, b)] += 1
    c1, c2 = Counter(), Counter()
    for (a, b), n in bc.items():
        c1[a] += n
        c2[b] += n
    m = sum(bc.values())

    def term(k, r, c):
        return round(k * math.log(k * m / (r * c)) * 10000) if k > 0 else 0

    rows = []
    for (a, b), cb in bc.items():
        if cb < 5:
            continue
        g2q = 2 * (
            term(cb, c1[a], c2[b])
            + term(c1[a] - cb, c1[a], m - c2[b])
            + term(c2[b] - cb, m - c1[a], c2[b])
            + term(m - c1[a] - c2[b] + cb, m - c1[a], m - c2[b])
        )
        rows.append((-g2q, a, b, cb))
    rows.sort()
    want = [(a, b, cb, -negg / 10000) for negg, a, b, cb in rows[:30]]
    got = list(
        zip(out["w1"], out["w2"], out["n_pair"].astype(int), out["g2"])
    )
    assert [(a, b, c) for a, b, c, _ in got] == [
        (a, b, c) for a, b, c, _ in want
    ]
    assert all(abs(x - y) < 1e-9 for (_, _, _, x), (_, _, _, y) in zip(got, want))


def test_not_in_trap_semantics(spark):
    """subq_not_in_null_trap: NOT IN over a null-bearing list is empty;
    NOT EXISTS and the filtered NOT IN agree with the pandas complement."""
    row = all_queries()["subq_not_in_null_trap"](spark, SF).toPandas().iloc[0]
    cust = load_table(spark, SF, "customer").toPandas()
    orders = load_table(spark, SF, "orders").toPandas()
    probe = set(
        orders.loc[
            (orders["o_orderstatus"] == "P") & (orders["o_orderkey"] % 97 != 0),
            "o_custkey",
        ]
    )
    has_null = (
        (orders["o_orderstatus"] == "P") & (orders["o_orderkey"] % 97 == 0)
    ).any()
    assert has_null  # the trap is armed
    want = int((~cust["c_custkey"].isin(probe)).sum())
    assert int(row["n_not_in"]) == 0
    assert int(row["n_not_exists"]) == want
    assert int(row["n_not_in_filtered"]) == want
    assert int(row["n_customers"]) == len(cust)


def test_bitmap_distinct_equals_pandas_nunique(spark):
    """agg_bitmap_distinct ≡ pandas groupby nunique, sliced and not."""
    out = (
        all_queries()["agg_bitmap_distinct"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    ev = load_table(spark, SF, "events").toPandas()
    for etype, grp in ev.groupby("event_type"):
        assert int(out.loc[etype, "n_users"]) == grp["user_id"].nunique()
        assert (
            int(out.loc[etype, "n_users_high"])
            == grp.loc[grp["value"] > 50, "user_id"].nunique()
        )


def test_stl_lite_matches_pandas_decomposition(spark):
    """ts_stl_lite ≡ pandas centered rolling(7) detrend + per-dow mean."""
    out = all_queries()["ts_stl_lite"](spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    for etype, grp in ev.groupby("event_type"):
        daily = grp.groupby("day").size().sort_index()
        trend = daily.rolling(7, center=True, min_periods=7).mean()
        det = (daily - trend).dropna()
        dows = det.index.dayofweek
        sub = out[out["event_type"] == etype].set_index("dow")
        for dow in sorted(set(dows)):
            vals = det[dows == dow]
            assert int(sub.loc[dow, "n_days"]) == len(vals)
            assert abs(float(sub.loc[dow, "seasonal"]) - vals.mean()) < 2e-6


def test_mann_whitney_matches_rank_reference(spark):
    """win_mann_whitney ≡ pandas average-rank U and tie-corrected z."""
    row = all_queries()["win_mann_whitney"](spark, SF).toPandas().iloc[0]
    ev = load_table(spark, SF, "events").toPandas()
    a = ev.loc[ev["event_type"] == "view", "value"]
    b = ev.loc[ev["event_type"] == "purchase", "value"]
    pooled = pd.concat([a, b])
    ranks = pooled.rank(method="average")
    ra = ranks.iloc[: len(a)].sum()
    na, nb = len(a), len(b)
    u = ra - na * (na + 1) / 2
    assert int(row["n_a"]) == na and int(row["n_b"]) == nb
    assert abs(float(row["u_a"]) - u) < 1e-9
    t = pooled.value_counts().to_numpy()
    tie = (t**3 - t).sum()
    n = na + nb
    var = na * nb / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - na * nb / 2) / np.sqrt(var)
    assert abs(float(row["z"]) - z) < 1e-6
    assert int(row["reject_05"]) == int(abs(z) > 1.96)


def test_importance_hashed_matches_python_dsir(spark):
    """sample_importance_hashed ≡ pure-python hashed log-ratio scoring
    (hashlib md5 buckets, 1e4 quantization, same top-100 order)."""
    import hashlib
    import math
    from collections import Counter

    out = all_queries()["sample_importance_hashed"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % 64

    tc, cc = Counter(), Counter()
    per_doc = {}
    for r in docs.itertuples():
        bs = Counter(bucket(w) for w in r.text.split(" "))
        per_doc[r.doc_id] = bs
        for bkt, n in bs.items():
            cc[bkt] += n
            if r.lang == "en":
                tc[bkt] += n
    t_tot, c_tot = sum(tc.values()), sum(cc.values())
    lrq = {
        bkt: round(
            math.log(
                ((tc[bkt] + 1) / (t_tot + 64)) / ((cc[bkt] + 1) / (c_tot + 64))
            )
            * 10000
        )
        for bkt in cc
    }
    scored = []
    for d, bs in per_doc.items():
        wq = sum(n * lrq[bkt] for bkt, n in bs.items())
        ntok = sum(bs.values())
        scored.append((-(wq / ntok), d, ntok))
    scored.sort()
    want_ids = [d for _, d, _ in scored[:100]]
    assert list(out["doc_id"]) == want_ids
    en_share = (out["lang"] == "en").mean()
    corpus_share = (docs["lang"] == "en").mean()
    assert en_share > corpus_share  # the resampler actually tilts toward target


def test_concurrency_peak_matches_sweep_reference(spark):
    """win_concurrency_peak ≡ a pure-python event sweep with closed-open
    [-1 before +1] tie handling."""
    out = (
        all_queries()["win_concurrency_peak"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    ev = (
        load_table(spark, SF, "events")
        .select("event_type", "event_id", F.unix_micros("ts").alias("s"))
        .toPandas()
    )
    LEN = 600_000_000
    for etype, grp in ev.groupby("event_type"):
        deltas = []
        for r in grp.itertuples():
            deltas.append((r.s, 1, r.event_id))
            deltas.append((r.s + LEN, -1, r.event_id))
        deltas.sort()
        run = peak = 0
        t_at = None
        for t, d, _ in deltas:
            run += d
            if run > peak:
                peak, t_at = run, t
        row = out.loc[etype]
        assert int(row["peak"]) == peak
        assert int(row["t_at_peak_us"]) == t_at
        assert int(row["n_events"]) == len(grp)


def test_acf_matches_numpy_corrcoef(spark):
    """ts_acf ≡ np.corrcoef on the dense day-count series shifts."""
    out = all_queries()["ts_acf"](spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    ev["didx"] = ev["ts"].dt.floor("D").astype("int64") // (86_400 * 10**9)
    for etype, grp in ev.groupby("event_type"):
        counts = grp.groupby("didx").size()
        sub = out[out["event_type"] == etype].set_index("lag")
        for lag in range(1, 8):
            x, y = [], []
            for didx, n in counts.items():
                if didx + lag in counts.index:
                    x.append(n)
                    y.append(counts[didx + lag])
            assert int(sub.loc[lag, "k_pairs"]) == len(x)
            r = np.corrcoef(x, y)[0, 1]
            got = sub.loc[lag, "r"]
            if np.isnan(r):
                assert pd.isna(got)
            else:
                assert abs(float(got) - r) < 1e-6, (etype, lag)


def test_welch_ttest_matches_numpy_reference(spark):
    """agg_welch_ttest ≡ numpy Welch t on the 1e-3-quantized samples
    (the quantization is part of the op's defined statistic)."""
    row = all_queries()["agg_welch_ttest"](spark, SF).toPandas().iloc[0]
    ev = load_table(spark, SF, "events").toPandas()
    a = (ev.loc[ev["event_type"] == "click", "value"] * 1000).round() / 1000
    b = (ev.loc[ev["event_type"] == "signup", "value"] * 1000).round() / 1000
    assert int(row["n_a"]) == len(a) and int(row["n_b"]) == len(b)
    md = a.mean() - b.mean()
    t = md / np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    assert abs(float(row["mean_diff"]) - md) < 1e-6
    assert abs(float(row["t_stat"]) - t) < 1e-6


def test_jaccard_neighbors_matches_pandas_reference(spark):
    """graph_jaccard_neighbors ≡ brute-force pandas neighbor Jaccard."""
    from collections import defaultdict
    from itertools import combinations

    out = all_queries()["graph_jaccard_neighbors"](spark, SF).toPandas()
    li = load_table(spark, SF, "lineitem").toPandas()
    orders_of = defaultdict(set)
    for r in li.itertuples():
        orders_of[r.l_partkey].add(r.l_orderkey)
    pair_inter = defaultdict(int)
    by_order = defaultdict(set)
    for r in li.itertuples():
        by_order[r.l_orderkey].add(r.l_partkey)
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            pair_inter[(a, b)] += 1
    rows = []
    for (a, b), i in pair_inter.items():
        if i >= 2:
            u = len(orders_of[a]) + len(orders_of[b]) - i
            rows.append((-(i / u), a, b, i, u))
    rows.sort()
    want = [(a, b, i, u) for _, a, b, i, u in rows[:30]]
    got = list(
        zip(out["pa"], out["pb"], out["n_shared"].astype(int),
            out["n_union"].astype(int))
    )
    assert [(int(a), int(b), i, u) for a, b, i, u in got] == want


def test_ngram_novelty_first_doc_attribution(spark):
    """text_ngram_novelty ≡ python first-occurrence scan in doc_id order;
    novelty over the whole corpus conserves to the distinct shingle
    count."""
    out = all_queries()["text_ngram_novelty"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas().sort_values("doc_id")
    seen = set()
    want = {}
    all_shingles = set()
    for r in docs.itertuples():
        ws = r.text.split(" ")
        sh = {" ".join(ws[i:i + 5]) for i in range(len(ws) - 4)}
        novel = sh - seen
        want[r.doc_id] = (len(sh), len(novel))
        seen |= sh
        all_shingles |= sh
    got = out.set_index("doc_id")
    for d, (n_sh, n_nov) in want.items():
        assert int(got.loc[d, "n_shingles"]) == n_sh
        assert int(got.loc[d, "n_novel"]) == n_nov
    assert int(out["n_novel"].sum()) == len(all_shingles)


def test_pack_sequences_conservation_and_bounds(spark):
    """pack_sequences_bestfit: every doc packed exactly once, no bin over
    budget, bin count within [LB, greedy-arrival count]; deterministic
    across runs."""
    out = all_queries()["pack_sequences_bestfit"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    B = 256
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    fills = out.groupby(["shard", "bin_idx"]).agg(
        fill=("n_tokens", "sum"), reported=("bin_fill", "first")
    )
    assert (fills["fill"] == fills["reported"]).all()
    assert (fills["fill"] <= B).all()
    # shard-local optimality sandwich (membership from the output itself —
    # the round-7 op shards by pmod(hash(doc_id), ceil(n/target)), so the
    # test must not hard-code a shard function)
    sizes = docs.assign(n=docs["text"].str.split(" ").str.len())
    for shard, grp in out.groupby("shard"):
        ssize = sizes[sizes["doc_id"].isin(set(grp["doc_id"]))]
        lb = int(np.ceil(ssize["n"].sum() / B))
        n_bins = grp["bin_idx"].nunique()
        # greedy arrival-order packing (pack_token_budget's semantics)
        greedy, fill = 1, 0
        for n in ssize.sort_values("doc_id")["n"]:
            if fill + n > B:
                greedy += 1
                fill = 0
            fill += n
        assert lb <= n_bins <= greedy, (shard, lb, n_bins, greedy)
    out2 = all_queries()["pack_sequences_bestfit"](spark, SF).toPandas()
    assert out.sort_values(["shard", "bin_idx", "doc_id"]).reset_index(
        drop=True
    ).equals(out2.sort_values(["shard", "bin_idx", "doc_id"]).reset_index(drop=True))


def test_split_select_ignores_commas_and_parens_in_literals():
    """ADVICE r6: a quoted literal containing a comma or unbalanced paren
    must not split the fragment (SQL's doubled-quote escape included)."""
    from filemap_spark.operators.aggregates import _split_select

    parts = _split_select(
        "concat('a,b', ')', x) AS a, 'it''s, (fine' AS b, 1 AS c"
    )
    assert [p.strip().rsplit(" ", 1)[-1] for p in parts] == ["a", "b", "c"]


def test_mwu_and_ks_degenerate_inputs_emit_null_not_inf(spark, tmp_path):
    """ADVICE r6 guards: all pooled values identical → tie-corrected
    variance 0 → NULL z / reject_05 (not Inf); one sample empty → NULL
    d_stat / crit_05 / reject_05 (not 0/0)."""
    ev = load_table(spark, SF, "events")

    const_dir = str(tmp_path / "const")
    ev.withColumn("value", F.lit(42.0)).write.parquet(
        const_dir + "/events.parquet"
    )
    row = all_queries()["win_mann_whitney"](spark, const_dir).collect()[0]
    assert row["n_a"] > 0 and row["n_b"] > 0
    assert row["z"] is None and row["reject_05"] is None

    noerr_dir = str(tmp_path / "noerr")
    ev.where(F.col("event_type") != "error").write.parquet(
        noerr_dir + "/events.parquet"
    )
    row = all_queries()["agg_ks_two_sample"](spark, noerr_dir).collect()[0]
    assert row["n_a"] > 0 and row["n_b"] == 0
    assert row["d_stat"] is None
    assert row["crit_05"] is None and row["reject_05"] is None


def test_acf_densifies_missing_days(spark, tmp_path):
    """ADVICE r6: ts_acf must observe zero-event days as 0-count cells —
    on a series with only days {d0, d0+3} present, every lag-k pair count
    is span − k (4-day span), not the sparse form's near-zero overlap."""
    ev = load_table(spark, SF, "events")
    didx = F.expr("unix_micros(date_trunc('day', ts)) div 86400000000")
    d0 = ev.agg(F.min(didx)).collect()[0][0]
    gap_dir = str(tmp_path / "gap")
    ev.where(didx.isin(d0, d0 + 3)).write.parquet(gap_dir + "/events.parquet")
    out = all_queries()["ts_acf"](spark, gap_dir).toPandas()
    assert len(out) > 0
    assert (out["k_pairs"] == 4 - out["lag"].clip(upper=4)).all(), out
