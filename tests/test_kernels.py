"""Kernel-level differential tests for the round-2 vectorized/iterative
cores: per-cell top-k vs brute force, star-rounds CC vs union-find, and the
merge-reduce batch-boundary carry logic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def _brute_topk(q_ids, q_mat, i_ids, i_mat, k):
    """Reference: per query, top-k candidates by (rounded sim DESC, id ASC),
    self excluded."""
    out = set()
    sims = np.round(q_mat @ i_mat.T, 6)
    for qi, qid in enumerate(q_ids):
        cands = [
            (-sims[qi, j], int(i_ids[j]))
            for j in range(len(i_ids))
            if i_ids[j] != qid
        ]
        cands.sort()
        for negs, nid in cands[:k]:
            out.add((int(qid), nid, -negs))
    return out


@pytest.mark.parametrize("n_index,n_query,seed", [(40, 25, 0), (3, 6, 1), (5, 5, 2), (1, 4, 3)])
def test_cell_topk_matches_bruteforce(n_index, n_query, seed):
    """_cell_topk must equal brute force for member AND non-member queries,
    including cells smaller than k and heavy 6dp ties."""
    from filemap_spark.operators.similarity import _cell_topk

    rng = np.random.RandomState(seed)
    dim = 8
    i_mat = rng.randn(n_index, dim)
    i_mat /= np.linalg.norm(i_mat, axis=1, keepdims=True)
    i_ids = np.arange(100, 100 + n_index, dtype=np.int64)
    # queries: half are index members (same vector -> sim 1.0 self to mask),
    # half are fresh vectors
    q_rows = []
    q_ids = []
    for qi in range(n_query):
        if qi % 2 == 0 and qi // 2 < n_index:
            q_rows.append(i_mat[qi // 2])
            q_ids.append(i_ids[qi // 2])
        else:
            v = rng.randn(dim)
            q_rows.append(v / np.linalg.norm(v))
            q_ids.append(1000 + qi)
    q_mat = np.vstack(q_rows)
    q_ids = np.asarray(q_ids, dtype=np.int64)

    got_pdf = _cell_topk(q_ids, q_mat, i_ids, i_mat, k=5)
    got = {
        (int(r.vec_id), int(r.nbr_id), float(r.sim))
        for r in got_pdf.itertuples(index=False)
    }
    assert got == _brute_topk(q_ids, q_mat, i_ids, i_mat, 5)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # resolve to component minimum
    return {x: find(x) for x in parent}


def _alternating_star_case(spark, seed, n_nodes, n_edges):
    from filemap_spark.operators.relational import alternating_star_components

    rng = np.random.RandomState(seed)
    edges = [
        (int(rng.randint(n_nodes)), int(rng.randint(n_nodes))) for _ in range(n_edges)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    expected = _union_find(edges)
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r["node"]: r["component"]
        for r in alternating_star_components(df).collect()
    }
    assert got == expected


def test_alternating_star_matches_union_find(spark):
    """Three seeded random graphs vs a pure-Python union-find, run
    CONCURRENTLY (iterative-CC driver jobs; the wall is the slowest
    case — r18, VERDICT r17 task 3)."""
    from concurrent.futures import ThreadPoolExecutor

    cases = [(0, 30, 20), (1, 50, 60), (2, 12, 40)]
    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(lambda c: _alternating_star_case(spark, *c), cases))


def test_merge_reduce_carries_state_across_arrow_batches(spark, tmp_path):
    """Force 3-row Arrow batches so user runs straddle batch boundaries —
    the carry/stitch path of reduce_sorted_runs must still produce exactly
    the window-SQL answer."""
    from filemap_spark.operators.sorts import reduce_sorted_runs

    sf_dir = str(tmp_path)
    rows = []
    eid = 0
    # user 1: 7 events (straddles multiple 3-row batches); users 2-4 small
    for user, stamps in [(1, [0, 5, 9, 14, 30, 31, 32]), (2, [100]), (3, [7, 7]), (4, [50, 90])]:
        for s in stamps:
            rows.append((user, eid, s * 1000))  # ns
            eid += 1
    spark.createDataFrame(rows, "user_id long, event_id long, ts long").write.parquet(
        f"{sf_dir}/events.parquet"
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        got = {
            r["user_id"]: (r["n_events"], r["first_us"], r["last_us"], r["max_gap_us"])
            for r in reduce_sorted_runs(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == {
        1: (7, 0, 32, 16),  # max gap 30-14=16
        2: (1, 100, 100, 0),
        3: (2, 7, 7, 0),
        4: (2, 50, 90, 40),
    }


def test_ball_pruning_bound_is_exhaustive(spark):
    """The dedup_embedding_cosine probe rule must reach every pair >=
    threshold: verified directly on the contract vectors — every oracle
    pair's smaller-id side must probe the larger-id side's cell."""
    from filemap_spark.operators.similarity import (
        _normalized_matrix,
        _train_centroids,
    )
    from filemap_spark.io import load_table

    sf_dir = "/root/testdata/sf0.01"
    threshold = 0.4
    cents = _train_centroids(spark, sf_dir)
    pdf = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    ids, mat = _normalized_matrix(pdf)
    sims_c = mat @ cents.T
    cell = np.argmax(sims_c, axis=1)
    angle = np.arccos(np.clip(sims_c[np.arange(len(ids)), cell], -1, 1))
    radii = np.zeros(len(cents))
    for c in range(len(cents)):
        if (cell == c).any():
            radii[c] = angle[cell == c].max()
    max_angle = float(np.arccos(threshold - 1e-6)) + 1e-9
    ang_all = np.arccos(np.clip(sims_c, -1, 1))

    sims = np.round(mat @ mat.T, 6)
    ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
    assert len(ai) > 0
    for a, b in zip(ai, bi):
        lo, hi = (a, b) if ids[a] < ids[b] else (b, a)
        assert ang_all[lo, cell[hi]] <= max_angle + radii[cell[hi]], (ids[lo], ids[hi])


def _merge_labels_case(spark, seed, n_nodes, n_old, n_delta):
    from filemap_spark.operators.relational import (
        alternating_star_components,
        merge_component_labels,
    )

    rng = np.random.RandomState(seed)

    def rand_pairs(n, hi):
        raw = [(int(rng.randint(hi)), int(rng.randint(hi))) for _ in range(n)]
        return [(u, v) for u, v in raw if u != v]

    # old graph lives on the lower half of the id space; delta pairs span the
    # full space so some touch old components, some are new-new
    old_edges = rand_pairs(n_old, n_nodes // 2)
    delta_edges = rand_pairs(n_delta, n_nodes)
    all_ids = list(range(n_nodes))

    def full_labels(edges):
        base = {x: x for x in all_ids}
        if edges:
            df = spark.createDataFrame(edges, "u long, v long")
            base.update(
                {r["node"]: r["component"] for r in alternating_star_components(df).collect()}
            )
        return base

    old_labels_map = full_labels(old_edges)
    old_labels = spark.createDataFrame(
        list(old_labels_map.items()), "doc_id long, component long"
    )
    delta_df = spark.createDataFrame(delta_edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in merge_component_labels(old_labels, delta_df).collect()
    }
    assert got == full_labels(old_edges + delta_edges)


def test_merge_component_labels_equals_full_recompute(spark):
    """Delta CC must equal a from-scratch CC over (old ∪ delta) pairs —
    including chains where a delta pair merges two old components, delta
    pairs among brand-new (unlabeled) nodes, and an empty old graph.
    The three seeded cases run CONCURRENTLY (r18, VERDICT r17 task 3):
    each is dozens of tiny iterative-CC driver jobs, so the wall is the
    slowest case instead of the sum — same graphs, same assertions."""
    from concurrent.futures import ThreadPoolExecutor

    cases = [(0, 40, 25, 15), (1, 60, 10, 50), (2, 25, 0, 30)]
    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(lambda c: _merge_labels_case(spark, *c), cases))


def _pagerank_case(spark, seed, n_nodes, n_edges):
    import numpy as np

    from filemap_spark.operators.relational import pagerank_undirected

    rng = np.random.default_rng(seed)
    pairs = set()
    while len(pairs) < n_edges:
        u, v = rng.integers(0, n_nodes, size=2)
        if u != v:
            pairs.add((min(int(u), int(v)), max(int(u), int(v))))
    edges = spark.createDataFrame(sorted(pairs), "u long, v long")

    got = {
        r["node"]: r["rank"] for r in pagerank_undirected(edges, iters=20).collect()
    }

    nodes = sorted({x for p in pairs for x in p})
    idx = {nid: i for i, nid in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for u, v in pairs:
        A[idx[v], idx[u]] = 1.0
        A[idx[u], idx[v]] = 1.0
    deg = A.sum(axis=0)
    M = A / deg  # column-stochastic: M[v,u] = 1/deg(u) for each edge
    r = np.full(n, 1.0 / n)
    for _ in range(20):
        r = (1 - 0.85) / n + 0.85 * (M @ r)

    assert set(got) == set(nodes)
    for nid in nodes:
        assert abs(got[nid] - r[idx[nid]]) < 1e-9, (nid, got[nid], r[idx[nid]])


def test_pagerank_matches_numpy_power_iteration(spark):
    """pagerank_undirected must match a dense numpy power iteration with
    the identical formula, damping, and iteration count on random seeded
    graphs (self-loops excluded, parallel edges deduped). The three
    seeded cases run CONCURRENTLY — 20 iterative driver jobs each, so
    the wall is the slowest case (r18, VERDICT r17 task 3)."""
    from concurrent.futures import ThreadPoolExecutor

    cases = [(7, 12, 20), (21, 30, 55), (5, 8, 9)]
    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(lambda c: _pagerank_case(spark, *c), cases))


def test_pagerank_survivor_is_max_rank_per_component(spark, sf_dir):
    """The survivor op must pick exactly the max-rank (tiebreak min doc_id)
    member of every multi-doc near-dup component, with the component's true
    size attached."""
    from filemap_spark import all_queries

    rows = all_queries()["dedup_survivor_pagerank"](spark, sf_dir).collect()
    labels = {
        r["doc_id"]: r["component"]
        for r in all_queries()["dedup_connected_components"](spark, sf_dir).collect()
    }
    from collections import Counter

    sizes = Counter(labels.values())
    multi = {c for c, n in sizes.items() if n > 1}
    assert {r["component"] for r in rows} == multi
    for r in rows:
        assert sizes[r["component"]] == r["cluster_size"]
        assert labels[r["survivor"]] == r["component"]


@pytest.mark.parametrize("n_rows,n_tiles", [(1, 3), (2, 3), (7, 3), (9, 3), (100, 3), (100, 7), (5, 8)])
def test_distributed_ntile_equals_window_ntile(spark, n_rows, n_tiles):
    """functions/ranks.with_global_ntile must reproduce ntile() OVER
    (ORDER BY score, id) EXACTLY — including n < n_tiles, n not divisible
    by n_tiles, and duplicate scores resolved by the id tiebreak — while
    keeping the data off a single-partition window."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from filemap_spark.functions.ranks import with_global_ntile

    rows = [(i, float((i * 7) % 13)) for i in range(n_rows)]  # dup scores
    df = spark.createDataFrame(rows, "id long, score double").repartition(8)
    got = {
        r["id"]: r["tile"]
        for r in with_global_ntile(df, n_tiles, "score", "id").collect()
    }
    w = Window.orderBy("score", "id")
    want = {
        r["id"]: r["t"]
        for r in df.withColumn("t", F.ntile(n_tiles).over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("nparts", [1, 3, 32])
def test_distributed_ntile_partition_invariant(spark, nparts):
    """Tile assignment must not depend on the range-exchange partition
    count (the knob a cluster tunes independently of data)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from filemap_spark.functions.ranks import with_global_ntile

    rows = [(i, float((i * 31) % 17)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score double")
    got = {
        r["id"]: r["tile"]
        for r in with_global_ntile(
            df, 4, "score", "id", num_partitions=nparts
        ).collect()
    }
    w = Window.orderBy("score", "id")
    want = {
        r["id"]: r["t"] for r in df.withColumn("t", F.ntile(4).over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_paragraph_containment_matches_bruteforce(spark, seed):
    """paragraph_containment_pairs must equal an independent brute-force
    recomputation (python sets over aligned chunks) on random corpora
    manufactured to contain partial copies — including a doc embedding
    half of another, which whole-doc Jaccard misses but containment flags."""
    import random

    from filemap_spark.operators.text import paragraph_containment_pairs

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    K = 4  # small paragraphs so fixtures stay readable
    base = [rng.choice(vocab) for _ in range(K * 6)]
    docs = {0: base}
    # partial copy: first half of doc 0 + fresh tail
    docs[1] = base[: K * 3] + [rng.choice(vocab) for _ in range(K * 3)]
    # full copy with one paragraph edited
    edited = list(base)
    edited[K * 2] = "mutant"
    docs[2] = edited
    # unrelated docs
    for i in range(3, 8):
        docs[i] = [rng.choice(vocab) for _ in range(K * rng.randint(3, 7))]
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_shared"], r["n_para_a"], r["n_para_b"], r["containment"]
        )
        for r in paragraph_containment_pairs(df, para_tokens=K).collect()
    }

    def chunks(ws):
        return {" ".join(ws[i : i + K]) for i in range(0, len(ws), K)}

    want = {}
    ids = sorted(docs)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            ca, cb = chunks(docs[x]), chunks(docs[y])
            shared = len(ca & cb)
            if shared and shared / min(len(ca), len(cb)) >= 0.5:
                want[(x, y)] = (
                    shared, len(ca), len(cb),
                    round(shared / min(len(ca), len(cb)), 6),
                )
    assert got == want
    assert (0, 1) in want and (0, 2) in want  # the manufactured cases fired


def test_pca_matches_numpy_direct(spark, sf_dir):
    """pca_components' one-pass distributed Gram partials + driver eigh
    must reproduce a direct numpy PCA of the fully collected matrix, and
    emb_pca_project's projections must match to 6dp."""
    from filemap_spark import all_queries
    from filemap_spark.io import load_table
    from filemap_spark.operators.similarity import pca_components

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    mat = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])

    mean, comps = pca_components(emb)
    assert np.allclose(mean, mat.mean(axis=0), atol=1e-9)

    cov = np.cov(mat, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][: comps.shape[1]]
    want = vecs[:, order]
    for j in range(want.shape[1]):
        i = int(np.abs(want[:, j]).argmax())
        if want[i, j] < 0:
            want[:, j] = -want[:, j]
    assert np.allclose(comps, want, atol=1e-6), np.abs(comps - want).max()

    res = all_queries()["emb_pca_project"](spark, sf_dir)
    pc_cols = [c for c in res.columns if c.startswith("pc")]
    assert pc_cols == [f"pc{j}" for j in range(want.shape[1])]
    got = {
        r["vec_id"]: np.asarray([r[c] for c in pc_cols]) for r in res.collect()
    }
    proj = (mat - mat.mean(axis=0)) @ want
    for i, r in enumerate(rows):
        assert np.allclose(got[r["vec_id"]], np.round(proj[i], 6), atol=2e-6)


def test_pca_partials_one_row_per_partition(spark, sf_dir):
    """The production Gram-partials pass must fold Arrow batches inside
    each partition: driver state is O(partitions), not O(batches). Force
    tiny Arrow batches over 3 partitions and count the partial rows, then
    check the folded totals are exact."""
    from filemap_spark.io import load_table
    from filemap_spark.operators.similarity import gram_partials

    emb = load_table(spark, sf_dir, "embeddings").repartition(3)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        parts = gram_partials(emb).collect()
        assert len(parts) == 3  # one row per partition, NOT per 7-row batch
        assert sum(r["n"] for r in parts) == emb.count()
        mat = np.vstack(
            [
                np.asarray(r["embedding"], dtype=np.float64)
                for r in emb.select("embedding").collect()
            ]
        )
        s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
        assert np.allclose(s, mat.sum(axis=0), atol=1e-6)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_kmeans_cluster_report_matches_numpy(spark, sf_dir):
    """emb_cluster_kmeans's per-cluster sizes and cohesion bounds must
    reproduce a direct numpy assignment of the full collected matrix
    against the same deterministic centroids."""
    from filemap_spark import all_queries
    from filemap_spark.io import load_table
    from filemap_spark.operators.similarity import _train_centroids

    cents = _train_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()
    mat = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ cents.T
    assign = np.argmax(sims, axis=1)
    best = sims[np.arange(len(rows)), assign]

    got = {r["cluster"]: r for r in all_queries()["emb_cluster_kmeans"](spark, sf_dir).collect()}
    for c in range(cents.shape[0]):
        members = best[assign == c]
        if len(members) == 0:
            assert c not in got
            continue
        row = got[c]
        assert row["n_vectors"] == len(members)
        # the op recomputes sim as cos(arccos(sim)); allow 1 ulp of slack
        assert abs(row["min_sim"] - round(members.min(), 6)) <= 1e-6
        assert abs(row["max_sim"] - round(members.max(), 6)) <= 1e-6
        assert abs(row["avg_sim"] - members.mean()) <= 2e-6

    # rerun-identical report
    a = [tuple(r) for r in all_queries()["emb_cluster_kmeans"](spark, sf_dir).collect()]
    b = [tuple(r) for r in all_queries()["emb_cluster_kmeans"](spark, sf_dir).collect()]
    assert a == b


def test_semdedup_report_matches_numpy(spark, sf_dir):
    """dedup_semdedup's per-cluster report must reproduce a direct numpy
    within-cluster brute force: same assignments (deterministic
    quantizer), same 6dp pair threshold, same smaller-id keep rule."""
    from filemap_spark import all_queries
    from filemap_spark.io import load_table
    from filemap_spark.operators.similarity import (
        _SEMDEDUP_T,
        _train_centroids,
    )

    cents = _train_centroids(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    assign = np.argmax(mat @ cents.T, axis=1)

    got = {
        r["cell"]: r
        for r in all_queries()["dedup_semdedup"](spark, sf_dir).collect()
    }
    for c in range(cents.shape[0]):
        sel = assign == c
        if not sel.any():
            assert c not in got
            continue
        sub = mat[sel]
        sims = np.round(sub @ sub.T, 6)
        dup = np.triu(sims >= _SEMDEDUP_T, k=1)
        row = got[c]
        assert row["n_vectors"] == int(sel.sum())
        assert row["n_dup_pairs"] == int(dup.sum())
        assert row["n_removed"] == int(dup.any(axis=0).sum())


def test_semdedup_blocked_kernel_crosses_block_boundary():
    """Round-10 blocked-matmul pin (VERDICT r9 task 3): the contract
    corpus's cells are all ≪ one 2048-row block, so this drives the
    module-level kernel directly with a 3,040-row synthetic cell (blocks
    of 2048 + 992) and checks it against a float64 full-matrix brute
    force AND against itself with blocking disabled. The fixture keeps
    every pairwise cosine ≥ 1e-3 away from the 0.4 threshold (asserted),
    so float32-vs-float64 noise cannot flip a classification."""
    from filemap_spark.operators.similarity import (
        _SEMDEDUP_T,
        _semdedup_cell_report,
    )

    rng = np.random.default_rng(7)
    dim, n_cap, n_far = 64, 3000, 40
    # cap members: cos30°·u + sin30°·w_i (w_i ⊥ u) — every cap pair's
    # cosine is 0.75 + 0.25·(w_i·w_j) ≥ 0.5, always a duplicate
    w = rng.normal(size=(n_cap, dim))
    w[:, 0] = 0.0
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    cap = np.zeros((n_cap, dim))
    cap[:, 0] = np.sqrt(3) / 2
    cap += 0.5 * w
    # far members: coordinate axes ⊥ u — mutually orthogonal, and vs cap
    # the cosine is 0.5·w_i[axis], far below 0.4 for this seed (asserted)
    far = np.eye(dim)[1 : 1 + n_far]
    mat32 = np.vstack([cap, far]).astype(np.float32)
    n = n_cap + n_far
    assert n > 2048  # must span two blocks

    ids = np.arange(10_000, 10_000 + n)
    perm = rng.permutation(n)
    pdf = pd.DataFrame(
        {
            "cell": np.full(n, 3),
            "vec_id": ids[perm],
            "embedding": list(mat32[perm]),
        }
    )

    # float64 full-matrix reference on the SAME float32 values
    m64 = mat32.astype(np.float64)
    sims = m64 @ m64.T
    off = ~np.eye(n, dtype=bool)
    assert np.abs(sims[off] - _SEMDEDUP_T).min() > 1e-3  # safe margins
    dup = np.triu(sims >= _SEMDEDUP_T, k=1)
    want_pairs = int(dup.sum())
    want_removed = int(dup.any(axis=0).sum())
    assert want_pairs == n_cap * (n_cap - 1) // 2  # cap is one dup family
    assert want_removed == n_cap - 1

    rep = _semdedup_cell_report(pdf).iloc[0]
    assert rep["cell"] == 3
    assert rep["n_vectors"] == n
    assert rep["n_dup_pairs"] == want_pairs
    assert rep["n_removed"] == want_removed
    assert rep["keep_rate"] == round((n - want_removed) / n, 6)
    # blocking is pure bookkeeping: disabling it changes nothing
    rep_full = _semdedup_cell_report(pdf, block=1 << 30).iloc[0]
    assert tuple(rep) == tuple(rep_full)


def _lttb_select_loop(x, y, k):
    """Pure-loop classic LTTB point selection (indices), written
    independently of the operator's vectorized kernel: same bucket edges,
    same triangle rule, same tie behavior (first argmax)."""
    n = len(x)
    if k <= 0:
        return []
    if n <= k:
        return list(range(n))
    if k == 1:
        return [0]
    edges = np.linspace(1, n - 1, k - 1).astype(int)
    sel = [0]
    a = 0
    for b in range(k - 2):
        lo, hi = edges[b], edges[b + 1]
        nxt_lo = hi
        nxt_hi = edges[b + 2] if b + 2 < k - 1 else n
        cx = sum(x[nxt_lo:nxt_hi]) / (nxt_hi - nxt_lo)
        cy = sum(y[nxt_lo:nxt_hi]) / (nxt_hi - nxt_lo)
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs((x[a] - cx) * (y[i] - y[a]) - (x[a] - x[i]) * (cy - y[a]))
            if area > best_area:
                best, best_area = i, area
        sel.append(best)
        a = best
    sel.append(n - 1)
    return sel


def _chunked_lttb_loop(x, y, points, chunk_rows):
    """Pure-loop mirror of the round-8 chunked operator: contiguous
    ROW-RANK blocks of chunk_rows (last partial), exact integer
    proportional budgets, classic LTTB per chunk. (Round 7 chunked by
    uniform time ranges; ADVICE r7 showed that only bounds group RAM
    under uniform density.)"""
    n = len(x)
    out = []
    ccum = 0
    for start in range(0, n, chunk_rows):
        idx = list(range(start, min(start + chunk_rows, n)))
        nc = len(idx)
        ccum += nc
        k = (points * ccum) // n - (points * (ccum - nc)) // n
        cx = [x[i] for i in idx]
        cy = [y[i] for i in idx]
        out.extend(idx[j] for j in _lttb_select_loop(cx, cy, k))
    return out


def test_lttb_matches_independent_reimplementation(spark, sf_dir):
    """ts_downsample_lttb (round-7 chunked form) vs a pure-loop
    reimplementation of the same algorithm — plus the single-chunk ≡
    classic-LTTB property and rerun-identity."""
    from filemap_spark import all_queries
    from filemap_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    got_rows = all_queries()["ts_downsample_lttb"](spark, sf_dir).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["event_type"], []).append((r["point_idx"], r["ts_us"]))
    for k in got:
        got[k] = [t for _, t in sorted(got[k])]

    pdf = (
        ev.selectExpr("event_type", "event_id", "unix_micros(ts) AS ts_us", "value")
        .toPandas()
        .sort_values(["ts_us", "event_id"], kind="mergesort")
    )
    for etype, g in pdf.groupby("event_type"):
        x = list(g["ts_us"])
        y = list(g["value"])
        sel = _chunked_lttb_loop(x, y, 20, 4096)
        want = sorted(x[i] for i in sel)
        assert got[etype] == want, etype
        assert got[etype][0] == x[0] and got[etype][-1] == x[-1]
        # ≤ 20 points, exactly 20 when no chunk's budget exceeds its rows
        assert len(got[etype]) <= 20 or len(x) <= 20

    again_rows = all_queries()["ts_downsample_lttb"](spark, sf_dir).collect()
    assert sorted(map(tuple, again_rows)) == sorted(map(tuple, got_rows))


def test_chunked_lttb_single_chunk_is_classic_lttb():
    """With n <= chunk rows the proportional allocation degenerates to one
    chunk with the full budget — the chunked selection must be identical
    to whole-series classic LTTB."""
    rng = np.random.RandomState(7)
    x = sorted(rng.choice(10**6, size=3000, replace=False).tolist())
    y = rng.randn(3000).tolist()
    assert _chunked_lttb_loop(x, y, 20, 4096) == _lttb_select_loop(x, y, 20)


def test_corr_cov_matches_numpy(spark, sf_dir):
    """agg_corr_cov's exact-integer closed form vs direct numpy on the raw
    columns. Quantity/price carry 2 decimals, so the centi-unit scaling is
    LOSSLESS and the match is tight (1e-9), not quantization-limited."""
    import numpy as np

    from filemap_spark.operators.aggregates import agg_corr_cov

    sf = sf_dir
    rows = agg_corr_cov(spark, sf).collect()
    import duckdb

    con = duckdb.connect()
    for flag, n, cov_p, cov_s, corr in [
        (r["l_returnflag"], r["n"], r["covar_pop"], r["covar_samp"], r["corr_qty_price"])
        for r in rows
    ]:
        x, y = con.sql(
            f"SELECT l_quantity, l_extendedprice FROM '{sf}/lineitem.parquet' "
            f"WHERE l_returnflag = '{flag}'"
        ).fetchnumpy().values()
        assert n == len(x)
        # outputs are 6dp-rounded; numpy's fold order adds ~1e-9 relative
        assert abs(cov_p - np.cov(x, y, bias=True)[0, 1]) < 6e-7 + 1e-8 * abs(cov_p)
        assert abs(cov_s - np.cov(x, y, bias=False)[0, 1]) < 6e-7 + 1e-8 * abs(cov_s)
        assert abs(corr - np.corrcoef(x, y)[0, 1]) < 6e-7


def test_skew_kurtosis_matches_numpy(spark, sf_dir):
    """agg_skew_kurtosis's quantized two-pass moments vs direct numpy
    central moments; the 1e-3 deviation quantization bounds the drift well
    under 1e-3 on both normalized statistics."""
    import duckdb
    import numpy as np

    from filemap_spark.operators.aggregates import agg_skew_kurtosis

    sf = sf_dir
    rows = agg_skew_kurtosis(spark, sf).collect()
    con = duckdb.connect()
    assert len(rows) >= 3
    for r in rows:
        (v,) = con.sql(
            f"SELECT value FROM '{sf}/events.parquet' "
            f"WHERE event_type = '{r['event_type']}'"
        ).fetchnumpy().values()
        d = v - v.mean()
        m2, m3, m4 = (d**2).mean(), (d**3).mean(), (d**4).mean()
        assert r["n"] == len(v)
        assert abs(r["mean_value"] - v.mean()) < 1e-5
        assert abs(r["std_pop"] - np.sqrt(m2)) < 1e-3
        assert abs(r["skewness"] - m3 / m2**1.5) < 1e-3
        assert abs(r["kurtosis_excess"] - (m4 / m2**2 - 3.0)) < 1e-3


def test_label_centroid_sim_matches_numpy(spark, sf_dir):
    """emb_label_centroid_sim vs direct numpy: mean per label, pairwise
    cosine. The op rounds coordinate means at 6dp before the quantized
    dot/norm sums, so agreement is bounded by that rounding (~1e-4 on a
    cosine of ~1-magnitude centroid norms), not by summation order."""
    import numpy as np

    from filemap_spark.io import load_table
    from filemap_spark.operators.similarity import emb_label_centroid_sim

    got = {
        (r["label_a"], r["label_b"]): r["cos_sim"]
        for r in emb_label_centroid_sim(spark, sf_dir).collect()
    }
    pdf = load_table(spark, sf_dir, "embeddings").toPandas()
    cents = {}
    for label, grp in pdf.groupby("label"):
        cents[label] = np.vstack(grp["embedding"].to_numpy()).astype(np.float64).mean(axis=0)
    labels = sorted(cents)
    n_pairs = 0
    for i, la in enumerate(labels):
        for lb in labels[i + 1 :]:
            ca, cb = cents[la], cents[lb]
            expect = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
            assert abs(got[(la, lb)] - expect) < 1e-4, (la, lb)
            n_pairs += 1
    assert n_pairs == len(got) == len(labels) * (len(labels) - 1) // 2


def test_pricing_prescaled_form_equals_direct_dsum_form(spark, sf_dir):
    """Round-6 flagship restructure: the pre-scaled int64 projection +
    derived avgs must be VALUE-IDENTICAL (exact string repr of every
    double, not approx) to the direct dsum/davg aggregate form it
    replaced — same association, same decimal descale, same rounding."""
    from filemap_spark.functions.numeric import davg, dsum
    from filemap_spark.io import load_table
    from filemap_spark.operators.aggregates import (
        _PRICING_CUTOFF,
        agg_pricing_summary,
    )

    direct = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit(_PRICING_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(dsum("l_quantity", "sum_qty")),
            F.expr(dsum("l_extendedprice", "sum_base_price")),
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")),
            F.expr(
                dsum(
                    "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
                    "sum_charge",
                )
            ),
            F.expr(davg("l_quantity", "avg_qty")),
            F.expr(davg("l_extendedprice", "avg_price")),
            F.expr(davg("l_discount", "avg_disc")),
            F.count("*").alias("count_order"),
        )
    )
    got = agg_pricing_summary(spark, sf_dir)
    assert got.columns == direct.columns

    def canon(df):
        return sorted(repr(tuple(r)) for r in df.collect())

    assert canon(got) == canon(direct)


def test_bm25_matches_pure_python(spark, sf_dir):
    """text_bm25_topk vs an independent collections.Counter BM25: same
    ranking and scores within the 1e4 quantization (5e-5)."""
    import math
    from collections import Counter

    from filemap_spark.io import load_table
    from filemap_spark.operators.text import (
        _BM25_QUERY_ROWS,
        _BM25_TOPK,
        text_bm25_topk,
    )

    rows = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    docs = {r["doc_id"]: r["text"].split(" ") for r in rows}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    df = Counter()
    for toks in docs.values():
        df.update(set(toks))

    queries = {}
    for qid, term in _BM25_QUERY_ROWS:
        queries.setdefault(qid, []).append(term)

    expect = {}
    for qid, terms in queries.items():
        scores = {}
        for did, toks in docs.items():
            tf = Counter(toks)
            s = 0
            for t in terms:
                if tf[t] == 0 or df[t] == 0:
                    continue
                idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                tfn = tf[t] * 2.2 / (tf[t] + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
                s += round(idf * tfn * 10000)  # the op's 1e4 quantization
            if s > 0:
                scores[did] = s / 10000.0
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_BM25_TOPK]
        expect[qid] = top

    got = text_bm25_topk(spark, sf_dir).collect()
    for r in got:
        e_doc, e_score = expect[r["query_id"]][r["rank"] - 1]
        assert r["doc_id"] == e_doc, (r, e_doc)
        assert abs(r["score"] - e_score) < 5e-5, (r, e_score)
    assert len(got) == sum(len(v) for v in expect.values())


def test_zipf_fit_matches_numpy_polyfit(spark, sf_dir):
    """text_zipf_fit vs numpy.polyfit over the same top-100 points: slope
    and intercept within the 1e4 log quantization (1e-3)."""
    from collections import Counter

    import numpy as np

    from filemap_spark.io import load_table
    from filemap_spark.operators.text import text_zipf_fit

    rows = load_table(spark, sf_dir, "documents").select("text").collect()
    counts = Counter()
    for r in rows:
        counts.update(r["text"].split(" "))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([n for _, n in top], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)

    got = text_zipf_fit(spark, sf_dir).collect()[0]
    assert got["n_points"] == len(top)
    assert abs(got["zipf_slope"] - slope) < 1e-3
    assert abs(got["ln_intercept"] - intercept) < 1e-3


def test_quant_pos_fixed_equals_bigdecimal_round_on_measure_columns(spark, sf_dir):
    """quant_pos_fixed (+0.5-truncate, codegen) must agree ROW-FOR-ROW with
    the BigDecimal round() spelling on every pricing measure expression —
    the precondition class (nonnegative exact ≤6dp decimals) from its
    docstring. Any disagreement row surfaces directly."""
    from filemap_spark.functions.numeric import quant_pos_fixed
    from filemap_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exprs = [
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_extendedprice * (1 - l_discount)",
        "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
    ]
    checks = [
        F.sum(
            (
                F.expr(quant_pos_fixed(e))
                != F.expr(f"cast(round(({e}) * 1000000) as bigint)")
            ).cast("long")
        ).alias(f"diff_{i}")
        for i, e in enumerate(exprs)
    ]
    row = li.agg(*checks).collect()[0]
    assert all(v == 0 for v in row), row.asDict()


def test_quant_pos_fixed_precondition_is_real(spark):
    """The docstring's exclusions are not hypothetical: a negative value
    (truncation toward zero) and a true mid-cell free double both flip
    vs round() — proving the helper must stay confined to its
    nonnegative exact-decimal class."""
    from filemap_spark.functions.numeric import quant_pos_fixed

    q = quant_pos_fixed("x")
    r = "cast(round((x) * 1000000) as bigint)"
    rows = spark.sql(
        f"SELECT {q} AS fast, {r} AS exact FROM (VALUES "
        "(cast(-1.5e-6 as double)), (cast(2.5e-7 as double))) AS t(x)"
    ).collect()
    assert any(row["fast"] != row["exact"] for row in rows), rows


@pytest.mark.parametrize("n_rows,nparts", [(1, 8), (7, 8), (100, 8), (100, 1), (100, 32)])
def test_distributed_cumsum_equals_window_running_sum(spark, n_rows, nparts):
    """functions/ranks.with_global_cumsum must reproduce sum() OVER
    (ORDER BY key, id ROWS UNBOUNDED PRECEDING) EXACTLY — duplicate order
    keys resolved by the id tiebreak, any partition count — while keeping
    the rows off a single-partition window."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from filemap_spark.functions.ranks import with_global_cumsum

    rows = [(i, (i * 7) % 13, (i * 31) % 97) for i in range(n_rows)]
    df = spark.createDataFrame(rows, "id long, key long, v long").repartition(8)
    got = {
        r["id"]: (r["cumsum"], r["tot"])
        for r in with_global_cumsum(
            df, "v", "key", "id", cumsum_col="cumsum", total_col="tot",
            num_partitions=nparts,
        ).collect()
    }
    w = Window.orderBy("key", "id").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    want = {
        r["id"]: (r["c"], r["t"])
        for r in df.withColumn("c", F.sum("v").over(w))
        .withColumn("t", F.sum("v").over(wall))
        .collect()
    }
    assert got == want


def test_cumsum_rank_col_equals_window_row_number(spark):
    """with_global_cumsum's free rank_col ≡ row_number() OVER the same
    order — one ranged pass must serve both outputs."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from filemap_spark.functions.ranks import with_global_cumsum

    rows = [(i, (i * 7) % 13, (i * 31) % 97) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, key long, v long").repartition(8)
    got = {
        r["id"]: (r["cumsum"], r["rnk"])
        for r in with_global_cumsum(
            df, "v", "key", "id", cumsum_col="cumsum", rank_col="rnk",
            num_partitions=8,
        ).collect()
    }
    w = Window.orderBy("key", "id")
    want = {
        r["id"]: (r["c"], r["rn"])
        for r in df.withColumn(
            "c", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .collect()
    }
    assert got == want


def test_mapside_shingle_frame_equals_lead_window_form(spark, sf_dir):
    """Round-9 rewrite pin: the map-side _shingle_frame (per-doc
    array_distinct over transform'd 5-gram slices, zero shuffle) must
    produce EXACTLY the distinct (doc_id, shingle) set of the r1-r8
    lead-window reference form — the property every LSH/ngram oracle hash
    rests on."""
    from filemap_spark.operators.text import _shingle_frame

    from pyspark.sql.window import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {(r["doc_id"], r["shingle"]) for r in _shingle_frame(docs).collect()}

    w = Window.partitionBy("doc_id").orderBy("pos")
    ref = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                "word",
                F.lead("word", 1).over(w),
                F.lead("word", 2).over(w),
                F.lead("word", 3).over(w),
                F.lead("word", 4).over(w),
            ).alias("shingle"),
            F.lead("word", 4).over(w).alias("w4"),
        )
        .where(F.col("w4").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )
    want = {(r["doc_id"], r["shingle"]) for r in ref.collect()}
    assert got == want and got  # non-vacuous


def test_band_buckets_equal_wide_column_reference(spark, sf_dir):
    """Round-9 rewrite pin: the posexploded-hash-array _band_buckets must
    emit bit-identical (doc_id, band, bucket) rows to the r3-r8
    wide-column form (128 hash cols -> 128 min aggs -> 32 hash(m4i..)
    band cols) — bucket hash argument order is part of the contract
    (signatures from different batches/rounds stay comparable)."""
    from filemap_spark.operators.text import (
        _LSH_BANDS,
        _LSH_HASHES,
        _band_buckets,
        _shingle_frame,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    sh = _shingle_frame(docs).localCheckpoint()
    got = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in _band_buckets(sh).collect()
    }

    sigs = sh.select(
        "doc_id",
        *[
            F.xxhash64(F.col("shingle"), F.lit(i)).alias(f"h{i}")
            for i in range(_LSH_HASHES)
        ],
    ).groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(_LSH_HASHES)]
    )
    rpb = _LSH_HASHES // _LSH_BANDS
    rows = sigs.select(
        "doc_id",
        *[
            F.hash(*[F.col(f"m{b * rpb + r}") for r in range(rpb)]).alias(f"b{b}")
            for b in range(_LSH_BANDS)
        ],
    ).collect()
    want = {
        (r["doc_id"], b, r[f"b{b}"]) for r in rows for b in range(_LSH_BANDS)
    }
    assert got == want and got


def test_bm25_rollup_stats_equal_direct_token_aggregation(spark, sf_dir):
    """Round-9 rewrite pin: every statistic the rolled-up masked postings
    frame (_bm25_tf) claims to carry — per-term tf, per-doc dl, per-term
    df, corpus n_toks, n_docs — must equal the same statistic aggregated
    directly from the raw token relation."""
    from filemap_spark.operators.text import _BM25_QUERY_ROWS, _bm25_tf, _tokens

    tfm = _bm25_tf(spark, sf_dir).localCheckpoint()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = _tokens(docs).select("doc_id", "word")
    terms = sorted({t for _q, t in _BM25_QUERY_ROWS})

    # per-term tf (gid=0, non-null word)
    got_tf = {
        (r["doc_id"], r["word"]): r["tf"]
        for r in tfm.where(
            (F.col("gid") == 0) & F.col("word").isNotNull()
        ).collect()
    }
    want_tf = {
        (r["doc_id"], r["word"]): r["n"]
        for r in toks.where(F.col("word").isin(terms))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got_tf == want_tf and got_tf

    # per-doc dl (gid=1)
    got_dl = {
        r["doc_id"]: r["tf"] for r in tfm.where(F.col("gid") == 1).collect()
    }
    want_dl = {
        r["doc_id"]: r["n"]
        for r in toks.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert got_dl == want_dl

    # corpus totals (gid=3) and n_docs
    n_toks = tfm.where(F.col("gid") == 3).collect()[0]["tf"]
    assert n_toks == toks.count()
    assert tfm.where(F.col("gid") == 1).count() == docs.count()


# ---------------------------------------------------------------------------
# mm_decode_png: the stdlib-zlib PNG decoder (round 13, VERDICT r12 task 2)
# ---------------------------------------------------------------------------

def _encode_png_reference(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Independent PNG encoder for decoder tests — spec recurrences written
    longhand per byte (the op's builder uses numpy slicing, `_parse_png`
    uses cumulative reconstruction; this is a THIRD implementation so a
    bug shared by any two still trips the other)."""
    import struct
    import zlib

    h, stride = pixels.shape
    bpp = 3
    filtered = bytearray()
    for r, f in zip(range(h), filters):
        line = pixels[r]
        prev = pixels[r - 1] if r > 0 else np.zeros(stride, dtype=np.uint8)
        filtered.append(f)
        for i in range(stride):
            x = int(line[i])
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - a
            elif f == 2:
                v = x - b
            elif f == 3:
                v = x - (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = x - pred
            filtered.append(v % 256)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", stride // 3, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "filters",
    [
        [0, 1, 2, 3, 4, 3, 4],  # every filter type, incl. Average/Paeth
        [4, 4, 4, 4, 4, 4, 4],  # all-Paeth (row 0 exercises the b=c=0 edge)
        [3, 3, 3, 3, 3, 3, 3],  # all-Average (row 0 exercises the b=0 edge)
    ],
)
def test_parse_png_recovers_pixels_for_all_filter_types(seed, filters):
    """`_parse_png` must invert every spec filter (0-4), not just the 0-2
    the graded builder emits — random pixels, third-implementation
    encoder."""
    from filemap_spark.operators.multimodal import _parse_png

    rng = np.random.default_rng(seed)
    w, h = 11, 7
    pixels = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8)
    png = _encode_png_reference(pixels, filters)
    rw, rh, depth, ctype, raw = _parse_png(png)
    assert (rw, rh, depth, ctype) == (w, h, 8, 2)
    assert raw == pixels.tobytes()


def test_parse_png_rejects_corrupt_crc_and_bad_signature():
    from filemap_spark.operators.multimodal import _parse_png

    pixels = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 15)
    png = bytearray(_encode_png_reference(pixels, [0, 1, 2, 0]))
    with pytest.raises(ValueError, match="signature"):
        _parse_png(b"\x00" + bytes(png[1:]))
    png[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(png))


def test_parse_png_rejects_oversized_chunk_length_with_valueerror():
    """ADVICE r13: a chunk whose declared length runs past the buffer must
    raise the module's ValueError contract, not a struct.error from short
    body/CRC slices."""
    import struct

    from filemap_spark.operators.multimodal import _parse_png

    pixels = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 15)
    png = bytearray(_encode_png_reference(pixels, [0, 1, 2, 0]))
    # inflate IHDR's declared length far past EOF (CRC is checked AFTER
    # the bounds check, so this must fail on the length, loudly)
    struct.pack_into(">I", png, 8, 1 << 20)
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        _parse_png(bytes(png))
    # a truncated buffer mid-chunk fails the same way
    with pytest.raises(ValueError, match="PNG"):
        _parse_png(bytes(png[:30]))


def test_mm_decode_png_builder_exercises_filters_0_1_2(spark, sf_dir):
    """End-to-end: the graded op's PNGs round-trip through `_parse_png`,
    their filtered streams really cycle filter types 0/1/2 by row, and
    the recovered pixels equal the construction rule the oracle uses."""
    import zlib

    from filemap_spark.operators.multimodal import _parse_png, mm_decode_png

    out = mm_decode_png(spark, sf_dir).limit(5).toPandas()
    assert (out["bit_depth"] == 8).all() and (out["color_type"] == 2).all()

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(5)
        .toPandas()
    )
    for _, row in docs.iterrows():
        eb = row["text"].encode("ascii")
        n = len(eb)
        w, h = n % 12 + 4, (n // 5) % 10 + 4
        need = w * h * 3
        expected = (eb * -(-need // n))[:need]
        # rebuild the op's PNG via its own builder path: run the op's
        # construction rule through the reference encoder w/ 0/1/2 cycle
        pixels = np.frombuffer(expected, dtype=np.uint8).reshape(h, w * 3)
        png = _encode_png_reference(pixels, [r % 3 for r in range(h)])
        rw, rh, _d, _c, raw = _parse_png(png)
        assert (rw, rh) == (w, h)
        assert raw == expected
        # and the filter-byte 0/1/2 cycle is really present in the stream:
        # walk to the IDAT body, decompress, read each row's leading byte
        import struct

        pos, idat = 8, b""
        while pos + 12 <= len(png):
            (ln,) = struct.unpack(">I", png[pos : pos + 4])
            if png[pos + 4 : pos + 8] == b"IDAT":
                idat += png[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        stream = zlib.decompress(idat)
        stride = w * 3
        assert [stream[r * (stride + 1)] for r in range(h)] == [
            r % 3 for r in range(h)
        ]
    assert len(out) == 5


# ---------------------------------------------------------------------------
# mm_decode_jpeg: the numpy-only baseline JPEG codec (round 13)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("dims", [(16, 16), (24, 32), (16, 40)])
def test_jpeg_entropy_layer_roundtrips_bit_exact(seed, dims):
    """The Huffman/zigzag/DPCM/stuffing layer is LOSSLESS: the decoder
    must recover the encoder's quantized coefficient blocks bit-exactly
    on random (worst-case entropy) images of several geometries."""
    from filemap_spark.functions.jpeg import decode_gray, encode_gray

    rng = np.random.default_rng(seed)
    h, w = dims
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    data, enc_coefs = encode_gray(img, quality=90)
    rw, rh, _pix, dec_coefs = decode_gray(data)
    assert (rw, rh) == (w, h)
    assert (enc_coefs == dec_coefs).all()


def test_jpeg_reconstruction_error_is_quant_bounded():
    """The lossy layer: q90 reconstruction error stays under a fixed
    ceiling on both a smooth image (realistic) and pure noise (the
    adversarial high-frequency case)."""
    from filemap_spark.functions.jpeg import decode_gray, encode_gray

    x, y = np.arange(32), np.arange(24)
    smooth = ((np.outer(np.sin(y / 5), np.cos(x / 7)) + 1) * 120).astype(
        np.uint8
    )
    noise = np.random.default_rng(7).integers(0, 256, (24, 32), dtype=np.uint8)
    for img, ceil in ((smooth, 8), (noise, 32)):
        data, _ = encode_gray(img, quality=90)
        _w, _h, pix, _c = decode_gray(data)
        err = np.abs(pix.astype(int) - img.astype(int))
        assert err.max() <= ceil, err.max()


def test_jpeg_byte_stuffing_is_exercised_and_inverted():
    """A nontrivial scan contains 0xFF bytes, which the encoder must
    stuff (0xFF 0x00) and the decoder unstuff — find a seed whose scan
    section really contains a stuffed pair so the test can't pass
    vacuously, then round-trip it."""
    from filemap_spark.functions.jpeg import decode_gray, encode_gray

    for seed in range(50):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        data, enc_coefs = encode_gray(img, quality=90)
        scan = data[data.index(b"\xFF\xDA") + 2 :][:-2]
        if b"\xFF\x00" in scan:
            _w, _h, _p, dec_coefs = decode_gray(data)
            assert (enc_coefs == dec_coefs).all()
            return
    raise AssertionError("no seed produced a stuffed byte — test is vacuous")


def test_jpeg_decoder_reads_tables_from_the_stream():
    """Header-driven decode: different quality -> different DQT in the
    stream; the decoder must still recover coefficients bit-exactly
    (it would mismatch if it assumed a fixed table instead of parsing
    the stream's own DQT segment)."""
    from filemap_spark.functions.jpeg import decode_gray, encode_gray

    img = np.random.default_rng(11).integers(0, 256, (16, 24), dtype=np.uint8)
    for quality in (50, 75, 95):
        data, enc_coefs = encode_gray(img, quality=quality)
        _w, _h, _p, dec_coefs = decode_gray(data)
        assert (enc_coefs == dec_coefs).all(), quality


def test_jpeg_decoder_rejects_malformed_streams():
    from filemap_spark.functions.jpeg import decode_gray, encode_gray

    img = np.zeros((16, 16), dtype=np.uint8)
    data, _ = encode_gray(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_gray(b"\x00\x00" + data[2:])
    # truncate before the scan: required segments missing
    with pytest.raises(ValueError):
        decode_gray(data[:20])


def test_mm_decode_jpeg_op_pins(spark, sf_dir):
    """Graded-op contract: every asset's entropy layer round-trips
    bit-exactly and the reconstruction error respects the q90 ceiling."""
    from filemap_spark.operators.multimodal import mm_decode_jpeg

    out = mm_decode_jpeg(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert out["entropy_roundtrip"].all()
    assert (out["max_abs_err"] <= 32).all()
    assert (out["width"] % 8 == 0).all() and (out["height"] % 8 == 0).all()
    assert (
        out["n_blocks"] == (out["width"] // 8) * (out["height"] // 8)
    ).all()


def test_jpeg_decoder_crops_mcu_padded_dims():
    """Real-world baseline JPEGs carry TRUE dims in SOF while the entropy
    stream covers the 8-aligned MCU grid. Synthesize one: encode a 24x32
    padded image, patch SOF to declare 20x28, decode -> the cropped
    region of the padded decode, coefficient blocks still all recovered."""
    import struct

    from filemap_spark.functions.jpeg import decode_gray, encode_gray

    rng = np.random.default_rng(3)
    padded = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    data, enc_coefs = encode_gray(padded, quality=90)
    sof_at = data.index(b"\xFF\xC0")
    patched = (
        data[: sof_at + 5]
        + struct.pack(">HH", 20, 28)  # true dims inside the SOF body
        + data[sof_at + 9 :]
    )
    w, h, pix, dec_coefs = decode_gray(patched)
    assert (w, h) == (28, 20)
    assert pix.shape == (20, 28)
    assert (enc_coefs == dec_coefs).all()  # full MCU grid still decoded
    # and the pixels equal the unpatched decode's cropped region
    _w2, _h2, full, _c2 = decode_gray(data)
    assert (pix == full[:20, :28]).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_jpeg_fast_pair_is_bitwise_identical_to_reference(seed):
    """Round 14 (VERDICT r13 task 2): the production fast codec pair must
    match the per-bit reference pair EXACTLY — encoder bytes + coefficient
    blocks byte-identical, decoder pixels + coefficients identical — on
    random worst-case-entropy images across geometries, plus cross-pair
    round-trips (fast encode -> reference decode and vice versa), so the
    two independently-built entropy layers pin each other."""
    from filemap_spark.functions.jpeg import (
        decode_gray,
        decode_gray_fast,
        encode_gray,
        encode_gray_fast,
    )

    rng = np.random.default_rng(seed)
    for h, w in [(8, 8), (16, 16), (24, 32), (16, 40), (32, 24)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        ref_data, ref_coefs = encode_gray(img, quality=90)
        fast_data, fast_coefs = encode_gray_fast(img, quality=90)
        assert ref_data == fast_data
        assert (ref_coefs == fast_coefs).all()
        rw, rh, rpix, rdec = decode_gray(ref_data)
        fw, fh, fpix, fdec = decode_gray_fast(fast_data)
        assert (rw, rh) == (fw, fh) == (w, h)
        assert (rpix == fpix).all()
        assert (rdec == fdec).all()
        # cross-pair: each encoder's stream entropy-round-trips through
        # the OTHER side's decoder
        assert (decode_gray(fast_data)[3] == ref_coefs).all()
        assert (decode_gray_fast(ref_data)[3] == ref_coefs).all()


def test_jpeg_fast_decoder_matches_reference_failure_modes():
    """The fast decoder keeps the reference's loud failures: truncated
    entropy stream, invalid stream prefix, and the STATED restart-interval
    limitation (ADVICE r13) — a DRI segment is rejected by BOTH decoders
    at parse time, never decoded silently wrong."""
    from filemap_spark.functions.jpeg import (
        decode_gray,
        decode_gray_fast,
        encode_gray,
    )

    img = np.random.default_rng(9).integers(0, 256, (16, 16), dtype=np.uint8)
    data, _ = encode_gray(img, quality=90)
    with pytest.raises(ValueError, match="SOI"):
        decode_gray_fast(b"\x00\x00" + data[2:])
    sos_at = data.index(b"\xFF\xDA")
    with pytest.raises(ValueError, match="truncated"):
        decode_gray_fast(data[: sos_at + 40])
    # inject a DRI segment (restart interval 4) before SOS
    dri = data[:sos_at] + b"\xFF\xDD\x00\x04\x00\x04" + data[sos_at:]
    with pytest.raises(ValueError, match="restart intervals"):
        decode_gray_fast(dri)
    with pytest.raises(ValueError, match="restart intervals"):
        decode_gray(dri)


def test_jpeg_fast_decoder_reads_tables_from_the_stream():
    """The fast decoder's window LUTs are built from the stream's OWN
    DHT segments (cached per spec), and quality changes flow through the
    stream's DQT — decode at several qualities must round-trip."""
    from filemap_spark.functions.jpeg import encode_gray_fast, decode_gray_fast

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    for quality in (50, 75, 90, 95):
        data, enc_coefs = encode_gray_fast(img, quality=quality)
        _w, _h, _p, dec_coefs = decode_gray_fast(data)
        assert (enc_coefs == dec_coefs).all()


def test_jpeg_quality_range_and_truncation_are_loud():
    from filemap_spark.functions.jpeg import decode_gray, encode_gray, scale_qt

    with pytest.raises(ValueError, match="quality"):
        scale_qt(np.ones((8, 8), dtype=np.int32), 0)
    img = np.random.default_rng(5).integers(0, 256, (16, 16), dtype=np.uint8)
    data, _ = encode_gray(img, quality=90)
    # chop the tail of the entropy stream (keep headers): decode must
    # raise the truncation error, not return garbage coefficients
    sos_at = data.index(b"\xFF\xDA")
    cut = data[: sos_at + 40]
    with pytest.raises(ValueError):
        decode_gray(cut)


def test_code_fingerprint_frozenset_consts_are_canonicalized():
    """Set-literal membership tests compile to frozenset consts whose
    iteration order depends on PYTHONHASHSEED — the fallback fingerprint
    must canonicalize them (sorted element reprs) or a zip/frozen install
    re-keys the warehouse every process. Pin the canonical token directly
    and via the public fingerprint."""
    from filemap_spark.plans.memo import _const_token, _fn_fingerprint

    tok = _const_token(frozenset({"b", "a", "c"}))
    assert tok == "frozenset{'a','b','c'}"
    assert _const_token((1, frozenset({2, 3}))) == "(1,frozenset{2,3})"

    def compile_fn(body: str):
        ns: dict = {}
        exec(body, ns)
        return ns["op"]

    src = "def op(x):\n    return x in {'alpha', 'beta', 'gamma'}\n"
    a = _fn_fingerprint(compile_fn(src))
    b = _fn_fingerprint(compile_fn(src))
    assert a == b


def test_mm_dhash_near_dup_matches_bruteforce(spark, sf_dir):
    """The image near-dup op's FULL pair set (cross-group block-join
    candidates + intra-group identical-hash pairs) must equal an
    independent no-Spark reimplementation: construction rule ->
    reduceat-based block-mean dHash (different grid mechanism than the
    op's) -> brute-force all-pairs hamming <= 15. Perfect recall is the
    block-pigeonhole guarantee; perfect precision is the exact verify."""
    import itertools

    from filemap_spark.operators.multimodal import mm_dhash_near_dup

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    def _chunk_offsets(length: int, n: int) -> np.ndarray:
        """array_split's partition rule written from its spec — the first
        (length % n) chunks get one extra element — NOT via array_split,
        so a misunderstanding of the grid partitioning in the op's
        kernel can't cancel here."""
        sizes = np.full(n, length // n)
        sizes[: length % n] += 1
        return np.concatenate(([0], np.cumsum(sizes)))

    hashes = {}
    for _, row in docs.iterrows():
        eb = row["text"].encode("ascii")
        n = len(eb)
        w, h = n % 12 + 9, (n // 5) % 10 + 8
        need = w * h * 3
        pix = (eb * -(-need // n))[:need]
        gray_sum = (
            np.frombuffer(pix, dtype=np.uint8)
            .reshape(h, w, 3)
            .astype(np.int64)
            .sum(axis=2)
        )
        # block sums via reduceat over explicitly-derived offsets — a
        # different grid mechanism than the op's nested array_split
        # loops; comparisons are the same exact cross-multiplied
        # integers, so agreement is arithmetic, not luck
        ro, co = _chunk_offsets(h, 8), _chunk_offsets(w, 9)
        colsum = np.add.reduceat(gray_sum, ro[:-1], axis=0)
        cellsum = np.add.reduceat(colsum, co[:-1], axis=1).astype(object)
        area = np.outer(np.diff(ro), np.diff(co)).astype(object)
        v = 0
        for r in range(8):
            for c in range(8):
                if (
                    cellsum[r][c + 1] * area[r][c]
                    > cellsum[r][c] * area[r][c + 1]
                ):
                    v |= 1 << (r * 8 + c)
        hashes[int(row["doc_id"])] = v
    expected = set()
    for ia, ib in itertools.combinations(sorted(hashes), 2):
        d = bin(hashes[ia] ^ hashes[ib]).count("1")
        if d <= 15:
            expected.add((ia, ib, d))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in mm_dhash_near_dup(spark, sf_dir).collect()
    }
    assert len(expected) > 0, "fixture produced no near-dup pairs — vacuous"
    assert got == expected


def test_pigeonhole_candidate_volume_counter_and_budget_warning(spark):
    """Round 14 (VERDICT r13 task 5): the scale knob's counter. The
    measured pre-`distinct` candidate volume must equal the bucket-exact
    sum of m·(m-1)/2, and `fingerprint_near_dup_pairs` must emit the
    RuntimeWarning when the volume blows the per-item budget (the
    corpus-knob-at-web-scale misuse signal)."""
    import warnings as _warnings

    from filemap_spark.functions.blocked import (
        CANDIDATE_BUDGET_PER_ITEM,
        CORPUS_MATCHED_KNOB,
        fingerprint_near_dup_pairs,
        pigeonhole_candidate_volume,
    )

    # 40 distinct sigs that share block 0 in two groups of 20 (low nibble
    # 0x5 / 0xA), all other blocks spread: per-bucket counts known exactly
    sigs = [(i << 8) | (0x5 if i < 20 else 0xA) for i in range(40)]
    frame = spark.createDataFrame([(s,) for s in sigs], "sig long")
    n_distinct, cand = pigeonhole_candidate_volume(
        frame, "sig", n_blocks=16, block_bits=4
    )
    assert n_distinct == 40
    # brute-force the same bucket arithmetic independently
    from collections import Counter

    buckets = Counter()
    for s in sigs:
        for b in range(16):
            buckets[(b, (s >> (4 * b)) & 0xF)] += 1
    expected = sum(m * (m - 1) // 2 for m in buckets.values())
    assert cand == expected > 0

    # budget warning: identical-block corpus (every sig shares every
    # block value) => candidates ~ n²/2 · n_blocks buckets >> budget·n
    n = 2 * CANDIDATE_BUDGET_PER_ITEM + 8
    hot = spark.createDataFrame(
        [(i, 0) for i in range(n)], "doc_id long, fp long"
    )
    nb, bb, t = CORPUS_MATCHED_KNOB
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        fingerprint_near_dup_pairs(
            hot, id_col="doc_id", hash_col="fp",
            n_blocks=nb, block_bits=bb, threshold=t,
        )
        # all-identical fingerprints collapse to ONE rep -> no warning
        assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]
    # distinct-but-colliding sigs (same low block, unique elsewhere)
    # actually blow the budget through the rep-collapse
    crowded = spark.createDataFrame(
        [(i, i << 8) for i in range(n)], "doc_id long, fp long"
    )
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        fingerprint_near_dup_pairs(
            crowded, id_col="doc_id", hash_col="fp",
            n_blocks=nb, block_bits=bb, threshold=t,
        )
        hits = [w for w in caught if issubclass(w.category, RuntimeWarning)]
        assert hits and "WEB_SCALE_KNOB" in str(hits[0].message)


def test_mm_dhash_near_dup_identical_image_clusters(spark, tmp_path):
    """The intra-group path (absent from the all-distinct fixture): a
    corpus with identical-text clusters must emit every within-cluster
    pair at hamming 0 exactly once, plus cross-cluster near pairs, with
    doc_a < doc_b throughout."""
    from filemap_spark.operators.multimodal import mm_dhash_near_dup

    base = "the quick brown fox jumps over the lazy dog " * 3
    # every 4th char flipped: measured dHash hamming 5 vs base — a real
    # cross-group near pair (same length, so same image dims)
    variant = "".join(("Z" if i % 4 == 0 else c) for i, c in enumerate(base))
    far = "zyxw " * 27  # structurally different
    rows = [
        (1, base), (2, base), (3, base),        # 3-member identical cluster
        (4, variant),                           # near neighbor of 1-3
        (5, far), (6, far),                     # 2-member identical cluster
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        "doc_id long, text string, n_chars int",
    ).write.parquet(f"{sf}/documents.parquet")

    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in mm_dhash_near_dup(spark, sf).collect()
    }
    intra = {(1, 2, 0), (1, 3, 0), (2, 3, 0), (5, 6, 0)}
    assert intra <= got
    # every remaining pair involves doc 4 against the base cluster (the
    # perturbation stays within threshold) — never the far cluster
    extra = got - intra
    assert extra, "variant produced no near pair — perturbation too large"
    for a, b, d in extra:
        assert {a, b} <= {1, 2, 3, 4} and 4 in (a, b)
        assert 0 < d <= 15, "variant must be a distinct-hash NEAR pair"
    # the variant pairs with EVERY member of the identical cluster at the
    # same distance (identical images share one hash)
    assert {(a, b) for a, b, _ in extra} == {(1, 4), (2, 4), (3, 4)}


def _apply_merges_ref(word: str, merges: list) -> list:
    """INDEPENDENT BPE segmentation for the reference trainer — a
    sentinel-string replace mechanism, not the op's index-walking loop,
    so a greediness/ordering bug in the op's _bpe_apply cannot cancel
    symmetrically. Tokens never contain \x00 (words are whitespace
    splits), so \x00-anchored replace matches whole tokens only and
    str.replace's resume-after-replacement scan is exactly BPE's greedy
    left-to-right non-overlapping fuse."""
    s = "\x00" + "\x00\x00".join(word) + "\x00"
    for left, right in merges:
        s = s.replace(
            "\x00" + left + "\x00\x00" + right + "\x00",
            "\x00" + left + right + "\x00",
        )
    return [tok for tok in s.split("\x00") if tok]


def test_bpe_train_matches_pure_python_reference(spark, sf_dir):
    """text_bpe_train's full merge sequence (order, symbols, counts) must
    equal an independent single-process BPE trainer: pair counting,
    argmax, tie-break, AND segmentation are all reimplemented here (the
    segmentation via a different mechanism — see _apply_merges_ref).
    Word types come through the op's stated JVM tokenization contract
    (lower + Java \\s+), so the pin exercises the recursion, not
    engine tokenizer differences."""
    import collections

    from pyspark.sql import functions as SF

    from filemap_spark.operators.text import _BPE_MERGES, text_bpe_train

    counts = {
        r["w"]: r["c"]
        for r in (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(
                SF.explode(
                    SF.split(SF.lower("text"), r"\s+")
                ).alias("w")
            )
            .where(SF.length("w") > 0)
            .groupBy("w")
            .count()
            .withColumnRenamed("count", "c")
            .collect()
        )
    }

    merges: list = []
    expected = []
    for _ in range(_BPE_MERGES):
        pair_counts: collections.Counter = collections.Counter()
        for w, c in counts.items():
            syms = _apply_merges_ref(w, merges)
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        # max count, ties lexicographic on (left, right)
        (left, right), n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < 2:
            break
        merges.append((left, right))
        expected.append((len(merges) - 1, left, right, n))

    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in text_bpe_train(spark, sf_dir).collect()
    ]
    assert len(got) == _BPE_MERGES, "corpus should sustain all merges"
    assert got == expected


def test_bpe_apply_fuses_in_rank_order():
    """The op's apply step AND the test's independent mechanism must
    both satisfy the BPE spec cases: later merges consume earlier merge
    outputs, greedy left-to-right non-overlap, non-adjacent untouched —
    and agree with each other on random words."""
    from filemap_spark.operators.text import _bpe_apply

    merges = [("a", "b"), ("ab", "c")]
    for apply_fn in (lambda w, m: _bpe_apply(list(w), m), _apply_merges_ref):
        assert apply_fn("abcab", merges) == ["abc", "ab"]
        assert apply_fn("acb", merges) == ["a", "c", "b"]
        assert apply_fn("ababab", [("a", "b")]) == ["ab", "ab", "ab"]
        assert apply_fn("aaa", [("a", "a")]) == ["aa", "a"]
    rng = np.random.default_rng(0)
    for _ in range(200):
        w = "".join(rng.choice(list("abcd"), size=rng.integers(1, 12)))
        m = [("a", "b"), ("c", "d"), ("ab", "cd"), ("b", "c")]
        assert _bpe_apply(list(w), m) == _apply_merges_ref(w, m), w


def test_bpe_apply_op_matches_independent_tokenizer(spark, sf_dir):
    """text_bpe_apply (round 14): every doc's BPE token count and stream
    hash must equal an independent single-process tokenize — merges from
    the (already reference-pinned) trainer, segmentation via the
    sentinel-replace mechanism (_apply_merges_ref), stream assembly in
    plain Python. Word sequences come through the op's stated JVM
    tokenization contract (lower + Java \\s+ posexplode) so the pin
    exercises the apply recursion and the ordered reassembly, not
    engine tokenizer differences."""
    import hashlib as _hashlib

    from pyspark.sql import functions as SF

    from filemap_spark.operators.text import text_bpe_apply, text_bpe_train

    merges = [
        (r["left"], r["right"])
        for r in text_bpe_train(spark, sf_dir).collect()
    ]
    assert merges, "trainer produced no merges — vacuous"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wordseq: dict[int, list[tuple[int, str]]] = {}
    for r in (
        docs.select(
            "doc_id",
            SF.posexplode(SF.split(SF.lower("text"), r"\s+")).alias(
                "pos", "w"
            ),
        )
        .where(SF.length("w") > 0)
        .collect()
    ):
        wordseq.setdefault(r["doc_id"], []).append((r["pos"], r["w"]))

    expected = {}
    for did in [r["doc_id"] for r in docs.select("doc_id").collect()]:
        toks: list[str] = []
        for _pos, w in sorted(wordseq.get(did, [])):
            toks.extend(_apply_merges_ref(w, merges))
        expected[did] = (
            len(toks),
            _hashlib.md5(" ".join(toks).encode()).hexdigest(),
        )

    got = {
        r["doc_id"]: (r["n_tokens_bpe"], r["token_md5"])
        for r in text_bpe_apply(spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(n for n, _ in got.values()) > 0


def test_mm_audio_fingerprint_dedup_matches_bruteforce(spark, sf_dir):
    """The audio near-dup op's pair set must equal an independent
    reimplementation: samples straight from the text formula (no wave
    module), frame energies via reduceat over explicitly-derived
    offsets, the same exact cross-multiplied comparisons, brute-force
    all-pairs hamming <= 15."""
    import itertools

    from filemap_spark.operators.multimodal import mm_audio_fingerprint_dedup

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )

    def _offsets(length: int, n: int) -> np.ndarray:
        sizes = np.full(n, length // n)
        sizes[: length % n] += 1
        return np.concatenate(([0], np.cumsum(sizes)))

    hashes = {}
    for _, row in docs.iterrows():
        b = np.frombuffer(
            row["text"].encode("ascii"), dtype=np.uint8
        ).astype(np.int64)
        samples = (b - 100) * 256  # the mm_decode_wav PCM formula
        off = _offsets(len(samples), 65)
        sq = samples * samples
        # explicit slice sums over the independently-derived offsets
        # (reduceat rejects end-of-array offsets for empty tail frames)
        e = [int(sq[off[i] : off[i + 1]].sum()) for i in range(65)]
        ln = np.diff(off)
        v = 0
        for i in range(64):
            if e[i + 1] * int(ln[i]) > e[i] * int(ln[i + 1]):
                v |= 1 << i
        hashes[int(row["doc_id"])] = v

    expected = set()
    for ia, ib in itertools.combinations(sorted(hashes), 2):
        d = bin(hashes[ia] ^ hashes[ib]).count("1")
        if d <= 15:
            expected.add((ia, ib, d))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in mm_audio_fingerprint_dedup(spark, sf_dir).collect()
    }
    assert len(expected) > 0, "fixture produced no near-dup pairs — vacuous"
    assert got == expected


def test_energy_hash_identical_and_padded_clips():
    """Fingerprint semantics: identical PCM -> identical hash; a clip
    with tiny trailing padding keeps a NEAR hash (the robustness byte
    hashing lacks); sub-65-sample clips hash deterministically."""
    from filemap_spark.operators.multimodal import _energy_hash64

    # a STRUCTURED clip (slow amplitude modulation — what real audio has;
    # white noise has no contour, so boundary shifts flip coin-flip
    # bits) built from INTEGER arithmetic: a float np.sin fixture put a
    # sample one ulp from a truncation boundary, so a different libm
    # could shift the measured hamming (the repo's exact-integer
    # discipline applies to test fixtures too)
    ts = np.arange(650, dtype=np.int64)
    amp = 400 + np.abs((ts * 7) % 1300 - 650)  # integer triangle wave
    clip = (amp * np.where(ts % 2 == 0, 1, -1)).astype(np.int64)
    h1 = _energy_hash64(clip)
    assert h1 == _energy_hash64(clip.copy())
    padded = np.concatenate([clip, np.zeros(6, dtype=np.int64)])
    d = bin((h1 ^ _energy_hash64(padded)) & ((1 << 64) - 1)).count("1")
    assert 0 < d <= 15, f"padding robustness window missed ({d} bits)"
    assert _energy_hash64(np.array([5, -5, 7], dtype=np.int64)) == \
        _energy_hash64(np.array([5, -5, 7], dtype=np.int64))


def test_incremental_mm_dedup_matches_batch_delta_and_is_idempotent(
    spark, sf_dir, tmp_path
):
    """Round 14: each incremental multimodal op's delta equals its batch
    sibling's (independently brute-force-pinned) pair set restricted to
    pairs touching the arriving split; re-ingesting already-seen docs is
    a no-op (the make ledger's anti-join), and the no-op path returns an
    EMPTY frame without decoding anything."""
    from filemap_spark.functions.blocked import (
        CORPUS_MATCHED_KNOB,
        incremental_fingerprint_ingest,
    )
    from filemap_spark.io import load_table
    from filemap_spark.operators.multimodal import (
        _audio_fhash_frame,
        _image_dhash_frame,
        mm_audio_fingerprint_dedup,
        mm_dhash_near_dup,
        mm_incremental_audio_dedup,
        mm_incremental_dhash_dedup,
    )

    for inc_op, batch_op in (
        (mm_incremental_dhash_dedup, mm_dhash_near_dup),
        (mm_incremental_audio_dedup, mm_audio_fingerprint_dedup),
    ):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in inc_op(spark, sf_dir).collect()
        }
        expected = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in batch_op(spark, sf_dir).collect()
            if r["doc_a"] % 10 == 0 or r["doc_b"] % 10 == 0
        }
        assert got == expected
        assert expected, f"{inc_op.__name__}: vacuous fixture"

    # idempotence on the raw ingest: same docs twice -> empty delta
    nb, bb, t = CORPUS_MATCHED_KNOB
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = str(tmp_path / "idem_state")
    first = incremental_fingerprint_ingest(
        spark, docs, _image_dhash_frame, state,
        n_blocks=nb, block_bits=bb, threshold=t,
    )
    assert first.count() > 0
    decoded = {"n": 0}
    real_fn = _image_dhash_frame

    def counting_fn(d):
        frame = real_fn(d)
        decoded["n"] = frame.count()  # how many docs reach the hash stage
        return frame

    again = incremental_fingerprint_ingest(
        spark, docs, counting_fn, state,
        n_blocks=nb, block_bits=bb, threshold=t,
    )
    assert again.count() == 0
    assert decoded["n"] == 0, "re-ingest decoded already-seen docs"


def test_bpe_pack_sequences_matches_python_reference(spark, sf_dir):
    """text_bpe_pack_sequences (round 14): every training window's token
    count, distinct-doc span, and content hash must equal an end-to-end
    plain-Python pack — merges from the reference-pinned trainer,
    per-word segmentation via the independent sentinel-replace mechanism
    (_apply_merges_ref), doc-order concatenation with the EOS separator,
    and fixed-length chunking all reimplemented here. Exercises the
    distributed global-offset cumsum (functions/ranks.py) against a
    single-process ground truth."""
    import hashlib as _hashlib

    from pyspark.sql import functions as SF

    from filemap_spark.operators.text import (
        _PACK_EOS,
        _PACK_SEQ_LEN,
        text_bpe_pack_sequences,
        text_bpe_train,
    )

    merges = [
        (r["left"], r["right"])
        for r in text_bpe_train(spark, sf_dir).collect()
    ]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wordseq: dict[int, list[tuple[int, str]]] = {}
    for r in (
        docs.select(
            "doc_id",
            SF.posexplode(SF.split(SF.lower("text"), r"\s+")).alias("pos", "w"),
        )
        .where(SF.length("w") > 0)
        .collect()
    ):
        wordseq.setdefault(r["doc_id"], []).append((r["pos"], r["w"]))

    stream: list[tuple[int, str]] = []  # (doc_id, token) in pack order
    for did in sorted(r["doc_id"] for r in docs.select("doc_id").collect()):
        for _pos, w in sorted(wordseq.get(did, [])):
            stream.extend((did, t) for t in _apply_merges_ref(w, merges))
        stream.append((did, _PACK_EOS))

    expected = {}
    for lo in range(0, len(stream), _PACK_SEQ_LEN):
        window = stream[lo : lo + _PACK_SEQ_LEN]
        toks = [t for _, t in window]
        expected[lo // _PACK_SEQ_LEN] = (
            len(window),
            len({d for d, _ in window}),
            _hashlib.md5(" ".join(toks).encode()).hexdigest(),
        )

    got = {
        r["seq_id"]: (r["n_tokens"], r["n_docs"], r["window_md5"])
        for r in text_bpe_pack_sequences(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) > 1  # corpus spans multiple windows — non-vacuous


# --- Content-defined chunking (dedup_cdc_chunks, round 15) ----------------


def _cdc_ref_chunks(raw: bytes) -> list[bytes]:
    """Independent byte-serial CDC reference: the Gear recurrence
    h = 2h + gear[b] mod 2^64 walked one byte at a time with a naive
    linear boundary scan — a genuinely different mechanism from the
    op's 64-shift windowed vectorization + searchsorted candidate walk.
    They agree only if the window identity (2^k dies past 64 shifts)
    AND the MIN/MAX walk semantics are both right."""
    import hashlib

    from filemap_spark.operators.text import _CDC_MASK, _CDC_MAX, _CDC_MIN

    gear = [
        int(hashlib.md5(bytes([b])).hexdigest()[:16], 16) for b in range(256)
    ]
    n = len(raw)
    h, hs = 0, []
    for b in raw:
        h = ((h << 1) + gear[b]) & 0xFFFFFFFFFFFFFFFF
        hs.append(h)
    chunks, start = [], 0
    while start < n:
        lo, hi = start + _CDC_MIN - 1, min(start + _CDC_MAX - 1, n - 1)
        end = None
        for t in range(lo, hi + 1):
            if t < n and (hs[t] & _CDC_MASK) == 0:
                end = t
                break
        if end is None:
            end = hi
        chunks.append(raw[start : end + 1])
        start = end + 1
    return chunks


def test_cdc_windowed_hash_equals_byte_serial_recurrence():
    """The op's vectorized rolling hash (64 shifted adds over the whole
    byte array) must equal the textbook byte-serial Gear recurrence on
    arbitrary bytes — including runs shorter than the 64-byte window."""
    import numpy as np

    from filemap_spark.operators.text import _cdc_boundaries, _gear_table

    gear_np = _gear_table()
    gear_py = [int(x) for x in gear_np]
    rng = np.random.default_rng(20260816)
    for n in (1, 7, 63, 64, 65, 300, 2048):
        b = rng.integers(0, 256, size=n, dtype=np.uint8)
        g = gear_np[b]
        h = np.zeros(n, dtype=np.uint64)
        for k in range(64):
            if k >= n:
                break
            h[k:] += g[: n - k] << np.uint64(k)
        ref, acc = [], 0
        for x in b:
            acc = ((acc << 1) + gear_py[int(x)]) & 0xFFFFFFFFFFFFFFFF
            ref.append(acc)
        assert [int(v) for v in h] == ref, f"hash mismatch at n={n}"
        # and the candidate walk splits identically to the naive scan
        got = _cdc_boundaries(h, n)
        exp_ends = []
        start = 0
        raw = bytes(b.tolist())
        for piece in _cdc_ref_chunks(raw):
            exp_ends.append(start + len(piece) - 1)
            start += len(piece)
        assert got == exp_ends, f"boundary mismatch at n={n}"


def test_cdc_chunks_op_matches_pure_python_reference(spark, sf_dir):
    """dedup_cdc_chunks' per-doc dedup-savings report must equal an
    end-to-end pure-Python pipeline: reference-chunk every document,
    md5 each chunk, count distinct-doc popularity in a dict, and
    aggregate the per-doc chunk/byte/dup counters."""
    import collections
    import hashlib

    from filemap_spark.operators.text import dedup_cdc_chunks

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    per_doc: dict[int, list[tuple[str, int]]] = {}
    owners: dict[str, set] = collections.defaultdict(set)
    for doc_id, text in docs.items():
        raw = text.encode("utf-8") if text else b""
        if not raw:
            continue
        entries = []
        for piece in _cdc_ref_chunks(raw):
            h = hashlib.md5(piece).hexdigest()
            entries.append((h, len(piece)))
            owners[h].add(doc_id)
        per_doc[doc_id] = entries
    expected = {}
    for doc_id, entries in per_doc.items():
        dup = [(h, ln) for h, ln in entries if len(owners[h]) > 1]
        expected[doc_id] = (
            len(entries),
            sum(ln for _, ln in entries),
            len(dup),
            sum(ln for _, ln in dup),
        )

    got = {
        r["doc_id"]: (
            r["n_chunks"],
            r["n_bytes"],
            r["n_dup_chunks"],
            r["dup_bytes"],
        )
        for r in dedup_cdc_chunks(spark, sf_dir).collect()
    }
    assert got == expected
    # the report is non-degenerate on the contract corpus: several
    # chunks per doc on average, and SOME cross-doc duplicate chunks
    # (the op exists to find them)
    assert sum(v[0] for v in got.values()) >= 2 * len(got)
    assert sum(v[2] for v in got.values()) > 0
