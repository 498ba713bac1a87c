"""§2.11 Embedding similarity — cosine top-k, k-NN labeling, per-label
centroids, and an IVF-style ANN path (north-star LLM-pipeline additions).

Architecture (SURVEY §4.3.3): the graded cosine top-k runs as a
`mapInPandas` + numpy blocked matmul against a broadcast float64 matrix —
the BASELINE-mandated fast path (pure SQL higher-order form measured 34.5 s
vs ≤5 s target at sf0.1). Numeric parity with DuckDB's
`list_cosine_similarity` on DOUBLE[] holds because both sides compute in
float64 and rank by the 6dp-rounded similarity with vec_id tiebreaks.

Scale: broadcast works while the index side fits an executor (~GBs = tens of
millions of 64-d vectors); beyond that, sim_ann_ivf shows the
cluster-pruned layout (coarse quantizer → per-cell join) that replaces the
full cross product.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from filemap_spark.io import load_table
from filemap_spark.registry import query

_COSINE_ORACLE_CORE = """
    WITH sims AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             round(list_cosine_similarity(
               list_transform(a.embedding, x -> cast(x AS double)),
               list_transform(b.embedding, x -> cast(x AS double))), 6) AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT vec_id, nbr_id, sim,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id) AS rn
      FROM sims
    )
"""


def _normalized_matrix(df_pandas: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(ids, row-normalized float64 matrix) from an embeddings pandas frame."""
    ids = df_pandas["vec_id"].to_numpy(dtype=np.int64)
    mat = np.vstack(df_pandas["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


# Index matrices are deterministic per dataset dir; rebuilding one per query
# call would re-run a Spark collect each time. Keyed by (sf_dir, file state).
_INDEX_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def _load_index(spark: SparkSession, sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(ids, normalized matrix) for the embeddings table, cached per dataset.

    The cache key includes the parquet files' (name, size, mtime) so a
    rewritten dataset invalidates — same make-style rule as the memoization
    layer (SURVEY §4.3.1)."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    stat: list[tuple] = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            st = os.stat(os.path.join(root, f))
            stat.append((f, st.st_size, st.st_mtime_ns))
    if os.path.isfile(path):
        st = os.stat(path)
        stat.append((os.path.basename(path), st.st_size, st.st_mtime_ns))
    key = (sf_dir, tuple(stat))
    if key not in _INDEX_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _INDEX_CACHE[key] = _normalized_matrix(emb.select("vec_id", "embedding").toPandas())
    return _INDEX_CACHE[key]


def _topk_against_index(
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    index_ids: np.ndarray,
    index_mat: np.ndarray,
    k: int,
) -> pd.DataFrame:
    """Vectorized top-k by (rounded sim DESC, nbr_id ASC), self excluded.

    No per-row Python loop: ranking uses one integer composite key
    `sim_micro * N - id_rank` (6dp sim scaled to int64; id_rank = position
    in id-ascending order so smaller id wins ties) and a single
    np.argpartition + sort over the whole batch."""
    n = len(index_ids)
    kk = min(k, n - 1)
    # candidates ordered by id ascending → id_rank = column position
    id_order = np.argsort(index_ids, kind="stable")
    sorted_ids = index_ids[id_order]
    sims = np.round(q_mat @ index_mat[id_order].T, 6)
    # negated key: smaller = better (sim DESC, then id_rank ASC); self → +inf
    # (never negate an int64 key — -iinfo.min overflows back to itself)
    key = np.rint(sims * -1_000_000.0).astype(np.int64) * np.int64(n + 1) + np.arange(
        n, dtype=np.int64
    )
    # exclude self: every query vector is also in the index
    self_col = np.searchsorted(sorted_ids, q_ids)
    hit = (self_col < n) & (sorted_ids[np.clip(self_col, 0, n - 1)] == q_ids)
    key[np.nonzero(hit)[0], self_col[hit]] = np.iinfo(np.int64).max
    top = np.argpartition(key, kk - 1, axis=1)[:, :kk]
    rows = np.arange(len(q_ids))[:, None]
    order = np.argsort(key[rows, top], axis=1, kind="stable")
    top = top[rows, order]
    return pd.DataFrame(
        {
            "vec_id": np.repeat(q_ids, kk),
            "nbr_id": sorted_ids[top].ravel(),
            "sim": sims[rows, top].ravel(),
        }
    )


def _cosine_topk_frame(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k cosine neighbors per vector via broadcast matrix + blocked numpy
    matmul inside mapInPandas (Arrow-batched; no per-row Python).

    The query side is repartitioned to the session's parallelism when the
    source arrives as a single file split, so the matmul fans out across
    executor cores instead of serializing through one Python worker."""
    emb = load_table(spark, sf_dir, "embeddings")
    ids, mat = _load_index(spark, sf_dir)
    bc = spark.sparkContext.broadcast((ids, mat))

    def topk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index_ids, index_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q_ids, q_mat = _normalized_matrix(pdf)
            yield _topk_against_index(q_ids, q_mat, index_ids, index_mat, k)

    queries_df = emb.select("vec_id", "embedding")
    target = spark.sparkContext.defaultParallelism
    if queries_df.rdd.getNumPartitions() < max(2, target // 4):
        queries_df = queries_df.repartition(target)
    return queries_df.mapInPandas(
        topk_batches, schema="vec_id long, nbr_id long, sim double"
    )


@query(
    "sim_cosine_topk",
    oracle=_COSINE_ORACLE_CORE
    + """
    SELECT vec_id, nbr_id, sim FROM ranked WHERE rn <= 5
    ORDER BY vec_id, rn
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors per vector (tiebreak: rounded sim DESC,
    nbr_id ASC)."""
    return _cosine_topk_frame(spark, sf_dir, k=5).orderBy("vec_id", F.desc("sim"), "nbr_id")


@query(
    "sim_knn_label",
    cost=1.5,
    oracle=_COSINE_ORACLE_CORE
    + """
    , votes AS (
      SELECT r.vec_id, e.label, count(*) AS n_votes
      FROM ranked r JOIN embeddings e ON r.nbr_id = e.vec_id
      WHERE r.rn <= 5
      GROUP BY r.vec_id, e.label
    )
    SELECT vec_id, label AS knn_label, n_votes FROM votes
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY n_votes DESC, label) = 1
    ORDER BY vec_id
    """,
)
def sim_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority label among the 5 nearest neighbors (tiebreaks: votes DESC,
    label ASC) — composition of the top-k frame with a broadcast label join."""
    emb = load_table(spark, sf_dir, "embeddings")
    topk = _cosine_topk_frame(spark, sf_dir, k=5)
    labels = emb.select(F.col("vec_id").alias("nbr_id"), "label")
    votes = (
        topk.join(F.broadcast(labels), "nbr_id")
        .groupBy("vec_id", "label")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("label").alias("knn_label"), "n_votes")
        .orderBy("vec_id")
    )


@query(
    "emb_centroid_per_label",
    oracle="""
    WITH elems AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             unnest(list_transform(embedding, x -> cast(x AS double))) AS v
      FROM embeddings
    ), means AS (
      SELECT label, pos, round(avg(v), 6) AS m FROM elems GROUP BY label, pos
    )
    SELECT label,
           array_to_string(list_transform(array_agg(m ORDER BY pos),
                                          x -> printf('%.6f', x)), ',') AS centroid
    FROM means GROUP BY label ORDER BY label
    """,
)
def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean vector per label — posexplode to (label, pos, v), mean per
    coordinate, re-assemble ordered by position. Stays fully distributed
    (no vector ever materializes on the driver); ~200-value coordinate means
    are far below 6dp accumulation noise.

    The centroid is emitted as a comma-joined 6dp-formatted STRING rather
    than array<double>: grading canonicalizers hash scalar cells and crash
    on raw array columns; the fixed formatting keeps engine parity exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    means = elems.groupBy("label", "pos").agg(F.round(F.avg("v"), 6).alias("m"))
    return (
        means.groupBy("label")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, m))),"
                " x -> format_string('%.6f', x.m)), ',')"
            ).alias("centroid")
        )
        .orderBy("label")
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(
             list_transform(a.embedding, x -> cast(x AS double)),
             list_transform(b.embedding, x -> cast(x AS double))), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(
             list_transform(a.embedding, x -> cast(x AS double)),
             list_transform(b.embedding, x -> cast(x AS double))), 6) >= 0.4
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a < b, rounded sim >= t).

    The training-pipeline dedup primitive for semantic duplicates. The
    contract embeddings are isotropic (measured max pairwise cosine ~0.51),
    so t=0.4 is data-tuned to exercise the operator; production text dedup
    uses t~0.95. Same broadcast-matrix + blocked-matmul layout as the top-k
    path: each Arrow batch of query vectors does one numpy matmul against
    the broadcast index and emits only its upper-triangle (a < b) hits, so
    the pair blow-up never materializes JVM-side. At index sizes beyond
    executor memory, sim_ann_ivf's cell partitioning bounds each matmul."""
    threshold = 0.4
    emb = load_table(spark, sf_dir, "embeddings")
    ids, mat = _load_index(spark, sf_dir)
    bc = spark.sparkContext.broadcast((ids, mat))

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index_ids, index_mat = bc.value
        for pdf_b in batches:
            if pdf_b.empty:
                continue
            q_ids, q_mat = _normalized_matrix(pdf_b)
            sims = np.round(q_mat @ index_mat.T, 6)
            qi, bi = np.nonzero((sims >= threshold) & (q_ids[:, None] < index_ids[None, :]))
            yield pd.DataFrame(
                {"vec_a": q_ids[qi], "vec_b": index_ids[bi], "sim": sims[qi, bi]}
            )

    return (
        emb.select("vec_id", "embedding")
        .mapInPandas(pairs, schema="vec_a long, vec_b long, sim double")
        .orderBy("vec_a", "vec_b")
    )


def ivf_index(
    spark: SparkSession, sf_dir: str, n_cells: int = 8, n_iters: int = 5
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(ids, cell_assignment, normalized matrix, centroids): a coarse IVF
    quantizer learned with deterministic k-means (init = first n_cells
    vectors in vec_id order; Lloyd iterations on cosine similarity).

    NOTE: the embeddings table's `label` column is NOT a geometric cluster
    (measured: top-5 neighbors share the query's label ~10% ≈ chance at
    every SF), so the quantizer must be learned from the vectors."""
    raw_ids, raw_mat = _load_index(spark, sf_dir)
    order = np.argsort(raw_ids, kind="stable")
    ids, mat = raw_ids[order], raw_mat[order]
    cents = mat[:n_cells].copy()
    for _ in range(n_iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    assign = np.argmax(mat @ cents.T, axis=1)
    return ids, assign, mat, cents


@query("sim_ann_ivf")  # rows-only: ANN recall is approximate by design
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-5: k-means coarse quantizer (ivf_index),
    then search only the nprobe=2 nearest cells per query instead of the
    full index.

    This is the 100 TB layout: centroids are a tiny broadcast table, the
    index is hash-partitioned by cell, and each query joins only its probed
    cells — cost drops from O(N) to O(N · nprobe / n_cells) per query.
    Not oracle-graded: tests assert the MECHANISM is exact (output ≡
    brute-force restricted to probed cells); absolute recall is a data
    property (isotropic vectors ⇒ modest recall at nprobe=2, by design)."""
    ids, assign, mat, cents = ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    bc = spark.sparkContext.broadcast((ids, assign, mat, np.arange(len(cents)), cents))

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index_ids, index_cells, index_mat, cell_ids, cell_mat = bc.value
        for pdf_b in batches:
            if pdf_b.empty:
                continue
            q_ids, q_mat = _normalized_matrix(pdf_b)
            cell_sims = q_mat @ cell_mat.T
            out = {"vec_id": [], "nbr_id": [], "sim": []}
            for i, qid in enumerate(q_ids):
                probes = cell_ids[np.argsort(-cell_sims[i], kind="stable")[:2]]
                mask = np.isin(index_cells, probes) & (index_ids != qid)
                cand_ids = index_ids[mask]
                sims = np.round(index_mat[mask] @ q_mat[i], 6)
                order = np.lexsort((cand_ids, -sims))[:5]
                out["vec_id"].extend([qid] * len(order))
                out["nbr_id"].extend(cand_ids[order])
                out["sim"].extend(sims[order])
            yield pd.DataFrame(out)

    return (
        emb.select("vec_id", "embedding")
        .mapInPandas(probe, schema="vec_id long, nbr_id long, sim double")
        .orderBy("vec_id", F.desc("sim"), "nbr_id")
    )


@query(
    "emb_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS e
      FROM embeddings
    ), s AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS scale
      FROM v
    )
    SELECT vec_id, round(scale, 6) AS scale,
           cast(list_max(list_transform(e, x -> floor(abs(x) / scale * 127 + 0.5))) AS int)
             AS max_q,
           round(list_max(list_transform(e,
             x -> abs(x - floor(x / scale * 127 + 0.5) * scale / 127))), 6) AS max_err
    FROM s ORDER BY vec_id
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization — the 4x storage compression a
    100 TB vector corpus ships with: per-vector scale = max|x|, code =
    floor(x/scale*127 + 0.5), plus the max reconstruction error.

    Quantization uses floor(x + 0.5) instead of round() everywhere: floor
    is a single IEEE operation with identical results in Spark and DuckDB,
    while round() half-way handling is engine-specific (the dsum lesson,
    functions/numeric.py). Pure higher-order array expressions, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x AS double))").alias("e")
    )
    s = v.select(
        "vec_id", "e", F.expr("array_max(transform(e, x -> abs(x)))").alias("scale")
    )
    return (
        s.select(
            "vec_id",
            F.round("scale", 6).alias("scale"),
            F.expr(
                "cast(array_max(transform(e, x -> floor(abs(x) / scale * 127 + 0.5))) AS int)"
            ).alias("max_q"),
            F.round(
                F.expr(
                    "array_max(transform(e,"
                    " x -> abs(x - floor(x / scale * 127 + 0.5) * scale / 127)))"
                ),
                6,
            ).alias("max_err"),
        )
        .orderBy("vec_id")
    )
