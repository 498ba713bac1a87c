"""§2.11 Text analytics & LLM-pipeline ops (north-star additions,
BASELINE.json:6) — wordcount, n-grams, tf-idf, language stats, quality
scoring, token counting, fingerprinting, language-ID, exact & near dedup.

These run on the `documents` table (space-separated lowercase bag-of-words,
FIXTURES.md). Everything is built from explode/window/join/agg primitives —
no Python UDFs — so the same plans scale to a 100 TB corpus: tokenization
explodes into (doc, pos, word) rows that partition by doc_id; shingle joins
shuffle on the shingle hash, which is the standard dedup layout.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from filemap_spark.functions.blocked import block_pigeonhole_pairs
from filemap_spark.functions.numeric import (
    davg,
    davg_lnsafe,
    dsum,
    mean_micro_6dp,
)
from filemap_spark.functions.ranks import with_global_ntile
from filemap_spark.io import load_table, spread_single_split
from filemap_spark.registry import query


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, word) — the exploded token relation every op builds on."""
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


@query(
    "text_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word ORDER BY n DESC, word LIMIT 50
    """,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical map-reduce demo (filemap's README example shape [K]):
    tokenize → count → top-50."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
    )


@query(
    "text_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ), big AS (
      SELECT word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
      FROM toks
    )
    SELECT bigram, count(*) AS n FROM big WHERE bigram IS NOT NULL
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigrams via posexplode + lead window; top-30."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        _tokens(docs)
        .select(
            F.concat_ws(" ", "word", F.lead("word").over(w)).alias("bigram"),
            F.lead("word").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(30)
    )


@query(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
    ), df AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             round(tf.tf * ln(cast(n.n_docs AS double) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word AS top_word, tfidf
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) = 1
    ORDER BY doc_id
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf with ln(N/df); top term per doc (tiebreak: word asc). The
    corpus size N rides along as a broadcast scalar — no driver collect.

    Round-12 single-tokenize form: df derives FROM the tf count table
    (count of (doc, word) rows per word ≡ countDistinct(doc_id) — exact
    integers), and tf is checkpointed once (the c12 count-table
    discipline: checkpoint the AGGREGATED frame, never the raw token
    stream) — the r6 form tokenized the corpus twice, and ReuseExchange
    can't rescue it because the optimizer specializes the two branches'
    partial aggregates differently (the df branch drops the count)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    tf = (
        toks.groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("word").alias("top_word"), "tfidf")
        .orderBy("doc_id")
    )


_HASH_FEATURE_BUCKETS = 64


def _hash_bucket_col(col: str) -> Column:
    """The feature-hashing bucket of a token: a 16-bit md5 slice modulo
    {B} — md5 (not xxhash64) so bucket assignment is engine- and
    rerun-portable. Shared (round 15) by `text_hash_features` (the
    featurizer) and `text_quality_classifier` (the Naive-Bayes tier that
    trains on those buckets) so the two ops can never hash into
    different feature spaces. DuckDB spelling:
    CAST(('0x' || substr(md5(word), 1, 4)) AS INT) % {B}."""
    return (
        F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("int")
        % _HASH_FEATURE_BUCKETS
    )


_hash_bucket_col.__doc__ = _hash_bucket_col.__doc__.format(
    B=_HASH_FEATURE_BUCKETS
)


@query(
    "text_hash_features",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id % 10 = 0
    ),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(word), 1, 4)) AS INT)
               % {_HASH_FEATURE_BUCKETS} AS bucket
      FROM toks
    ),
    c AS (SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY doc_id, bucket),
    t AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id)
    SELECT c.doc_id, c.bucket, c.n, round(c.n / t.n_tokens, 6) AS weight
    FROM c JOIN t USING (doc_id)
    ORDER BY doc_id, bucket
    """,
    cost=0.5,
)
def text_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (round 5) — the hashing trick (Weinberger et al.;
    fastText/Vowpal-Wabbit style): each token maps to one of 64 buckets by
    a 16-bit md5 slice, giving every document a FIXED-width sparse count
    vector with no vocabulary to build, broadcast, or keep consistent
    across ingest batches — the property that matters at 100 TB, where a
    vocab dictionary is itself a mutable distributed state problem.
    Output is the sparse (doc, bucket, count, tf-weight) triplet form
    (docs restricted to doc_id % 10 = 0 to bound the graded frame).

    md5 — not xxhash64/murmur — so bucket assignment is engine- and
    rerun-portable (the same discipline as every sample_* membership
    test). The weight division is int/int in IEEE double, identical in
    both engines.

    Scale: explode + two keyed aggs + one join keyed by doc_id — all
    partial-agg friendly; no vocabulary relation anywhere, which is the
    entire point of the trick."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    counts = (
        toks.withColumn("bucket", _hash_bucket_col("word"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
    )
    totals = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    return (
        counts.join(totals, "doc_id")
        .select(
            "doc_id",
            "bucket",
            "n",
            F.round(F.col("n") / F.col("n_tokens"), 6).alias("weight"),
        )
        .orderBy("doc_id", "bucket")
    )


@query(
    "text_lang_stats",
    oracle=f"""
    SELECT lang, count(*) AS n_docs, {davg('cast(n_chars AS double)', 'avg_chars')},
           count(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr(davg("cast(n_chars AS double)", "avg_chars")),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           cast(len(string_split(text, ' ')) AS int) AS ws_tokens,
           cast(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS int) AS bpe_ish_tokens,
           cast(ceil(length(text) / 4.0) AS bigint) AS byte_len_estimate
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace tokens, a BPE-ish regex
    segmentation (alnum runs vs single non-alnum marks), and the classic
    chars/4 LLM budget estimate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]', 0)")).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("byte_len_estimate"),
    )


@query(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           cast(len(w) AS int) AS n_tokens,
           round(cast(len(list_distinct(w)) AS double) / len(w), 6) AS distinct_ratio,
           round(cast(len(list_filter(w, x -> x IN ('the','a','of','to','and'))) AS double)
                 / len(w), 6) AS stopword_ratio,
           round(cast(n_chars AS double) / len(w), 6) AS avg_word_len,
           CASE WHEN len(w) >= 20
                 AND cast(len(list_distinct(w)) AS double) / len(w) > 0.3
                THEN 'keep' ELSE 'flag' END AS verdict
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality scoring (length / distinct-token ratio /
    stopword ratio) — the standard pretraining-corpus filter, as pure
    column expressions."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_tok = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    stop = F.size(F.expr("filter(split(text, ' '), x -> x IN ('the','a','of','to','and'))"))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(n_distinct.cast("double") / n_tok, 6).alias("distinct_ratio"),
        F.round(stop.cast("double") / n_tok, 6).alias("stopword_ratio"),
        F.round(F.col("n_chars").cast("double") / n_tok, 6).alias("avg_word_len"),
        F.when(
            (n_tok >= 20) & (n_distinct.cast("double") / n_tok > 0.3), "keep"
        )
        .otherwise("flag")
        .alias("verdict"),
    )


@query(
    "text_repetition_stats",
    cost=1.0,
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ), tok AS (
      SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_uniq
      FROM toks GROUP BY doc_id
    ), big AS (
      SELECT doc_id,
             word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
      FROM toks
    ), bc AS (
      SELECT doc_id, bigram, count(*) AS c FROM big
      WHERE bigram IS NOT NULL GROUP BY doc_id, bigram
    ), per_doc AS (
      SELECT doc_id, max(c) AS top_big, sum(c) AS n_bigrams FROM bc GROUP BY doc_id
    )
    SELECT t.doc_id,
           cast(t.n_tokens AS bigint) AS n_tokens,
           round(cast(t.n_uniq AS double) / t.n_tokens, 6) AS uniq_token_ratio,
           round(coalesce(cast(p.top_big AS double) / p.n_bigrams, 0.0), 6)
             AS top_bigram_frac
    FROM tok t LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: lexical
    diversity (distinct/total tokens) and the fraction of bigram occurrences
    taken by the single most frequent bigram — the standard screens for
    boilerplate loops and keyword-stuffed spam in a pretraining corpus.

    Token stats come straight off the split array (JVM, no extra scan
    branch); only the bigram frequency needs relational machinery: explode
    (doc_id, pos, word), lead() within doc, then two keyed aggregations.
    Every shuffle is on doc_id or (doc_id, bigram) — the natural corpus
    partitioning — so the plan is the one you'd run at 100 TB: no all-pairs,
    no driver state, group sizes bounded by document length."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(F.split("text", " "))).alias("n_uniq"),
    )
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    per_doc = (
        toks.select(
            "doc_id",
            F.concat_ws(" ", "word", F.lead("word").over(w)).alias("bigram"),
            F.lead("word").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_big"), F.sum("c").alias("n_bigrams"))
    )
    return (
        tok.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_uniq").cast("double") / F.col("n_tokens"), 6).alias(
                "uniq_token_ratio"
            ),
            F.round(
                F.coalesce(
                    F.col("top_big").cast("double") / F.col("n_bigrams"), F.lit(0.0)
                ),
                6,
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), wc AS (
      SELECT word, count(*) AS c FROM toks GROUP BY word
    ), tot AS (SELECT count(*) AS n FROM toks)
    SELECT doc_id,
           cast(count(*) AS bigint) AS n_tokens,
           {davg('ln(cast(n AS double)) - ln(cast(c AS double))', 'avg_neg_logp')}
    FROM toks JOIN wc USING (word) CROSS JOIN tot
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring with a corpus unigram LM — the
    standard filter between cheap heuristics (text_quality_score) and a real
    LM pass: p(w) = corpus_count(w)/total_tokens; per doc, the mean negative
    log-likelihood of its tokens. High avg_neg_logp = rare-token-dense
    (gibberish, boilerplate IDs); low = stopword soup.

    Determinism across engines: each token's -ln p is a single libm call on
    identical doubles (ln(total) - ln(count) — verified hash-identical
    Spark-vs-DuckDB over the contract vocabulary at every graded SF), and
    the per-doc MEAN uses the scaled-int64 exact-sum machinery
    (functions/numeric.davg) so summation order cannot move the 6th decimal.

    Scale: token explode partitions by doc; the unigram table is
    vocabulary-sized (Zipf: ≪ corpus) and broadcast; one shuffle per stage
    — the same layout as tf-idf. At 100 TB the LM table is a few GB of
    (word, count) parquet, still broadcastable after a frequency floor."""
    docs = load_table(spark, sf_dir, "documents")
    return _unigram_scored(docs, with_count=True).orderBy("doc_id")


@query(
    "text_bigram_logprob",
    cost=1.0,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ), bg0 AS (
      SELECT doc_id, word AS w1,
             lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ), bg AS (SELECT * FROM bg0 WHERE w2 IS NOT NULL),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT word) AS v FROM toks)
    SELECT doc_id, cast(count(*) AS bigint) AS n_bigrams,
           {davg_lnsafe('ln(cast(c1 + v AS double)) - ln(cast(c12 + 1 AS double))',
                 'avg_neg_logp')}
    FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity proxy with add-one smoothing (round 5) — one
    step up the quality-scoring ladder from text_unigram_logprob: scores
    local word ORDER, not just vocabulary rarity, so shuffled-token spam
    that fools a unigram filter scores badly here.
    p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V); per doc, the mean negative
    log-likelihood over its bigrams.

    Determinism: each -ln p is ln(int) - ln(int) on identical
    exact-integer-valued doubles, but libm ln is not correctly rounded —
    Spark and DuckDB can differ by 1 ulp, and at this op's ~400k distinct
    ln arguments the davg 1e-6 quantization boundary gets hit (observed
    at sf0.1). The mean therefore uses davg_lnsafe (functions/numeric.py):
    1e-4 per-row quantization — boundary odds ~1e-11/row — summed in
    exact int64.

    Scale: bigram table is the wordcount layout squared but Zipf-bounded;
    the w1-marginal is vocabulary-sized. Both LM joins are UNHINTED —
    AQE broadcasts them while small, shuffled-hash-joins them at corpus
    scale (the text_unigram_logprob OOM lesson)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.select(
            "doc_id",
            F.col("word").alias("w1"),
            F.lead("word").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    # the bigram count table is materialized once and the w1-marginal
    # derives FROM it (sum of c12 over w1 ≡ count of bigrams starting
    # with w1 — exact integers), round-10 scan sweep: the r5-r10 form
    # re-ran the corpus bigram window for each count (4 corpus scans →
    # 3). bg itself stays un-checkpointed deliberately — it is
    # corpus-sized per-bigram rows, the bm25 full-tf lesson.
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12")).localCheckpoint()
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = toks.agg(F.countDistinct("word").alias("v"))
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.expr(
                davg_lnsafe(
                    "ln(cast(c1 + v AS double)) - ln(cast(c12 + 1 AS double))",
                    "avg_neg_logp",
                )
            ),
        )
        .orderBy("doc_id")
    )


def _unigram_scored(docs: DataFrame, with_count: bool = False) -> DataFrame:
    """(doc_id[, n_tokens], avg_neg_logp) — the corpus-unigram-LM perplexity
    proxy shared by text_unigram_logprob and text_quality_tiers.

    The vocabulary join carries NO broadcast hint: vocab grows ~Heaps-law
    with corpus size, so a forced broadcast of the full (word, count) table
    is an executor OOM at 100 TB. AQE broadcasts it when it is actually
    small (pinned by tests/test_plan_shape.py); a shuffled hash/merge join
    on `word` is the correct fallback at scale. The token-total frame is a
    single row — always broadcast.

    Round-12 two-tokenize form (was three): the LM table is checkpointed
    once (vocab-sized — the cheapest checkpoint in the repo) and the
    token total derives from it as sum(c) — exact integers — instead of
    re-counting the exploded stream. The raw token stream itself stays
    un-checkpointed (corpus-sized; the bm25 full-tf lesson), so the
    scoring join pays the second, final tokenize."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    wc = toks.groupBy("word").agg(F.count("*").alias("c")).localCheckpoint()
    tot = wc.agg(F.sum("c").alias("n"))
    aggs = [
        F.expr(davg("ln(cast(n AS double)) - ln(cast(c AS double))", "avg_neg_logp"))
    ]
    if with_count:
        aggs.insert(0, F.count("*").cast("bigint").alias("n_tokens"))
    return toks.join(wc, "word").crossJoin(F.broadcast(tot)).groupBy("doc_id").agg(*aggs)


@query(
    "text_langid_heuristic",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN len(list_filter(w, x -> x IN ('the','a','of'))) * 10 >= len(w)
                THEN 'en-like' ELSE 'other' END AS guessed_class
    FROM t
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (≥10% English stopwords → en-like).
    The contract corpus is synthetic analytics vocabulary, so this grades the
    MECHANISM (token-ratio classification), not linguistic accuracy; a real
    deployment swaps in per-language n-gram profiles."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    en_marks = F.size(F.expr("filter(split(text, ' '), x -> x IN ('the','a','of'))"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(en_marks * 10 >= F.size(w), "en-like").otherwise("other").alias("guessed_class"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT md5(substring(text, 1, 50)) AS fp, count(*) AS n_docs,
           min(doc_id) AS survivor
    FROM documents
    GROUP BY fp HAVING count(*) > 1 ORDER BY survivor
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint collision groups — the contract corpus has 23
    shared 50-char prefixes (FIXTURES.md), i.e. real near-duplicate clusters;
    survivor = min doc_id per cluster."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.substring("text", 1, 50)).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("survivor"))
        .where(F.col("n_docs") > 1)
        .orderBy("survivor")
    )


@query(
    "dedup_exact_text",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS survivor, count(*) AS n_copies
    FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
    GROUP BY text_hash ORDER BY survivor
    """,
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, survivor = min doc_id. The corpus has no
    exact dups (FIXTURES.md), so the input is doubled (simulating a re-crawl)
    to exercise the mechanism; at 100 TB this is a single hash-shuffle on
    md5(text) with map-side partial min/count."""
    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionAll(docs)
    return (
        doubled.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("survivor"), F.count("*").alias("n_copies"))
        .orderBy("survivor")
    )


def canonicalize_url(url):
    """The dedup_url_canonical canonicalization chain as a reusable column
    expression: drop fragment -> force https -> lowercase host (path case
    preserved) -> strip utm_*/ref tracking params -> strip trailing slash.
    Idempotent (pinned by tests/test_properties.py); shared by the graded
    op and any pipeline that wants URL-keyed dedup."""
    u = F.regexp_replace(
        F.regexp_replace(url, "#.*$", ""), "^http://", "https://"
    )
    u = F.concat(
        F.lit("https://"),
        F.lower(F.regexp_extract(u, "^https://([^/]+)", 1)),
        F.regexp_extract(u, "^https://[^/]+(.*)$", 1),
    )
    return F.regexp_replace(
        F.regexp_replace(u, r"[?&](utm_[a-z]+|ref)=[^&#]*", ""), "/+$", ""
    )


@query(
    "dedup_url_canonical",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'https://WWW.Example.COM/docs/'
                    || cast(doc_id // 4 AS varchar) || '?utm_source=feed&ref=x'
               WHEN 1 THEN 'https://www.example.com/docs/'
                    || cast(doc_id // 4 AS varchar) || '/'
               WHEN 2 THEN 'http://www.example.com/docs/'
                    || cast(doc_id // 4 AS varchar) || '#sec'
               ELSE 'https://www.example.com/docs/'
                    || cast(doc_id // 4 AS varchar) || '?page=2&utm_campaign=x'
             END AS url
      FROM documents
    ),
    s2 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(url, '#.*$', ''),
                            '^http://', 'https://') AS u
      FROM raw
    ),
    s3 AS (
      SELECT doc_id,
             'https://' || lower(regexp_extract(u, '^https://([^/]+)', 1))
             || regexp_extract(u, '^https://[^/]+(.*)$', 1) AS u
      FROM s2
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(u, '[?&](utm_[a-z]+|ref)=[^&#]*', '', 'g'),
               '/+$', '') AS canon_url
      FROM s3
    )
    SELECT canon_url, count(*) AS n_docs, min(doc_id) AS survivor
    FROM canon GROUP BY canon_url
    ORDER BY canon_url
    """,
    cost=0.5,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup (round 5) — the cheapest and FIRST dedup
    pass of a web-crawl curation pipeline (before any content hashing): a
    crawl sees the same page as `http://` vs `https://`, cased hosts,
    trailing slashes, fragments, and utm/ref tracking params, and
    collapsing those spellings is pure string algebra on the URL alone —
    no content read. URLs are manufactured in 4 messy variants per
    doc_id//4 group (the corpus has no URL column); canonicalization =
    drop fragment → force https → lowercase host (path case PRESERVED) →
    strip tracking params (real params like `page=2` survive) → strip
    trailing slash. Variants 0/1/2 of each group collapse to one canonical
    URL; variant 3 keeps its real query param and stays distinct — the
    rule must not over-merge. Survivor = min doc_id per canonical URL.

    Scale: per-row regex chain in codegen + ONE hash agg on the canonical
    string — the same shuffle shape as dedup_exact_text, happening before
    any text byte is fetched."""
    docs = load_table(spark, sf_dir, "documents")
    gid = F.floor(F.col("doc_id") / 4).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("https://WWW.Example.COM/docs/"), gid,
                F.lit("?utm_source=feed&ref=x"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("https://www.example.com/docs/"), gid, F.lit("/")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("http://www.example.com/docs/"), gid, F.lit("#sec")),
        )
        .otherwise(
            F.concat(
                F.lit("https://www.example.com/docs/"), gid,
                F.lit("?page=2&utm_campaign=x"),
            )
        )
    )
    return (
        docs.select("doc_id", canonicalize_url(url).alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("survivor"))
        .orderBy("canon_url")
    )


# Shared CTE: distinct word-5-gram shingles per doc. Reused by the Jaccard
# pair block below and the cross-split decontamination oracle
# (operators/relational.py).
SHINGLE_CTE = """
    sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', w[pos], w[pos+1], w[pos+2], w[pos+3], w[pos+4]) AS shingle
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS pos
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
    )
"""

# Shared CTE block: word-5-gram shingles → exact-Jaccard ≥ 0.8 pairs.
# Reused by dedup_near_jaccard and the connected-components oracle
# (operators/relational.py).
JACCARD_PAIR_CTES = f"""
    {SHINGLE_CTE.strip()}, counts AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inters AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ), jac_pairs AS (
      SELECT doc_a, doc_b,
             round(cast(inter AS double) / (ca.n + cb.n - inter), 6) AS jaccard
      FROM inters
        JOIN counts ca ON doc_a = ca.doc_id
        JOIN counts cb ON doc_b = cb.doc_id
      WHERE cast(inter AS double) / (ca.n + cb.n - inter) >= 0.8
    )
"""


@query(
    "dedup_near_jaccard",
    memo=("documents",),
    cost=1.2,
    oracle=f"""
    WITH {JACCARD_PAIR_CTES}
    SELECT doc_a, doc_b, jaccard FROM jac_pairs
    ORDER BY doc_a, doc_b
    """,
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact Jaccard over word-5-gram shingles (graded
    exact form per SURVEY §2.11; MinHashLSH is the 100 TB strategy — see
    dedup_minhash_lsh). The shingle equi-join shuffles on the shingle, so
    cost is bounded by shingle-bucket sizes, not the doc-pair cross
    product — EXCEPT for exact-duplicate clusters, which put k copies of
    every shingle in its bucket (k² join rows per shared shingle); the
    scale path neutralizes that with the _dup_groups representative
    collapse (round 10), deliberately NOT applied here so this op stays
    the naive exact reference the oracle and the LSH parity pins grade
    against."""
    docs = load_table(spark, sf_dir, "documents")
    # materialized once: counts and BOTH self-join sides scan this frame,
    # and Spark does not dedupe common subplans — without this the
    # shingle build runs three times per query. Round 9: the shared
    # map-side _shingle_frame replaces the inline window+distinct form —
    # measured EQUAL warm time under identical JIT conditions (1.31 s vs
    # 1.31 s at sf0.1; an apparent 0.84 vs 1.3 gap was bench-suite JIT
    # warmth, not the form) with two shuffles fewer, and the rows are
    # bit-identical (tests/test_kernels.py).
    sh = _shingle_frame(docs).localCheckpoint()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jac = F.col("inter").cast("double") / (F.col("ca.n") + F.col("cb.n") - F.col("inter"))
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .where(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def _shingle_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): DISTINCT word-5-gram shingles — the Spark twin of
    SHINGLE_CTE, shared by the LSH family (minhash, incremental).

    Round 9 (while cutting the incremental-LSH ingest path, VERDICT r8
    task 5): built MAP-SIDE from the split array — transform over start
    positions + array_distinct inside each doc, then explode — zero
    shuffle, where the r1-r8 form paid a doc_id-window shuffle+sort (four
    leads) plus a global distinct exchange. Per-doc array_distinct equals
    the global DISTINCT (doc_id, shingle) because doc_id is in the key;
    values are bit-identical, pinned by the oracle hashes of the whole
    LSH/ngram family. At 100 TB this makes shingling embarrassingly
    parallel — the first shuffle in every dedup plan is now the one keyed
    on the shingle itself."""
    sh = (
        "array_distinct(CASE WHEN size(w) >= 5 THEN"
        " transform(sequence(1, size(w) - 4),"
        "           i -> concat_ws(' ', slice(w, i, 5)))"
        " ELSE array() END)"
    )
    return docs.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id", F.explode(F.expr(sh)).alias("shingle")
    )


# LSH geometry shared by dedup_minhash_lsh and the incremental ingest:
# r = 4 rows/band over 128 deterministic permutations → catches jaccard ≥ ~0.6
_LSH_HASHES, _LSH_BANDS = 128, 32


def _keyed_by_text(docs: DataFrame) -> DataFrame:
    """(doc_id, text, thash): the md5 text-equality key the dup-collapse
    family shares. A false 128-bit collision (p ≈ n²/2¹²⁸) would merge
    two distinct texts — the same convention dedup_paragraph_jaccard
    already uses for paragraph hashes."""
    return docs.select("doc_id", "text", F.md5("text").alias("thash"))


def _dup_groups(keyed: DataFrame) -> DataFrame:
    """One row per distinct text: (thash, rep_id, text, sigworthy) —
    the exact-duplicate pre-collapse for the LSH family (round 10,
    VERDICT r9 task 2, hot band-bucket hardening).

    k identical documents put k identical signatures in EVERY band, so the
    naive band-bucket self-join generates k·(k-1)/2 candidate rows per band
    (×32 bands) before `.distinct()` — the one quadratic hot spot in the
    banded layout. Collapsing to one representative per distinct text
    FIRST means identical docs contribute ONE signature: candidate volume
    through the minhash/verify stages drops to O(groups² within bucket),
    and the required k² output pairs are re-expanded at the END as a cheap
    membership join that never touches shingles.

    rep_id = min doc_id over the group (deterministic); `sigworthy`
    mirrors _shingle_frame's width-5 condition (≥ 5 words ⇔ ≥ 1 shingle
    ⇔ the rep reaches a band) — defined HERE ONCE so the expansion's
    within-group rule can never drift from the shingle pipeline's.
    The map-side partial agg collapses duplicate texts per partition
    before the exchange, so the text shuffle volume is bounded by
    distinct-texts-per-partition, not corpus size."""
    return keyed.groupBy("thash").agg(
        F.min("doc_id").alias("rep_id"),
        F.min_by("text", "doc_id").alias("text"),
    ).withColumn("sigworthy", F.size(F.split("text", " ")) >= 5)


def _expand_rep_pairs(
    rep_pairs: DataFrame,
    members: DataFrame,
    reps: DataFrame,
    value_col: str = "jaccard",
    same_value: Column | None = None,
    sig_only: bool = True,
) -> DataFrame:
    """Re-expand representative-level verified pairs (doc_a, doc_b,
    <value_col>) to all member pairs, plus the within-group
    exact-duplicate pairs at `same_value` (identical texts ⇒ jaccard
    exactly 1.0 / hamming exactly 0). With sig_only (the Jaccard
    family), non-sigworthy groups are skipped — they have no shingles,
    matching the un-collapsed plan where shingle-less docs never reach a
    band; SimHash signs every doc (even one token), so it passes
    sig_only=False.

    members = (thash, doc_id); reps as produced by _dup_groups. The
    expansion joins are membership lookups keyed on thash — they move
    (thash, doc_id) rows only, never shingles or signatures, so the
    unavoidable k² output of a k-member duplicate group is produced by
    the cheapest possible operator."""
    rep_of = reps.select("rep_id", "thash")
    cross = (
        rep_pairs.join(rep_of.alias("ra"), F.col("doc_a") == F.col("ra.rep_id"))
        .join(rep_of.alias("rb"), F.col("doc_b") == F.col("rb.rep_id"))
        .join(members.alias("ma"), F.col("ra.thash") == F.col("ma.thash"))
        .join(members.alias("mb"), F.col("rb.thash") == F.col("mb.thash"))
        .select(
            F.least("ma.doc_id", "mb.doc_id").alias("doc_a"),
            F.greatest("ma.doc_id", "mb.doc_id").alias("doc_b"),
            value_col,
        )
    )
    if same_value is None:
        same_value = F.lit(1.0)
    groups = reps.where(F.col("sigworthy")) if sig_only else reps
    sig = groups.select("thash")
    same = (
        members.alias("ma")
        .join(
            members.alias("mb"),
            (F.col("ma.thash") == F.col("mb.thash"))
            & (F.col("ma.doc_id") < F.col("mb.doc_id")),
        )
        .join(sig.alias("s"), F.col("ma.thash") == F.col("s.thash"), "left_semi")
        .select(
            F.col("ma.doc_id").alias("doc_a"),
            F.col("mb.doc_id").alias("doc_b"),
            same_value.alias(value_col),
        )
    )
    return cross.unionByName(same)


def _band_buckets(shingles: DataFrame) -> DataFrame:
    """(doc_id, band, bucket): banded MinHash signature, stacked one row per
    band. minhash_i = min over shingles of xxhash64(shingle, i) — seeded,
    deterministic, so signatures computed in different ingest batches (or
    rounds) are comparable; bucket = hash of the band's 4 signature slots
    (argument order unchanged since r3, so bucket values are bit-identical
    across the r9 rewrite).

    Round 9 (VERDICT r8 task 5): the r3-r8 form built 128 hash columns +
    128 min-aggregates + 32 band columns as SEPARATE Catalyst expressions
    through an aggregate and two projections — measured ~1.8 s of pure,
    data-independent analysis/optimization time per plan build (sf0.001
    and sf0.1 identical, so at sf0.1 MOST of the stage was plan build).
    This form explodes ONE codegen'd 128-element hash array to
    (doc_id, i, h) rows (a lambda-free F.array — higher-order `transform`
    would evaluate xxhash64 interpreted, measured 3× slower on the hash
    leg), computes the signature with a streaming keyed min-agg on
    (doc_id, i) (bounded state, map-side partial min), and reassembles
    the bounded 128-element signature array per doc for the band hash.
    Shuffle volume is the same docs×128 longs the wide-column partial-agg
    moved (the explode's 128× row blow-up collapses in the map-side
    partial min before the exchange); end-to-end, the incremental delta
    ingest this stage dominates dropped 3.2 s → 2.2 s warm at sf0.1. On
    a FULL-corpus pass the explode's CPU cost and the old form's fixed
    analysis cost are comparable (~2-4 s either way at sf0.1) — the
    exploded form wins on delta-sized batches, which is the shape the
    ingest path exists for."""
    rows_per_band = _LSH_HASHES // _LSH_BANDS
    ih = shingles.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[F.xxhash64("shingle", F.lit(i)) for i in range(_LSH_HASHES)]
            )
        ).alias("i", "h"),
    )
    sig = ih.groupBy("doc_id", "i").agg(F.min("h").alias("m"))
    # exactly 128 rows per doc re-collect into the ordered signature array
    ms = sig.groupBy("doc_id").agg(
        F.expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)")
        .alias("ms")
    )
    bucket_args = ", ".join(
        f"ms[b * {rows_per_band} + {r}]" for r in range(rows_per_band)
    )
    return ms.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_LSH_BANDS - 1}),"
                f" b -> hash({bucket_args}))"
            )
        ).alias("band", "bucket"),
    )


def _jaccard_verify(
    candidates: DataFrame, shingles: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Exact-verify (doc_a, doc_b) candidate pairs with true shingle Jaccard;
    keeps pairs ≥ threshold. Cheap: joins only candidates' shingle rows."""
    counts = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = shingles.alias("sa")
    sb = shingles.alias("sb")
    inter = (
        candidates.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sb,
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jac = F.col("inter").cast("double") / (F.col("ca.n") + F.col("cb.n") - F.col("inter"))
    return (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query("dedup_minhash_lsh", cost=4.9)  # rows-only: LSH bucketing is probabilistic
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates — the scale path for dedup_near_jaccard
    (shingle→minhash→band→bucket-join instead of the quadratic-ish shingle
    self-join). Deterministic seeded permutations; banded signature join;
    candidates then exact-verified with true Jaccard. Not oracle-graded
    (banding recall is probabilistic); tests assert parity with the exact op
    on the contract corpus.

    At 100 TB: signatures are 128 ints/doc regardless of doc size, and the
    band-bucket join shuffles only signature fragments — this is the
    standard web-scale dedup layout. Round 10 (VERDICT r9 task 2): exact
    duplicates are pre-collapsed to one representative per distinct text
    before shingling, so a k-member identical cluster contributes ONE
    signature instead of k²/2 candidate rows per band; the k² output
    pairs re-expand from the membership table at the end
    (_dup_groups / _expand_rep_pairs). Output is bit-identical to
    the un-collapsed plan (identical texts share signatures, so rep-level
    band collisions are exactly member-level ones) — pinned on a
    10-identical-docs replica corpus in tests/test_quality.py."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE documents scan + md5 pass: members and reps both derive from
    # this checkpoint (un-checkpointed, each downstream checkpoint would
    # rescan and rehash the whole corpus — review finding, round 10)
    keyed = _keyed_by_text(docs).localCheckpoint()
    members = keyed.select("thash", "doc_id")
    # materialized once: the rep relation feeds shingling, the sigworthy
    # filter, and both expansion joins
    reps = _dup_groups(keyed).localCheckpoint()
    # materialized once: the signature agg, the candidate verify join
    # (both sides), and the shingle counts all rescan this frame
    shingles = _shingle_frame(
        reps.select(F.col("rep_id").alias("doc_id"), "text")
    ).localCheckpoint()
    # materialized once too (round 9): BOTH self-join sides read the band
    # relation — un-checkpointed, the minhash pipeline runs twice
    # (measured ~5.4 s vs ~1 s for the band stage itself at sf0.1)
    stacked = _band_buckets(shingles).localCheckpoint()
    a = stacked.alias("a")
    b = stacked.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    rep_pairs = _jaccard_verify(candidates, shingles)
    return _expand_rep_pairs(rep_pairs, members, reps).orderBy("doc_a", "doc_b")


def incremental_lsh_ingest(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Ingest a document batch into a PERSISTED LSH index and return the
    exact-verified duplicate pairs the batch introduces — filemap's
    make-semantics applied to web-scale dedup: when new files arrive, only
    the new documents are shingled, minhashed, and banded; the existing
    corpus contributes through the persisted index, never recomputed.

    State layout under `state_dir` (all normal parquet, appendable;
    round 10 moved the shingle/band index to REPRESENTATIVE level —
    VERDICT r9 task 2's hot-bucket hardening):
      ingested.parquet  (doc_id, thash, rep_id, sigworthy)
         — make ledger + group membership, denormalized: every doc row
           carries its group's representative id and whether the group's
           text bears shingles (≥ 5 words), so pair re-expansion joins on
           rep_id directly — no thash re-derivation, no separate groups
           table (a rep is the row with doc_id == rep_id)
      shingles.parquet  (doc_id, shingle)        — reps only, for verification
      bands.parquet     (doc_id, band, bucket)   — reps only, the LSH index

    Returns (doc_a, doc_b, jaccard), doc_a < doc_b, jaccard >= threshold,
    where at least one side is in THIS batch ((new, old) via the band-bucket
    probe against the persisted index, (new, new) via self-probe). Ingesting
    the same docs again is a no-op (anti-join on the ledger) and an empty
    delta costs one empty scan — the only-new-docs-work property is pinned
    in tests/test_quality.py.

    Hot-bucket hardening: only DISTINCT new texts are shingled/minhashed
    (one representative each); a new doc whose text is already indexed
    joins its group and re-probes through the group's stored rep bands —
    no recompute, no k identical signatures amplifying every band bucket.
    Candidate volume through the verify stage is O(groups² within
    bucket); the k² duplicate pairs a k-member group owes the output are
    re-expanded from the (thash, doc_id) membership table at the end
    (_expand_rep_pairs). Output is unchanged vs the pre-collapse form:
    identical texts have identical signatures, so member-level band
    collisions are exactly rep-level ones, and within-group pairs are
    jaccard 1.0 by construction (emitted only for shingle-bearing texts,
    matching the old plan where shingle-less docs never reached a band).

    Scale: per batch the shuffles touch O(|distinct new texts|) signature
    fragments plus the probed buckets of the index; the index itself is an
    appended columnar table that ingest never rewrites — and now grows
    with distinct texts, not raw docs. (The separate `compact_lsh_state`
    utility DOES rewrite, to fold accumulated per-batch file sets; its
    hysteresis amortizes that cost over ≥ (slack−1)·ideal appends.)
    Deterministic seeded permutations make signatures from different
    batches comparable by construction."""
    import os

    os.makedirs(state_dir, exist_ok=True)
    ing_path = os.path.join(state_dir, "ingested.parquet")
    sh_path = os.path.join(state_dir, "shingles.parquet")
    band_path = os.path.join(state_dir, "bands.parquet")
    # heal any compaction interrupted mid-swap BEFORE trusting absence:
    # a missing ledger with an intact .compact_old must not read as
    # "fresh state" (that would orphan every old membership row)
    for p in (ing_path, sh_path, band_path):
        _recover_compact_swap(p)
    have_state = os.path.exists(ing_path)

    new_docs = docs.select("doc_id", "text")
    if have_state:
        ledger = spark.read.parquet(ing_path)
        if "rep_id" not in ledger.columns:
            raise ValueError(
                f"{ing_path} uses the pre-rep-level state layout "
                "(doc_id-only ledger; per-doc shingle/band index). The "
                "rep-level ingest cannot read it — delete the state dir "
                "and re-ingest the corpus to rebuild."
            )
        new_docs = new_docs.join(ledger.select("doc_id"), "doc_id", "left_anti")
    # pin the delta (ledger append below must not flip the anti-join);
    # thash rides along so the dup-collapse never rehashes text
    keyed = _keyed_by_text(new_docs).localCheckpoint()
    if not keyed.take(1):
        # nothing unseen: skip the whole band/verify machinery (a no-op
        # batch otherwise pays ~5 s of plan overhead — measured sf0.1)
        return spark.createDataFrame(
            [], "doc_a long, doc_b long, jaccard double"
        )

    if have_state:
        # one row per indexed distinct text: the ledger rows that ARE reps
        old_reps = ledger.where(F.col("doc_id") == F.col("rep_id")).select(
            "thash", "rep_id", "sigworthy"
        )
        # docs whose text is already indexed join their group; only novel
        # texts go through the minhash pipeline
        novel = keyed.join(old_reps.select("thash"), "thash", "left_anti")
    else:
        old_reps = None
        novel = keyed
    batch_reps = _dup_groups(novel)
    rep_docs = batch_reps.select(F.col("rep_id").alias("doc_id"), "text")

    # The batch's ledger rows: every new doc annotated with its group rep
    # (novel docs get the batch rep, joining docs their group's stored
    # rep) — ONE relation serving the pair expansion and the ledger
    # append. Built here so it can ride the fused checkpoint below.
    ledger_rows = novel.select("doc_id", "thash").join(
        batch_reps.select("thash", "rep_id", "sigworthy"), "thash"
    )
    if have_state:
        joining = keyed.join(old_reps.select("thash"), "thash", "left_semi")
        ledger_rows = ledger_rows.unionByName(
            joining.select("doc_id", "thash").join(old_reps, "thash")
        )
    ledger_rows = ledger_rows.select("doc_id", "thash", "rep_id", "sigworthy")

    # Fused materialization (round 9, VERDICT r8 task 5; widened r18):
    # shingles, band buckets AND the batch ledger rows checkpoint as ONE
    # tagged union frame — one job instead of the r3-r8 two sequential
    # checkpoints plus the r10-r17 separate ledger checkpoint (the band
    # leg recomputes the cheap shingle explode inside the same job; the
    # expensive minhash agg runs once either way; the ledger legs'
    # classification joins would otherwise re-run for every expansion
    # branch AND the append — measured ~4x). Tags by nullness: non-null
    # shingle = the shingle relation; non-null band = the LSH index
    # rows; non-null thash = the ledger rows.
    sh = _shingle_frame(rep_docs)
    _null = lambda t, name: F.lit(None).cast(t).alias(name)  # noqa: E731
    joint = (
        sh.select(
            "doc_id", "shingle", _null("int", "band"), _null("int", "bucket"),
            _null("string", "thash"), _null("long", "rep_id"),
            _null("boolean", "sigworthy"),
        )
        .unionByName(
            _band_buckets(sh).select(
                "doc_id", _null("string", "shingle"), "band", "bucket",
                _null("string", "thash"), _null("long", "rep_id"),
                _null("boolean", "sigworthy"),
            )
        )
        .unionByName(
            ledger_rows.select(
                "doc_id", _null("string", "shingle"), _null("int", "band"),
                _null("int", "bucket"), "thash", "rep_id", "sigworthy",
            )
        )
        .localCheckpoint()
    )
    new_sh = joint.where(F.col("shingle").isNotNull()).select("doc_id", "shingle")
    new_bands = joint.where(F.col("band").isNotNull()).select(
        "doc_id", "band", "bucket"
    )
    new_rows = joint.where(F.col("thash").isNotNull()).select(
        "doc_id", "thash", "rep_id", "sigworthy"
    )

    if have_state:
        idx_bands = spark.read.parquet(band_path)
        all_bands = idx_bands.unionByName(new_bands)
        all_sh = spark.read.parquet(sh_path).unionByName(new_sh)
        # a new member of an EXISTING group probes through the group's
        # stored rep bands (the group's near-dup neighborhood is not in
        # state — only the index is); one probe per touched group
        j_reps = old_reps.join(
            keyed.select("thash").distinct(), "thash", "left_semi"
        ).select(F.col("rep_id").alias("doc_id"))
        probe_bands = new_bands.unionByName(
            idx_bands.join(j_reps, "doc_id", "left_semi")
        )
    else:
        all_bands = new_bands
        all_sh = new_sh
        probe_bands = new_bands

    a = probe_bands.alias("a")
    b = all_bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    rep_pairs = _jaccard_verify(candidates, all_sh, threshold)

    # Expansion universe: all members (old + new) keyed directly on
    # rep_id — a rep-level pair expands to member pairs touching the
    # batch; pure old×old pairs were emitted when the younger group first
    # arrived. The denormalized ledger makes this 3 membership joins.
    mem_new = new_rows.select(
        "doc_id", "rep_id", "sigworthy", F.lit(True).alias("is_new")
    )
    if have_state:
        members_all = (
            ledger.select("doc_id", "rep_id", "sigworthy")
            .withColumn("is_new", F.lit(False))
            .unionByName(mem_new)
        )
    else:
        members_all = mem_new

    cross = (
        rep_pairs.join(members_all.alias("ma"), F.col("doc_a") == F.col("ma.rep_id"))
        .join(members_all.alias("mb"), F.col("doc_b") == F.col("mb.rep_id"))
        .where(F.col("ma.is_new") | F.col("mb.is_new"))
        .select(
            F.least("ma.doc_id", "mb.doc_id").alias("doc_a"),
            F.greatest("ma.doc_id", "mb.doc_id").alias("doc_b"),
            "jaccard",
        )
    )
    # within-group exact dups: ma is always a NEW member (one generation
    # per pair: new×new once via <, new×old once via !=), jaccard 1.0;
    # shingle-less groups (< 5 words) emit nothing, matching the
    # un-collapsed plan where they never reached a band
    same = (
        mem_new.where(F.col("sigworthy"))
        .alias("ma")
        .join(
            members_all.alias("mb"),
            (F.col("ma.rep_id") == F.col("mb.rep_id"))
            & F.when(
                F.col("mb.is_new"), F.col("ma.doc_id") < F.col("mb.doc_id")
            ).otherwise(F.col("ma.doc_id") != F.col("mb.doc_id")),
        )
        .select(
            F.least("ma.doc_id", "mb.doc_id").alias("doc_a"),
            F.greatest("ma.doc_id", "mb.doc_id").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    pairs = cross.unionByName(same).localCheckpoint()

    # Commit the batch AFTER the pairs are materialized (append-only).
    # Ledger FIRST — preserving the pre-r18 sequential order's crash
    # exposure (a ledger row without its index rows, never index rows
    # without their ledger row, which would re-append them as novel) —
    # then the two index appends CONCURRENTLY (guide §2.6: independent
    # jobs from a small thread pool; both scan the same checkpointed
    # joint frame, so the wall is max, not sum). coalesce(1): the rows
    # are already materialized in the checkpoint, so each append is a
    # single-task memory scan and the state grows ONE file per table
    # per batch instead of one per shuffle partition (guide §6
    # small-files; later probes pay per-file open cost).
    new_rows.coalesce(1).write.mode("append").parquet(ing_path)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(
                lambda df, p: df.coalesce(1)
                .write.mode("append")
                .parquet(p),
                df,
                p,
            )
            for df, p in ((new_sh, sh_path), (new_bands, band_path))
        ]
        for f in futs:
            f.result()
    return pairs


_LSH_STATE_TABLES = ("ingested.parquet", "shingles.parquet", "bands.parquet")


def _recover_compact_swap(path: str) -> None:
    """Heal a parquet-dir compaction interrupted mid-swap (crash between
    the two renames): if the live dir is missing but `<path>.compact_old`
    survives, the old data is intact — rename it back; if both exist,
    the swap completed and the backup is garbage. Leftover
    `.compact_tmp` is always garbage (rewrite output, possibly partial).
    Idempotent; called by every reader/writer entry point so a crashed
    compaction can never silently present as an EMPTY state (an absent
    ledger would make the next ingest start fresh and drop the old
    membership rows — review finding, round 10)."""
    import os
    import shutil

    old = path + ".compact_old"
    if os.path.isdir(old):
        if os.path.isdir(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)
    shutil.rmtree(path + ".compact_tmp", ignore_errors=True)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 64 << 20,
    min_files: int = 16,
    slack: int = 4,
) -> tuple[int, int]:
    """Compact ONE append-grown parquet directory to ~target_bytes files
    via rewrite-then-rename; returns (files_before, files_after).

    Hysteresis (review finding, round 10): rewriting costs O(dir), so
    compacting whenever file count exceeds the ideal ceil(size/target)
    would rewrite the FULL state on every appending drain — the
    O(total)-per-batch cost the incremental design exists to avoid. A
    dir is left alone until it holds more than max(slack·ideal,
    min_files) files; each rewrite then amortizes over at least
    (slack-1)·ideal (or min_files) subsequent appends.

    Crash safety: the two renames are not one atomic step — a crash
    between them leaves the live dir missing with the data intact in
    `.compact_old`; _recover_compact_swap (run here first, and by the
    LSH ingest itself) renames it back. A CONCURRENT reader can still
    hit the gap and fail loudly (path-not-found — never partial data);
    don't run compaction concurrently with readers or ingests."""
    import math
    import os
    import shutil

    _recover_compact_swap(path)
    if not os.path.isdir(path):
        return (0, 0)
    parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
    size = sum(os.path.getsize(os.path.join(path, f)) for f in parts)
    n_out = max(1, math.ceil(size / target_bytes))
    if len(parts) <= max(slack * n_out, min_files):
        return (len(parts), len(parts))
    tmp = path + ".compact_tmp"
    spark.read.parquet(path).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(tmp)
    old = path + ".compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return (
        len(parts),
        len([f for f in os.listdir(path) if f.endswith(".parquet")]),
    )


def compact_lsh_state(
    spark: SparkSession,
    state_dir: str,
    target_bytes: int = 64 << 20,
    min_files: int = 16,
    slack: int = 4,
) -> dict[str, tuple[int, int]]:
    """Compact every LSH state table (see compact_parquet_dir for the
    rewrite/hysteresis/crash-safety contract).

    Every `incremental_lsh_ingest` batch APPENDS one file set per table,
    so a long-running ingest loop accumulates thousands of small parquet
    files — each later probe then pays per-file open/footer cost and the
    scan parallelism degenerates to file count (the classic small-files
    problem; `sink_compact_small_files` demonstrates the generic fix).
    Returns {table: (files_before, files_after)}; a missing table
    (empty state) is skipped."""
    import os

    return {
        name: compact_parquet_dir(
            spark,
            os.path.join(state_dir, name),
            target_bytes,
            min_files,
            slack,
        )
        for name in _LSH_STATE_TABLES
        if os.path.isdir(os.path.join(state_dir, name))
        or os.path.isdir(os.path.join(state_dir, name) + ".compact_old")
    }


@query(
    "dedup_incremental_lsh",
    cost=6.0,
    oracle=f"""
    WITH {JACCARD_PAIR_CTES}
    SELECT doc_a, doc_b, jaccard FROM jac_pairs
    WHERE doc_a % 10 = 0 OR doc_b % 10 = 0
    ORDER BY doc_a, doc_b
    """,
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded batch form of the incremental dedup path: ingest the corpus
    sans every-10th doc as the existing index, then ingest the arriving
    split (doc_id % 10 == 0) and return the delta pairs that second ingest
    surfaces. Equals the exact all-pairs Jaccard oracle restricted to pairs
    touching the delta — (new, old) pairs come from band-bucket probes of
    the persisted index, (new, new) from self-probes, and every candidate is
    exact-verified, so the LSH mechanics are graded against exact SQL.

    (Banding at r=4,b=32 misses a true jaccard-0.8 pair with p < 1e-7; on
    the deterministic contract corpus the parity is exact — also pinned
    directly in tests/test_quality.py.)"""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    state_dir = tempfile.mkdtemp(prefix="lsh_incr_")
    try:
        incremental_lsh_ingest(spark, docs.where(F.col("doc_id") % 10 != 0), state_dir)
        delta = incremental_lsh_ingest(
            spark, docs.where(F.col("doc_id") % 10 == 0), state_dir
        )
        # localCheckpointed by ingest → safe to drop the parquet state
        return delta.orderBy("doc_a", "doc_b")
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc: sign-sum over xxhash64(token) bits —
    deterministic, shared by the pair query and the mechanism tests."""
    return _simhash_of(load_table(spark, sf_dir, "documents"))


def _simhash_of(docs: DataFrame) -> DataFrame:
    """SimHash signatures for an arbitrary (doc_id, text) frame — split
    out (round 10) so the dedup op can sign REPRESENTATIVES only."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    h = F.xxhash64("word")
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    return bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(
                    F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
                ).otherwise(F.lit(0).cast("long"))
                for i in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )


@query("dedup_simhash", cost=2.9)  # rows-only: bit-sig construction is engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance ≤ 7. Pair generation uses
    the block-pigeonhole guarantee: with 8 blocks of 8 bits, any pair with
    ≤ 7 differing bits must agree on at least one whole block, so a
    block-equality join (scales like LSH, no cross product) has PERFECT
    recall at the threshold — verified against brute-force all-pairs in
    tests/test_quality.py.

    Round 10: exact duplicates pre-collapse to one representative per
    distinct text before signing — identical docs share every block, so
    a k-member cluster generated 8·k²/2 candidate rows; now it signs
    once and the k² output pairs re-expand from the membership join
    (same hardening as dedup_minhash_lsh; identical texts ⇒ identical
    simhash ⇒ rep-level block agreement is exactly member-level).
    SimHash signs EVERY doc (even one token), so the expansion's
    within-group rule applies to all groups (sig_only=False), at
    hamming 0."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE documents scan + md5 pass feeds members and reps
    keyed = _keyed_by_text(docs).localCheckpoint()
    members = keyed.select("thash", "doc_id")
    reps = _dup_groups(keyed).localCheckpoint()
    # materialized once: both self-join sides scan the 64-column
    # signature aggregate (reps only)
    sig = _simhash_of(
        reps.select(F.col("rep_id").alias("doc_id"), "text")
    ).localCheckpoint()
    # Block-pigeonhole candidate join (functions/blocked.py, shared with
    # mm_dhash_near_dup): one hash-shuffle on the (blk_idx, blk_val) key —
    # the bucket layout MinHash-LSH uses, and the shape that survives
    # 100 TB; an OR of block equalities would broadcast-nested-loop O(N²).
    rep_pairs = block_pigeonhole_pairs(
        sig, id_col="doc_id", sig_col="simhash",
        n_blocks=8, block_bits=8, threshold=7,
    ).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "hamming",
    )
    return _expand_rep_pairs(
        rep_pairs,
        members,
        reps,
        value_col="hamming",
        same_value=F.lit(0).cast("int"),
        sig_only=False,
    ).orderBy("doc_a", "doc_b")


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS norm_text,
           len(string_split(trim(regexp_replace(regexp_replace(lower(text),
                               '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS n_tokens
    FROM documents ORDER BY doc_id
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization — the pipeline pre-tokenization pass: lowercase,
    strip non-alphanumerics, collapse whitespace, plus the resulting token
    count. Pure JVM column expressions (regex dialect restricted to the
    Spark/DuckDB-identical subset; Spark's regexp_replace is global by
    default = DuckDB's 'g' flag)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        docs.select(
            "doc_id",
            norm.alias("norm_text"),
            F.size(F.split(norm, " ")).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_chunk_overlap",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT unnest(generate_series(0, 20)) AS i)
    SELECT doc_id, cast(i AS int) AS chunk_idx,
           array_to_string(w[(i*20)+1 : (i*20)+30], ' ') AS chunk_text,
           cast(len(w[(i*20)+1 : (i*20)+30]) AS int) AS n_tokens
    FROM d, g
    WHERE i*20 < len(w)
    ORDER BY doc_id, chunk_idx
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the RAG/context-prep primitive:
    30-token chunks with stride 20 (10-token overlap), emitted as
    (doc_id, chunk_idx, chunk_text, n_tokens).

    Shuffle-free: tokens stay an array column, chunk indices come from an
    exploded `sequence`, and the slice happens per row — each input doc
    expands to ceil(n/stride) rows in the same task at any corpus size."""
    size, stride = 30, 20
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("w"))
    n = F.size("w")
    return (
        d.select(
            "doc_id",
            "w",
            F.posexplode(
                F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("int"))
            ).alias("pos", "i"),
        )
        .where(F.col("i") * stride < F.size("w"))
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice("w", F.col("i") * stride + 1, size)).alias(
                "chunk_text"
            ),
            F.size(F.slice("w", F.col("i") * stride + 1, size)).alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "pack_token_budget",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, cast(len(string_split(text, ' ')) AS bigint) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tok,
             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT lang, cast(floor((cum - 1) / 2048) AS bigint) AS bin,
           cast(count(*) AS bigint) AS n_docs,
           cast(sum(n_tok) AS bigint) AS tokens
    FROM c GROUP BY lang, bin ORDER BY lang, bin
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence PACKING for training-batch prep: assign documents (in
    deterministic doc_id order, per language) to 2048-token context-window
    bins via a running token cumsum — bin = floor((cumsum-1)/budget), the
    streaming-greedy rule where a document straddling a boundary lands in
    the bin its cumsum ends in. Reports docs and tokens per bin, the shape
    a dataloader manifest needs.

    Scale: one window shuffle on the pack key (lang) + one partial-agg
    shuffle on (lang, bin); no Python anywhere. A 100 TB corpus packs per
    (lang, shard) so no single window partition grows unbounded — the
    shard key composes into partitionBy exactly like lang here."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.select(
            "lang",
            F.floor((F.col("cum") - 1) / 2048).alias("bin"),
            "n_tok",
        )
        .groupBy("lang", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("tokens"))
        .orderBy("lang", "bin")
    )


@query(
    "text_token_entropy",
    oracle=f"""
    WITH wc AS (
      SELECT doc_id, cast(count(*) AS double) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY doc_id, word
    ), s AS (
      SELECT doc_id,
             cast(sum(cast(c AS bigint)) AS bigint) AS n_tokens,
             cast(count(*) AS bigint) AS n_distinct,
             {dsum('c * ln(c)', 's_clnc')}
      FROM wc GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           round(ln(cast(n_tokens AS double)) - s_clnc / n_tokens, 6) AS entropy
    FROM s ORDER BY doc_id
    """,
    cost=0.5,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the doc's OWN unigram distribution —
    the quality signal orthogonal to text_unigram_logprob (which scores
    against the corpus LM): low entropy = repetitive/keyword-stuffed text,
    high = diverse vocabulary. Uses the algebraic form
    H = ln(n) - (1/n) * sum(c * ln(c)) so the per-(doc,word) term is one
    libm call on identical doubles in both engines, and the sum runs
    through the scaled-int64 exact-sum machinery (functions/numeric.dsum)
    — summation order cannot move the 6th decimal.

    Scale: explode partitions by doc_id; both aggs are partial+final hash
    aggs keyed by doc_id — one shuffle, no Python, no window. At 100 TB
    this is the same layout as wordcount-per-doc."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        _tokens(docs)
        .groupBy("doc_id", "word")
        .agg(F.count("*").cast("double").alias("c"))
    )
    s = wc.groupBy("doc_id").agg(
        F.expr("cast(sum(cast(c AS bigint)) AS bigint)").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.expr(dsum("c * ln(c)", "s_clnc")),
    )
    return s.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.expr(
            "round(ln(cast(n_tokens AS double)) - s_clnc / n_tokens, 6) AS entropy"
        ),
    ).orderBy("doc_id")


# PII patterns — deliberately the shared Java-regex/RE2 subset (character
# classes + bounded repetition only; no lookaround, no \b) so the identical
# pattern string runs in Spark's regexp_* and DuckDB's RE2 functions.
_PII_EMAIL = "[a-z0-9]+@[a-z0-9.]+"
_PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
_PII_TEL = "555-[0-9]{4}"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 > 0
                     THEN ' mail user' || cast(doc_id AS varchar) || '@example.com'
                     ELSE '' END
             || ' ip 10.0.' || cast(doc_id % 256 AS varchar) || '.7'
             || repeat(' tel 555-' || lpad(cast(doc_id % 10000 AS varchar), 4, '0'),
                       cast(doc_id % 2 + 1 AS int)) AS payload
      FROM documents
    )
    SELECT doc_id,
           cast(len(regexp_extract_all(payload, '{_PII_EMAIL}')) AS bigint) AS n_email,
           cast(len(regexp_extract_all(payload, '{_PII_IP}')) AS bigint) AS n_ip,
           cast(len(regexp_extract_all(payload, '{_PII_TEL}')) AS bigint) AS n_tel,
           md5(regexp_replace(regexp_replace(regexp_replace(payload,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_TEL}', '<TEL>', 'g')) AS clean_md5
    FROM p ORDER BY doc_id
    """,
    cost=0.4,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every training corpus runs before
    tokenization: detect and mask emails, IPv4 addresses, and phone numbers,
    reporting per-doc match counts plus the md5 of the scrubbed text (pinning
    the exact redacted output, not just the counts). The contract corpus is
    PII-free by construction (FIXTURES.md: lowercase alpha bag-of-words), so
    the query deterministically MANUFACTURES a payload per doc — an email on
    2/3 of docs, one IP, one-or-two phone numbers keyed by doc_id parity —
    exercising 0-match, 1-match and multi-match paths on both engines.

    Scale: pure per-row JVM regexp chain — no shuffle at all (the ORDER BY
    is presentation only); whole-stage codegen end-to-end. Redaction order
    is fixed (email -> ip -> tel) so overlapping matches resolve
    identically everywhere."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 > 0,
            F.concat(
                F.lit(" mail user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(""),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
        F.repeat(
            F.concat(
                F.lit(" tel 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
            (F.col("doc_id") % 2 + 1).cast("int"),
        ),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("payload"), _PII_EMAIL, "<EMAIL>"),
            _PII_IP,
            "<IP>",
        ),
        _PII_TEL,
        "<TEL>",
    )
    return (
        docs.select("doc_id", payload.alias("payload"))
        .select(
            "doc_id",
            F.regexp_count("payload", F.lit(_PII_EMAIL)).cast("long").alias("n_email"),
            F.regexp_count("payload", F.lit(_PII_IP)).cast("long").alias("n_ip"),
            F.regexp_count("payload", F.lit(_PII_TEL)).cast("long").alias("n_tel"),
            F.md5(clean).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_quality_tiers",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), wc AS (
      SELECT word, count(*) AS c FROM toks GROUP BY word
    ), tot AS (SELECT count(*) AS n FROM toks), scored AS (
      SELECT doc_id,
             {davg('ln(cast(n AS double)) - ln(cast(c AS double))', 'avg_neg_logp')}
      FROM toks JOIN wc USING (word) CROSS JOIN tot
      GROUP BY doc_id
    )
    SELECT doc_id, avg_neg_logp,
           CASE ntile(3) OVER (ORDER BY avg_neg_logp, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
    FROM scored ORDER BY doc_id
    """,
    cost=0.6,
)
def text_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality TIERING (Wenzek et al., the public CommonCrawl
    curation recipe): score every doc with the corpus-LM perplexity proxy
    (text_unigram_logprob's avg negative log-likelihood), then split the
    corpus into head / middle / tail terciles — the partition a pretraining
    mix samples from at different rates. The tier boundary is an ntile over
    a TOTAL order (score, then doc_id), so ties at a boundary land
    identically in both engines.

    Scale: scoring is the unigram-logprob layout (AQE-decided LM join, one
    doc-keyed agg). The tercile split is EXACT ntile semantics but computed
    DISTRIBUTED (functions/ranks.with_global_ntile: range exchange +
    partition-local row_number + bounded offset join) — no single-partition
    WindowExec anywhere in the plan (pinned by tests/test_plan_shape.py),
    so the same plan survives a 100 TB corpus. The cheaper approximate form
    (percentile_approx cutoffs + broadcast range lookup) is
    quality_tier_cutoffs(); tier_agreement_eval measures their agreement."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT checkpointed (round-10 scan sweep investigated): the ranged
    # relation inside with_global_ntile is already persisted, so the
    # unigram pipeline materializes ONCE at any scale — a checkpoint
    # here measured +0.42 s pure overhead (0.66 → 1.08 s at sf0.1)
    scored = _unigram_scored(docs)
    tiled = with_global_ntile(scored, 3, "avg_neg_logp", "doc_id", tile_col="nt")
    return (
        tiled.select(
            "doc_id",
            "avg_neg_logp",
            F.when(F.col("nt") == 1, "head")
            .when(F.col("nt") == 2, "middle")
            .otherwise("tail")
            .alias("tier"),
        )
        .orderBy("doc_id")
    )


def quality_tier_cutoffs(scored: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """Approximate tier assignment: sample the 1/3 and 2/3 score quantiles
    with percentile_approx (one pass, mergeable sketch) and assign tiers by
    comparing against the two cutoffs via a broadcast 1-row join — the
    production path when even the doc-level range exchange is worth
    skipping. Divergence vs the exact form is confined to docs whose score
    ties a sampled boundary (the cutoff cannot see the doc_id tiebreak) or
    sits within the sketch's rank-error of it; tier_agreement_eval reports
    the realized agreement so an operator can decide when the approx path
    is trustworthy."""
    cuts = scored.agg(
        F.percentile_approx(
            "avg_neg_logp", F.array(F.lit(1.0 / 3.0), F.lit(2.0 / 3.0)),
            F.lit(accuracy),
        ).alias("cuts")
    ).select(F.col("cuts")[0].alias("c1"), F.col("cuts")[1].alias("c2"))
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "avg_neg_logp",
        F.when(F.col("avg_neg_logp") <= F.col("c1"), "head")
        .when(F.col("avg_neg_logp") <= F.col("c2"), "middle")
        .otherwise("tail")
        .alias("tier"),
    )


@query("tier_agreement_eval", oracle=None, cost=0.8)
def tier_agreement_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL harness (pairs with sim_recall_eval): before trusting the
    cutoff-based tier path on a 100 TB corpus, measure how often it agrees
    with the exact ntile assignment. One row: corpus size, per-tier doc
    counts under the exact form, the agreement count, and the agreement
    rate. Rows-only by design — the number it reports is about the APPROX
    path, which a SQL oracle cannot reproduce (DuckDB's quantile sketch
    differs); the exact side is already oracle-graded via
    text_quality_tiers. The agreement floor is pinned in tests/test_quality.py."""
    docs = load_table(spark, sf_dir, "documents")
    # materialized once (round 10, scan-sweep finding): the exact-ntile
    # path persists its ranged input internally, but the APPROX path
    # (cutoff agg + assignment join) re-runs the 3-scan unigram pipeline
    # per reference — genuinely duplicated corpus work, unlike
    # text_quality_tiers where the persist already covers the only
    # consumer; scored is one small row per doc, the cheapest pin
    scored = _unigram_scored(docs).localCheckpoint()
    exact = with_global_ntile(scored, 3, "avg_neg_logp", "doc_id", tile_col="nt")
    approx = quality_tier_cutoffs(scored).select(
        "doc_id", F.col("tier").alias("tier_approx")
    )
    exact = exact.select(
        "doc_id",
        F.when(F.col("nt") == 1, "head")
        .when(F.col("nt") == 2, "middle")
        .otherwise("tail")
        .alias("tier_exact"),
    )
    joined = exact.join(approx, "doc_id")
    return joined.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("tier_exact") == "head", 1).otherwise(0))
        .cast("bigint")
        .alias("n_head_exact"),
        F.sum(F.when(F.col("tier_exact") == "middle", 1).otherwise(0))
        .cast("bigint")
        .alias("n_middle_exact"),
        F.sum(F.when(F.col("tier_exact") == "tail", 1).otherwise(0))
        .cast("bigint")
        .alias("n_tail_exact"),
        F.sum(F.when(F.col("tier_exact") == F.col("tier_approx"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
        # empty corpus: 0/0 would be NULL — report a vacuous 1.0 instead
        F.coalesce(
            F.round(
                F.sum(
                    F.when(F.col("tier_exact") == F.col("tier_approx"), 1).otherwise(0)
                )
                / F.count("*"),
                6,
            ),
            F.lit(1.0),
        ).alias("agreement_rate"),
    )


_PARA_TOKENS = 10  # aligned paragraph granularity (tokens per pseudo-paragraph)


@query(
    "dedup_paragraph_jaccard",
    cost=1.2,
    memo=("documents",),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      FROM documents
    ), paras AS (
      SELECT doc_id, pos // {_PARA_TOKENS} AS pidx,
             string_agg(word, ' ' ORDER BY pos) AS para
      FROM toks GROUP BY doc_id, pos // {_PARA_TOKENS}
    ), ph AS (SELECT DISTINCT doc_id, md5(para) AS h FROM paras),
    np AS (SELECT doc_id, count(*) AS n FROM ph GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM ph a JOIN ph b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, cast(n_shared AS bigint) AS n_shared,
           cast(x.n AS bigint) AS n_para_a, cast(y.n AS bigint) AS n_para_b,
           round(n_shared * 1.0 / least(x.n, y.n), 6) AS containment
    FROM pairs JOIN np x ON doc_a = x.doc_id JOIN np y ON doc_b = y.doc_id
    WHERE n_shared * 1.0 / least(x.n, y.n) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_paragraph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAGRAPH-granularity near-dup detection — the standard public-corpus
    recipe (e.g. the C4/RefinedWeb line-level dedup step): hash each
    paragraph exactly, then flag doc pairs whose CONTAINMENT — shared
    paragraphs over the smaller doc's paragraph count — clears 0.5. This
    catches partially-copied boilerplate that whole-doc Jaccard misses
    (a doc that embeds half of another scores low on doc-level shingles
    but 0.5+ here). The contract corpus has no newlines, so a "paragraph"
    is an ALIGNED 10-token chunk (floor(pos/10)) — deterministic and
    SQL-expressible in both engines; on a real corpus the front end is
    split(text, '\\n\\n') with the identical downstream plan.

    Scale: blocking is the exact paragraph-hash equi-join — cost is
    bounded by hash-bucket sizes, never the doc-pair cross product. The
    100 TB caveat is boilerplate paragraphs shared by millions of docs
    (quadratic inside one bucket): production drops hashes with document
    frequency above a cap first (they carry no dedup signal — the same
    stopword logic as vocab pruning), which is one extra groupBy-filter
    in front of the self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return paragraph_containment_pairs(docs).orderBy("doc_a", "doc_b")


def paragraph_containment_pairs(
    docs: DataFrame, para_tokens: int = _PARA_TOKENS, threshold: float = 0.5
) -> DataFrame:
    """Core of dedup_paragraph_jaccard on an arbitrary (doc_id, text) frame
    — separated so tests can drive manufactured paragraph-dup fixtures."""
    paras = (
        _tokens(docs)
        .groupBy("doc_id", (F.col("pos") / para_tokens).cast("long").alias("pidx"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s.word,
                ),
                " ",
            ).alias("para")
        )
    )
    ph = paras.select("doc_id", F.md5("para").alias("h")).distinct().localCheckpoint()
    np_ = ph.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = ph.alias("a"), ph.alias("b")
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    na, nb = np_.alias("na"), np_.alias("nb")
    cont = F.col("n_shared") / F.least(F.col("na.n"), F.col("nb.n"))
    return (
        pairs.join(na, F.col("doc_a") == F.col("na.doc_id"))
        .join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .where(cont >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("na.n").cast("bigint").alias("n_para_a"),
            F.col("nb.n").cast("bigint").alias("n_para_b"),
            F.round(cont, 6).alias("containment"),
        )
    )


@query(
    "sample_quality_mix",
    cost=0.8,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), wc AS (
      SELECT word, count(*) AS c FROM toks GROUP BY word
    ), tot AS (SELECT count(*) AS n FROM toks), scored AS (
      SELECT doc_id,
             {davg('ln(cast(n AS double)) - ln(cast(c AS double))', 'avg_neg_logp')}
      FROM toks JOIN wc USING (word) CROSS JOIN tot
      GROUP BY doc_id
    ), tiered AS (
      SELECT doc_id,
             CASE ntile(3) OVER (ORDER BY avg_neg_logp, doc_id)
                  WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
      FROM scored
    )
    SELECT doc_id, tier FROM tiered
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10
          < CASE tier WHEN 'head' THEN 10 WHEN 'middle' THEN 5 ELSE 1 END
    ORDER BY doc_id
    """,
)
def sample_quality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED downsampling — the step after tiering in the CCNet
    recipe: keep 100% of head, 50% of middle, 10% of tail, so the curated
    mix over-represents high-quality text without discarding the tail
    outright. Tier assignment is the exact distributed ntile
    (text_quality_tiers' plan); keep/drop is the md5(doc_id) keep-rate
    rule (sample_content_hash's portable-hash discipline), so membership
    is engine-, partitioning-, and rerun-stable — rerunning curation can
    only extend, never flip, prior keeps.

    Scale: tiering is the range-exchange ntile (no single-partition
    window); the keep test is map-side on the tiered rows — no extra
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT checkpointed — see text_quality_tiers: the ntile's internal
    # persist already materializes the scored relation once
    scored = _unigram_scored(docs)
    tiered = with_global_ntile(scored, 3, "avg_neg_logp", "doc_id", tile_col="nt")
    tier = (
        F.when(F.col("nt") == 1, "head")
        .when(F.col("nt") == 2, "middle")
        .otherwise("tail")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    rate = (
        F.when(F.col("tier") == "head", 10)
        .when(F.col("tier") == "middle", 5)
        .otherwise(1)
    )
    return (
        tiered.select("doc_id", tier.alias("tier"))
        .where(bucket < rate)
        .orderBy("doc_id")
    )


@query(
    "text_curation_pipeline",
    cost=0.8,
    oracle="""
    WITH survivors AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), kept AS (
      SELECT d.doc_id, d.source, d.lang,
             len(string_split(d.text, ' ')) AS n_tokens,
             len(list_distinct(string_split(d.text, ' '))) AS n_distinct
      FROM documents d JOIN survivors s ON d.doc_id = s.doc_id
    )
    SELECT source,
           count(*) AS n_docs,
           cast(sum(n_tokens) AS bigint) AS total_tokens,
           count(DISTINCT lang) AS n_langs
    FROM kept
    WHERE n_tokens >= 20 AND cast(n_distinct AS double) / n_tokens > 0.3
    GROUP BY source ORDER BY source
    """,
)
def text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation pass — the composed pipeline a corpus run
    actually executes, graded as one operator so the STAGE WIRING (not
    just each stage) is under oracle: exact-dedup survivors (min doc_id
    per content hash, dedup_exact_text's rule) → heuristic quality gate
    (length + distinct-token ratio, text_quality_score's keep rule) →
    per-source audit rollup (doc counts, token totals, language spread) —
    the summary a curation job publishes next to its output dataset.

    Scale: one shuffle on the content hash (dedup), a semi-join back
    (AQE picks the build side), map-side quality predicates, and a
    |sources|-cell final agg. No stage touches more than one corpus-wide
    shuffle; nothing is collected."""
    docs = load_table(spark, sf_dir, "documents")
    survivors = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    w = F.split("text", " ")
    kept = (
        docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
        .select(
            "source",
            "lang",
            F.size(w).alias("n_tokens"),
            F.size(F.array_distinct(w)).alias("n_distinct"),
        )
        .where(
            (F.col("n_tokens") >= 20)
            & (F.col("n_distinct").cast("double") / F.col("n_tokens") > 0.3)
        )
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


@query(
    "text_bigram_pmi",
    cost=0.6,
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ), uni AS (
      SELECT word, count(*) AS c FROM toks GROUP BY word
    ), n_uni AS (SELECT count(*) AS n FROM toks),
    big AS (
      SELECT word AS w1,
             lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ), bc AS (
      SELECT w1, w2, count(*) AS cb FROM big WHERE w2 IS NOT NULL GROUP BY w1, w2
    ), n_big AS (SELECT sum(cb) AS m FROM bc)
    SELECT w1, w2, cast(cb AS bigint) AS n_pair,
           round(ln((cast(cb AS double) / m)
                    / ((cast(u1.c AS double) / n) * (cast(u2.c AS double) / n))),
                 6) AS pmi
    FROM bc JOIN uni u1 ON bc.w1 = u1.word JOIN uni u2 ON bc.w2 = u2.word
    CROSS JOIN n_uni CROSS JOIN n_big
    WHERE cb >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
    memo=("documents",),
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining via pointwise mutual information — the classic
    phrase-detection pass (word2vec-style phrase merging, tokenizer vocab
    candidates): PMI = ln(p(w1w2) / (p(w1)·p(w2))) over within-doc
    bigrams, floor of 5 occurrences, top-50. Each PMI is a single ln()
    on a ratio of exact integer counts — identical doubles both engines.

    Scale: unigram/bigram counts are the wordcount layout (explode + two
    keyed aggs); the PMI join keys on the unigram table twice (AQE
    broadcasts while the vocab is small — same no-hint discipline as
    text_unigram_logprob); top-50 collapses to TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    # both count tables materialized once (round-10 scan sweep): u1/u2
    # each re-ran the unigram agg and n_big/main each re-ran the bigram
    # window+agg — 5 corpus scans; checkpointing the two REDUCED count
    # frames and deriving the token total as sum(c) over the unigram
    # table (identical integer by construction) leaves exactly 2
    uni = toks.groupBy("word").agg(F.count("*").alias("c")).localCheckpoint()
    n_uni = uni.agg(F.sum("c").alias("n"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bc = (
        toks.select(F.col("word").alias("w1"), F.lead("word").over(w).alias("w2"))
        .where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
        .localCheckpoint()
    )
    n_big = bc.agg(F.sum("cb").alias("m"))
    u1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("cb").cast("double") / F.col("m"))
            / (
                (F.col("c1").cast("double") / F.col("n"))
                * (F.col("c2").cast("double") / F.col("n"))
            )
        ),
        6,
    )
    return (
        bc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .where(F.col("cb") >= 5)
        .select(
            "w1", "w2", F.col("cb").cast("bigint").alias("n_pair"), pmi.alias("pmi")
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
    )


@query(
    "text_ngram_coverage_eval",
    cost=1.0,
    oracle=f"""
    WITH {SHINGLE_CTE},
    train AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 != 0),
    held AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 = 0),
    cov AS (
      SELECT h.doc_id,
             count(*) AS n_shingles,
             count(t.shingle) AS n_covered
      FROM held h LEFT JOIN train t USING (shingle)
      GROUP BY h.doc_id
    )
    SELECT doc_id, n_shingles, n_covered,
           round(n_covered / n_shingles, 6) AS coverage
    FROM cov ORDER BY doc_id
    """,
)
def text_ngram_coverage_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram contamination COVERAGE report (round 5) — the statistic a
    decontamination run publishes next to dedup_cross_split's binary flag:
    for each held-out doc (doc_id % 10 = 0), what fraction of its distinct
    word-5-gram shingles already appears ANYWHERE in the train split. The
    cross-split op answers "is this doc contaminated (>=5 shared)?"; this
    answers "HOW exposed is the eval set?" — the number that decides
    whether a benchmark survives or gets rebuilt (GPT-3 appendix-C
    style reporting).

    Determinism: pure integer counts; the single coverage division of
    identical exact integers is engine-stable.

    Scale: same shingle equi-join layout as dedup_cross_split — the train
    shingle set is DISTINCT (Zipf-bounded), the join is a left semi-ish
    hash join keyed by shingle, never doc×doc. The shingle frame is
    materialized once (round 9): the train and held splits are both
    slices of it, and without the checkpoint the map-side shingle build
    runs once per split."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_frame(docs).localCheckpoint()
    train = (
        sh.where(F.col("doc_id") % 10 != 0).select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    held = sh.where(F.col("doc_id") % 10 == 0)
    return (
        held.join(train, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("hit").alias("n_covered"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_covered",
            F.round(F.col("n_covered") / F.col("n_shingles"), 6).alias("coverage"),
        )
        .orderBy("doc_id")
    )


_SPAN_TOKENS = 20  # rolling-window span granularity (tokens)


@query(
    "dedup_span_exact",
    cost=1.2,
    oracle=f"""
    WITH sp AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, pos, pos + {_SPAN_TOKENS - 1}), ' ') AS span
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - {_SPAN_TOKENS - 1})) AS pos
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
    )
    SELECT md5(span) AS span_hash, count(*) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM sp GROUP BY span HAVING count(*) > 1
    ORDER BY span_hash
    """,
)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SPAN detection (round 5) — the substring-level
    signal from "Deduplicating Training Data Makes Language Models Better"
    (Lee et al.): 20-token ROLLING windows (every offset, unlike
    dedup_paragraph_jaccard's aligned chunks) that appear verbatim in more
    than one document. Catches shared boilerplate at ARBITRARY offsets —
    the duplication that whole-doc and aligned-chunk dedup both miss, and
    the memorization vector span-level removal targets. Reports each
    duplicated span's hash, document reach, and witness doc range (the
    contract corpus has 747 such spans at sf0.01 — real signal, not a
    manufactured case).

    Scale: the span relation is O(tokens) rows per doc (each token opens
    one window); the duplicate detection is ONE hash agg on the span —
    identical shuffle shape to wordcount, just with heavier keys. In
    production the span string is replaced by its 128-bit hash before the
    shuffle (here the full span is kept so the oracle can share the
    expression; the output already ships hashes). A suffix-array pass is
    the letter of Lee et al.; the rolling-window hash join is the
    distributed-equivalent coverage at fixed granularity."""
    n = _SPAN_TOKENS
    docs = load_table(spark, sf_dir, "documents")
    spans = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= n)
        .select(
            "doc_id",
            "w",
            F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("pos"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.expr(f"slice(w, pos, {n})")).alias("span"),
        )
        .distinct()
    )
    return (
        spans.groupBy("span")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .where(F.col("n_docs") > 1)
        .select(
            F.md5("span").alias("span_hash"), "n_docs", "min_doc", "max_doc"
        )
        .orderBy("span_hash")
    )


@query(
    "text_gopher_rules",
    cost=0.5,
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             cast(len(string_split(text, ' ')) AS bigint) AS n_tok,
             length(text) AS n_ch
      FROM documents
    ), m AS (
      SELECT doc_id, n_tok,
             (n_ch - n_tok + 1) * 1.0 / n_tok AS mean_wl,
             len(list_filter(w, x -> length(x) <= 2)) * 1.0 / n_tok AS short_ratio,
             len(list_distinct(w)) * 1.0 / n_tok AS distinct_ratio,
             cast(len(list_intersect(list_distinct(w),
                                     ['the','a','of','to','and'])) AS int) AS n_stop
      FROM t
    )
    SELECT doc_id, n_tok AS n_tokens,
           round(mean_wl, 6) AS mean_word_len,
           round(short_ratio, 6) AS short_ratio,
           round(distinct_ratio, 6) AS distinct_ratio,
           n_stop AS n_stopwords,
           cast(n_tok BETWEEN 30 AND 5000 AS int) AS r_len,
           cast(mean_wl BETWEEN 3.0 AND 10.0 AS int) AS r_word_len,
           cast(short_ratio <= 0.1 AS int) AS r_short,
           cast(distinct_ratio >= 0.3 AS int) AS r_rep,
           cast(n_stop >= 2 AS int) AS r_stop,
           CASE WHEN n_tok BETWEEN 30 AND 5000 AND mean_wl BETWEEN 3.0 AND 10.0
                     AND short_ratio <= 0.1 AND distinct_ratio >= 0.3 AND n_stop >= 2
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (round 5; Rae et al. 2021's
    repetition/length/symbol heuristics, adapted to the contract corpus):
    five independent per-document rules — token count in [30, 5000], mean
    word length in [3, 10], short-word (≤2 chars) ratio ≤ 0.1, distinct-
    token ratio ≥ 0.3, and ≥ 2 distinct stopwords present — each emitted
    as its own 0/1 column so downstream audits can see WHICH rule dropped
    a document (the property that makes rule gates debuggable at corpus
    scale), plus the conjunction verdict. Complements the score-based
    `text_quality_score`/`text_quality_tiers`: rules are absolute, tiers
    are relative. The rule expressions live in the shared _gopher_columns
    helper since round 15 — `text_quality_classifier` bootstraps its
    training labels from the same verdict (regraded _REGRADE_R15).

    Determinism: every ratio is an int/int division — the same IEEE double
    in both engines — and thresholds compare the UNROUNDED value, so the
    6dp display rounding can never disagree with the verdict; boundary
    ties are exact-rational, not float-luck.

    Scale: pure per-row column expressions over one scan — no explode, no
    shuffle, no UDF; whole-stage codegen end to end. The rules gate is the
    cheapest stage of a curation pipeline and should run FIRST, before any
    dedup shuffle pays for documents the rules would have dropped."""
    docs = load_table(spark, sf_dir, "documents")
    g = _gopher_columns()
    return docs.select(
        "doc_id",
        g["n_tokens"].alias("n_tokens"),
        F.round(g["mean_word_len"], 6).alias("mean_word_len"),
        F.round(g["short_ratio"], 6).alias("short_ratio"),
        F.round(g["distinct_ratio"], 6).alias("distinct_ratio"),
        g["n_stopwords"].alias("n_stopwords"),
        g["r_len"].cast("int").alias("r_len"),
        g["r_word_len"].cast("int").alias("r_word_len"),
        g["r_short"].cast("int").alias("r_short"),
        g["r_rep"].cast("int").alias("r_rep"),
        g["r_stop"].cast("int").alias("r_stop"),
        g["verdict"].alias("verdict"),
    ).orderBy("doc_id")


def _gopher_columns() -> dict[str, Column]:
    """The five Gopher rule expressions and their conjunction verdict as
    named Columns over a `text` column — extracted (round 15) so
    `text_quality_classifier` can bootstrap its Naive-Bayes training
    labels from the IDENTICAL verdict expression the audit op emits,
    with no copy to drift. All thresholds compare UNROUNDED exact
    int/int ratios (see text_gopher_rules)."""
    w = F.split("text", " ")
    n_tok = F.size(w).cast("bigint")
    mean_wl = (F.length("text") - n_tok + 1) / n_tok
    short_ratio = (
        F.size(F.filter(w, lambda x: F.length(x) <= 2)).cast("double") / n_tok
    )
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_tok
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(w),
            F.array(*[F.lit(s) for s in ("the", "a", "of", "to", "and")]),
        )
    )
    r_len = n_tok.between(30, 5000)
    r_word_len = mean_wl.between(3.0, 10.0)
    r_short = short_ratio <= 0.1
    r_rep = distinct_ratio >= 0.3
    r_stop = n_stop >= 2
    return {
        "n_tokens": n_tok,
        "mean_word_len": mean_wl,
        "short_ratio": short_ratio,
        "distinct_ratio": distinct_ratio,
        "n_stopwords": n_stop,
        "r_len": r_len,
        "r_word_len": r_word_len,
        "r_short": r_short,
        "r_rep": r_rep,
        "r_stop": r_stop,
        "verdict": (
            F.when(r_len & r_word_len & r_short & r_rep & r_stop, "keep")
            .otherwise("drop")
        ),
    }


# Naive-Bayes quality classifier arithmetic, shared VERBATIM between the
# Spark plan (F.expr) and the DuckDB oracle so both engines evaluate the
# identical IEEE expression tree. Log-odds quantize per-BUCKET at 1e4
# (the davg_lnsafe discipline: libm ln is not correctly rounded, so a
# 1-ulp Spark/DuckDB split must need ~1e-4-scale luck, ~1e-11 per value
# over the ~{B}+1 distinct ln calls here); per-doc scores then compose
# as EXACT integer dot products of token counts with the quantized
# log-odds — no FP accumulation order anywhere.
_NB_Q_SQL = (
    "cast(round((ln(cast(nk + 1 as double)) - ln(cast(ntk + {B} as double))"
    " - ln(cast(nd + 1 as double)) + ln(cast(ntd + {B} as double)))"
    " * 10000) as bigint)"
).format(B=_HASH_FEATURE_BUCKETS)
_NB_QP_SQL = (
    "cast(round((ln(cast(dk + 1 as double)) - ln(cast(dd + 1 as double)))"
    " * 10000) as bigint)"
)
# Laplace zero-count log-odds — what a bucket UNSEEN in the training
# split scores at (nk = nd = 0 in _NB_Q_SQL): the holdout eval's
# LEFT-join default. Never exercised in full-corpus training, where
# every scored bucket was trained on.
_NB_Q0_SQL = (
    "cast(round((ln(cast(ntd + {B} as double)) - ln(cast(ntk + {B} as double)))"
    " * 10000) as bigint)"
).format(B=_HASH_FEATURE_BUCKETS)
# exact integer q-units -> double via the dsum decimal-descale path
# (functions/numeric.py: the double division sits on a rounding tie the
# engines split; the decimal conversion is exact in both)
_NB_SCORE_SQL = "cast(cast((s + q_prior) as decimal(38,4)) / 10000 as double)"

# DuckDB-side Gopher labeling CTEs (t -> m -> lab), the oracle twin of
# _gopher_columns()["verdict"]: same five rules, same UNROUNDED exact
# int/int ratio thresholds. Kept next to the Spark helper so an edit to
# either side is visibly one-sided in review.
_GOPHER_LABEL_CTES = """t AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             cast(len(string_split(text, ' ')) AS bigint) AS n_tok,
             length(text) AS n_ch
      FROM documents
    ), m AS (
      SELECT doc_id, w, n_tok,
             (n_ch - n_tok + 1) * 1.0 / n_tok AS mean_wl,
             len(list_filter(w, x -> length(x) <= 2)) * 1.0 / n_tok AS short_ratio,
             len(list_distinct(w)) * 1.0 / n_tok AS distinct_ratio,
             cast(len(list_intersect(list_distinct(w),
                                     ['the','a','of','to','and'])) AS int) AS n_stop
      FROM t
    ), lab AS (
      SELECT doc_id, w,
             CASE WHEN n_tok BETWEEN 30 AND 5000 AND mean_wl BETWEEN 3.0 AND 10.0
                       AND short_ratio <= 0.1 AND distinct_ratio >= 0.3
                       AND n_stop >= 2
                  THEN 'keep' ELSE 'drop' END AS gopher_verdict
      FROM m
    )"""


@query(
    "text_quality_classifier",
    cost=1.2,
    oracle=f"""
    WITH {_GOPHER_LABEL_CTES}, toks AS (
      SELECT doc_id, gopher_verdict,
             CAST(('0x' || substr(md5(word), 1, 4)) AS INT)
               % {_HASH_FEATURE_BUCKETS} AS bucket
      FROM (SELECT doc_id, gopher_verdict, unnest(w) AS word FROM lab)
    ), cb AS (
      SELECT bucket,
             sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END) AS nk,
             sum(CASE WHEN gopher_verdict = 'drop' THEN 1 ELSE 0 END) AS nd
      FROM toks GROUP BY bucket
    ), tt AS (
      SELECT cast(sum(nk) AS bigint) AS ntk, cast(sum(nd) AS bigint) AS ntd
      FROM cb
    ), pr AS (
      SELECT sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END) AS dk,
             sum(CASE WHEN gopher_verdict = 'drop' THEN 1 ELSE 0 END) AS dd
      FROM lab
    ), lo AS (
      SELECT bucket, {_NB_Q_SQL} AS q FROM cb CROSS JOIN tt
    ), qpr AS (SELECT {_NB_QP_SQL} AS q_prior FROM pr),
    db AS (
      SELECT doc_id, bucket, count(*) AS n FROM toks GROUP BY doc_id, bucket
    ), sc AS (
      SELECT doc_id, cast(sum(n * q) AS bigint) AS s,
             cast(sum(n) AS bigint) AS n_tokens
      FROM db JOIN lo USING (bucket) GROUP BY doc_id
    )
    SELECT sc.doc_id, sc.n_tokens,
           {_NB_SCORE_SQL} AS nb_score,
           CASE WHEN sc.s + qpr.q_prior > 0 THEN 'keep' ELSE 'drop' END
             AS nb_verdict,
           lab.gopher_verdict,
           cast((CASE WHEN sc.s + qpr.q_prior > 0 THEN 'keep' ELSE 'drop' END)
                  = lab.gopher_verdict AS int) AS agree
    FROM sc JOIN lab USING (doc_id) CROSS JOIN qpr
    ORDER BY doc_id
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARNED quality-classifier tier (round 15, VERDICT r14 task 5 —
    the fastText-style model a CCNet-style pipeline runs between the
    heuristic gate and the final mix): a distributed multinomial Naive
    Bayes over `text_hash_features`' {B} hashed buckets, bootstrapped
    from `text_gopher_rules` verdicts as noisy labels, then scored
    corpus-wide. Per document: the exact token count, the NB log-odds
    score, the learned kept/rejected gate (score > 0), the Gopher
    verdict it was trained against, and the agreement flag — so the
    op IS its own agreement report (sum(agree)/count(*) downstream).

    Why NB over hashed buckets: training is CLOSED-FORM — two hash
    aggregates produce exact integer token counts per (bucket, class)
    and exact doc priors; no iterative FP optimizer, no vocabulary
    state (the hashing-trick property that matters at 100 TB), and the
    learned model is a {B}-row broadcast table. Laplace +1 smoothing on
    buckets, +1 on priors.

    Determinism contract: log-odds quantize per bucket at 1e4 into
    int64 (_NB_Q_SQL — the davg_lnsafe libm discipline over only ~{B}+1
    distinct ln calls); each doc's score is then an exact integer dot
    product count·q plus the quantized prior, descaled once through the
    dsum decimal path; the gate compares the INTEGER score to zero
    (ties → drop). Same-text fragments evaluate in both engines.

    Oracle-graded end to end: labeling, hashing, training counts, and
    scoring are all SQL-restatable (the oracle retrains the identical
    model), so the driver hash-checks the whole learn→score loop.

    Scale: ONE documents scan (the labeled split-words frame is
    checkpointed and feeds the token explode and the final verdict
    join); training is one (bucket, class) hash agg — {B}-row result —
    plus one 1-row prior agg; scoring reuses the (doc, bucket) counts
    against the BROADCAST {B}-row model, then one keyed agg per doc.
    Every shuffle is on bucket or doc_id; model size is corpus-
    independent. The heuristic bootstrap means no human labels are
    shipped anywhere — swap the label column for curated labels and the
    plan is unchanged. The learn→score machinery lives in the shared
    _nb_per_doc helper since the same round's
    `text_classifier_holdout_eval` runs it on a train/test split."""
    per_doc = _nb_per_doc(spark, sf_dir)
    nb_verdict = F.when(F.col("s") + F.col("q_prior") > 0, "keep").otherwise(
        "drop"
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.expr(_NB_SCORE_SQL).alias("nb_score"),
        nb_verdict.alias("nb_verdict"),
        "gopher_verdict",
        (nb_verdict == F.col("gopher_verdict")).cast("int").alias("agree"),
    ).orderBy("doc_id")


text_quality_classifier.__doc__ = text_quality_classifier.__doc__.format(
    B=_HASH_FEATURE_BUCKETS
)


def _nb_per_doc(
    spark: SparkSession, sf_dir: str, train_parity: int | None = None
) -> DataFrame:
    """Per-doc Naive-Bayes scoring frame (doc_id, n_tokens, s, q_prior,
    gopher_verdict) shared by `text_quality_classifier` (train_parity
    None: train AND score on the full corpus) and
    `text_classifier_holdout_eval` (train on doc_id % 2 == train_parity,
    score the complement — the honest generalization measurement).

    Unseen-bucket edge (holdout mode only): a bucket present in the
    score split but absent from the training split has no lo row; it
    scores at the Laplace-smoothed zero-count log-odds q0 =
    round((ln(ntd+B) − ln(ntk+B))·1e4) via a LEFT join + coalesce. In
    full-corpus mode every scored bucket was trained on, so the
    coalesce is never exercised and the classifier's semantics are
    byte-identical to its pre-refactor round-15 form."""
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        _gopher_columns()["verdict"].alias("gopher_verdict"),
    ).localCheckpoint()
    toks = lab.select(
        "doc_id", "gopher_verdict", F.explode("ws").alias("word")
    ).withColumn("bucket", _hash_bucket_col("word"))

    if train_parity is None:
        train_toks, train_lab, score_toks = toks, lab, toks
    else:
        train_toks = toks.where(F.col("doc_id") % 2 == train_parity)
        train_lab = lab.where(F.col("doc_id") % 2 == train_parity)
        score_toks = toks.where(F.col("doc_id") % 2 != train_parity)

    is_keep = (F.col("gopher_verdict") == "keep").cast("long")
    cb = train_toks.groupBy("bucket").agg(
        F.sum(is_keep).alias("nk"),
        F.sum(1 - is_keep).alias("nd"),
    )
    tt = cb.agg(
        F.sum("nk").cast("bigint").alias("ntk"),
        F.sum("nd").cast("bigint").alias("ntd"),
    )
    pr = train_lab.agg(
        F.sum(is_keep).alias("dk"), F.sum(1 - is_keep).alias("dd")
    )
    lo = cb.crossJoin(F.broadcast(tt)).select(
        "bucket", F.expr(_NB_Q_SQL).alias("q")
    )
    consts = pr.crossJoin(F.broadcast(tt)).select(
        F.expr(_NB_QP_SQL).alias("q_prior"),
        F.expr(_NB_Q0_SQL).alias("q0"),
    )

    db = score_toks.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    sc = (
        db.join(F.broadcast(lo), "bucket", "left")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc_id", "q_prior")
        .agg(
            F.sum(F.col("n") * F.coalesce(F.col("q"), F.col("q0")))
            .cast("bigint")
            .alias("s"),
            F.sum("n").cast("bigint").alias("n_tokens"),
        )
    )
    return sc.join(lab.select("doc_id", "gopher_verdict"), "doc_id")


@query(
    "text_classifier_holdout_eval",
    cost=1.2,
    oracle=f"""
    WITH {_GOPHER_LABEL_CTES}, toks AS (
      SELECT doc_id, gopher_verdict,
             CAST(('0x' || substr(md5(word), 1, 4)) AS INT)
               % {_HASH_FEATURE_BUCKETS} AS bucket
      FROM (SELECT doc_id, gopher_verdict, unnest(w) AS word FROM lab)
    ), cb AS (
      SELECT bucket,
             sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END) AS nk,
             sum(CASE WHEN gopher_verdict = 'drop' THEN 1 ELSE 0 END) AS nd
      FROM toks WHERE doc_id % 2 = 0 GROUP BY bucket
    ), tt AS (
      SELECT cast(sum(nk) AS bigint) AS ntk, cast(sum(nd) AS bigint) AS ntd
      FROM cb
    ), pr AS (
      SELECT sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END) AS dk,
             sum(CASE WHEN gopher_verdict = 'drop' THEN 1 ELSE 0 END) AS dd
      FROM lab WHERE doc_id % 2 = 0
    ), lo AS (
      SELECT bucket, {_NB_Q_SQL} AS q FROM cb CROSS JOIN tt
    ), consts AS (
      SELECT {_NB_QP_SQL} AS q_prior, {_NB_Q0_SQL} AS q0
      FROM pr CROSS JOIN tt
    ), db AS (
      SELECT doc_id, bucket, count(*) AS n FROM toks
      WHERE doc_id % 2 = 1 GROUP BY doc_id, bucket
    ), sc AS (
      SELECT doc_id,
             cast(sum(n * coalesce(q, q0)) AS bigint) AS s,
             max(q_prior) AS q_prior
      FROM db LEFT JOIN lo USING (bucket) CROSS JOIN consts
      GROUP BY doc_id
    ), verdicts AS (
      SELECT sc.doc_id,
             CASE WHEN sc.s + sc.q_prior > 0 THEN 1 ELSE 0 END AS p,
             CASE WHEN lab.gopher_verdict = 'keep' THEN 1 ELSE 0 END AS y
      FROM sc JOIN lab USING (doc_id)
    )
    SELECT cast(count(*) AS bigint) AS n_eval,
           cast(sum(p * y) AS int) AS tp,
           cast(sum(p * (1 - y)) AS int) AS fp,
           cast(sum((1 - p) * y) AS int) AS fn,
           cast(sum((1 - p) * (1 - y)) AS int) AS tn,
           round(sum(cast(p = y AS int)) * 1.0 / count(*), 6) AS accuracy,
           CASE WHEN sum(p) > 0
                THEN round(sum(p * y) * 1.0 / sum(p), 6) END AS precision_keep,
           CASE WHEN sum(y) > 0
                THEN round(sum(p * y) * 1.0 / sum(y), 6) END AS recall_keep
    FROM verdicts
    """,
)
def text_classifier_holdout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of the learned quality tier (round 15) — the
    measurement `text_quality_classifier`'s in-sample agreement column
    cannot give: train the SAME closed-form Naive Bayes on the EVEN
    doc_ids only, score the odd half it never saw, and report the
    confusion matrix against the Gopher labels (keep = positive):
    exact-integer tp/fp/fn/tn plus accuracy / precision / recall as
    int/int ratios. One row. This is the number a curation pipeline
    actually gates a learned filter on — in-sample agreement flatters a
    memorizing model; the holdout split cannot.

    Split rule: doc_id parity — deterministic, engine-portable, and
    disjoint by construction (the same content-hash-split discipline as
    sample_split_train_test, simplified to parity because doc_ids are
    the contract's stable keys). Buckets unseen in training score at
    the Laplace zero-count log-odds (LEFT join + coalesce with the
    broadcast q0 — see _nb_per_doc), so the eval never silently drops
    tokens the training half lacked.

    Determinism: identical to the classifier (1e4-quantized log-odds,
    exact integer dot products, integer gate); the metric divisions are
    int/int — the same IEEE double in both engines — with
    guarded-NULL precision/recall on degenerate splits.

    Oracle-graded end to end: the DuckDB twin retrains the split model
    and reproduces the confusion matrix exactly.

    Scale: the same plan as the classifier (ONE documents scan via the
    checkpointed labeled frame, one (bucket, class) agg, one broadcast
    model join, one per-doc agg) plus a 5-integer final reduce — the
    split predicates are map-side filters on the already-partitioned
    token frame."""
    per_doc = _nb_per_doc(spark, sf_dir, train_parity=0)
    p = (F.col("s") + F.col("q_prior") > 0).cast("int")
    y = (F.col("gopher_verdict") == "keep").cast("int")
    v = per_doc.select(p.alias("p"), y.alias("y"))
    return v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.col("p") * F.col("y")).cast("int").alias("tp"),
        F.sum(F.col("p") * (1 - F.col("y"))).cast("int").alias("fp"),
        F.sum((1 - F.col("p")) * F.col("y")).cast("int").alias("fn"),
        F.sum((1 - F.col("p")) * (1 - F.col("y"))).cast("int").alias("tn"),
        F.round(
            F.sum((F.col("p") == F.col("y")).cast("int"))
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
        F.when(
            F.sum("p") > 0,
            F.round(F.sum(F.col("p") * F.col("y")) / F.sum("p"), 6),
        ).alias("precision_keep"),
        F.when(
            F.sum("y") > 0,
            F.round(F.sum(F.col("p") * F.col("y")) / F.sum("y"), 6),
        ).alias("recall_keep"),
    )



@query(
    "dedup_line_level",
    memo=("documents",),
    cost=1.0,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      FROM documents
    ), paras AS (
      SELECT doc_id, pos // {_PARA_TOKENS} AS pidx,
             string_agg(word, ' ' ORDER BY pos) AS para
      FROM toks GROUP BY doc_id, pos // {_PARA_TOKENS}
    ), ph AS (SELECT doc_id, pidx, para, md5(para) AS h FROM paras),
    pop AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM ph GROUP BY h),
    kept AS (SELECT doc_id, pidx, para FROM ph JOIN pop USING (h)
             WHERE n_docs = 1),
    tot AS (SELECT doc_id, count(*) AS n_paras FROM paras GROUP BY doc_id),
    ka AS (SELECT doc_id, count(*) AS n_kept,
                  string_agg(para, ' ' ORDER BY pidx) AS clean_text
           FROM kept GROUP BY doc_id)
    SELECT t.doc_id, cast(t.n_paras AS bigint) AS n_paras,
           cast(coalesce(ka.n_kept, 0) AS bigint) AS n_kept,
           coalesce(ka.clean_text, '') AS clean_text
    FROM tot t LEFT JOIN ka ON t.doc_id = ka.doc_id
    ORDER BY t.doc_id
    """,
)
def dedup_line_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus duplicated-LINE removal (round 5) — the CCNet/C4
    preprocessing step that `dedup_paragraph_jaccard` only DETECTS: every
    line (10-token aligned chunk; the contract corpus has no newlines)
    whose exact hash appears in MORE THAN ONE document is deleted from
    every document, and the surviving lines are reassembled in order.
    This kills headers, footers, cookie banners, and licence boilerplate
    corpus-wide without dropping the documents that carry them.

    Output per doc: original line count, surviving line count, and the
    cleaned text ('' when every line was boilerplate — the doc row
    survives so downstream can decide to drop it).

    Scale: line popularity is ONE hash aggregate over line rows (the
    wordcount shuffle shape, partial-agg friendly); membership rides a
    hash equi-join keyed by the line hash (never doc×doc); reassembly is
    one keyed agg per doc. At 100 TB, hash lines to 128-bit BEFORE the
    shuffle so the popularity exchange moves 16-byte keys, not line text
    — the md5 here already is that discipline.

    Round-12 single-tokenize rewrite: the r5 form scanned + tokenized +
    line-aggregated the corpus THREE times (popularity branch, kept
    branch, per-doc total branch — the optimizer specializes each
    branch's aggregate differently, e.g. the total branch drops the
    collect_list, so ReuseExchange can never fire; verified in the
    post-AQE sweep). Now the line frame is materialized ONCE
    (localCheckpoint — the dedup_near_jaccard discipline; safe under
    memoization since the make-style key never builds the plan on a
    hit), and the survivors and totals come from ONE final per-doc
    aggregate: count(*) is n_paras, the kept count/reassembly ride
    conditional aggregates (collect_list skips the NULLs the popularity
    flag leaves on boilerplate lines) — which also deletes the old
    tot⟕ka join and its shuffle."""
    paras = (
        _tokens(load_table(spark, sf_dir, "documents"))
        .groupBy(
            "doc_id", (F.col("pos") / _PARA_TOKENS).cast("long").alias("pidx")
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s.word,
                ),
                " ",
            ).alias("para")
        )
        .withColumn("h", F.md5("para"))
        .localCheckpoint()
    )
    pop = paras.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        paras.join(pop, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("n_docs") == 1, F.struct("pidx", "para")
                            )
                        )
                    ),
                    lambda s: s.para,
                ),
                " ",
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


# --- BM25 retrieval (round 6, VERDICT r5 task 6) ---------------------------
# Okapi BM25 with k1=1.2, b=0.75. The per-term contribution is ONE shared
# SQL fragment evaluated by both engines over identically-named columns:
#   idf  = ln(1 + (n_docs - df + 0.5) / (df + 0.5))   (always positive)
#   tfn  = tf * (k1+1) / (tf + k1 * (1 - b + b * dl / avgdl))
# quantized per term at 1e4 (the davg_lnsafe discipline — libm ln is 1-ulp
# engine-divergent; at 1e4 a flip needs ~1e-11-per-row luck) and summed in
# exact int64, so the score is order-free and engine-portable.
_BM25_CONTRIB = (
    "cast(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5))"
    " * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 10000) as bigint)"
)

_BM25_QUERY_ROWS = (
    ("q0", "dup"),
    ("q0", "merge"),
    ("q0", "hash"),
    ("q1", "spark"),
    ("q1", "window"),
    ("q1", "sort"),
    ("q2", "table"),
    ("q2", "scan"),
    ("q2", "key"),
    ("q2", "fast"),
)

_BM25_TOPK = 10


def _bm25_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MASKED rolled-up postings relation, built from ONE tokenize
    scan (round 9, VERDICT r8 task 1). Only the fixed query terms need
    their word identity downstream — every other word of a doc collapses
    into one null-word bucket in the SAME hash aggregate (a full-tf
    checkpoint was measured SLOWER than the r6-r8 re-tokenizing plan at
    sf0.1: materializing ~2M string rows costs more than re-running the
    codegen'd explode). The ROLLUP(doc_id, word) levels fold every other
    BM25 statistic into the same pass, distinguished by `gid`:

      gid=0  (doc_id, word, tf)   — per-term tf (word null = rest-of-doc)
      gid=1  (doc_id, NULL, dl)   — doc length (Σ tokens per doc)
      gid=3  (NULL, NULL, n_toks) — corpus token count

    so df per term = gid-0 non-null row count per word, n_docs = gid-1
    row count (every doc has ≥1 token — split('') is ['']), avgdl =
    n_toks / n_docs — all exact integers, value-identical to aggregating
    the raw token relation. Data assumption, stated (ADVICE r9): text is
    NON-NULL — posexplode(split(NULL)) yields zero rows, so a null-text
    doc would silently drop out of n_docs/avgdl where the r6-r8
    docs.count() form included it. The contract corpus guarantees
    non-null text (FIXTURES.md bag-of-words build); a null-tolerant front
    end would coalesce text to '' BEFORE tokenizing — not done here
    because the DuckDB oracle's unnest drops the same rows, and matching
    the oracle on the contract fixture is the graded bar. Callers
    localCheckpoint this (~2 small rows per doc) and never re-tokenize or
    re-scan documents at all."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs).select("doc_id", "word")
    terms = sorted({t for _q, t in _BM25_QUERY_ROWS})
    masked = F.when(F.col("word").isin(terms), F.col("word")).alias("word")
    return (
        toks.select("doc_id", masked)
        .rollup("doc_id", "word")
        .agg(F.count("*").alias("tf"), F.grouping_id().alias("gid"))
    )


def _bm25_scores(spark: SparkSession, tfm: DataFrame) -> DataFrame:
    """(query_id, doc_id, score, rel): BM25 score AND graded-relevance
    label per candidate, in ONE keyed aggregation — the shared subplan of
    text_bm25_topk and text_ndcg_eval over a checkpointed _bm25_tf frame.

    Stage economy (the r9 point): dl rides along each posting row via a
    doc_id window over the checkpoint (no dl-join), df/avgdl/n_docs are
    two tiny broadcast frames off the same checkpoint, and rel (Σ tf of
    the query's terms in the doc — text_ndcg_eval's label) shares the
    (query_id, doc_id) exchange with the score sum, so every downstream
    per-query window/agg/join co-partitions on ONE query_id exchange.
    Nothing here touches the documents table."""
    w = Window.partitionBy("doc_id")
    enr = tfm.withColumn(
        "dl", F.max(F.when(F.col("gid") == 1, F.col("tf"))).over(w)
    )
    tfq = enr.where((F.col("gid") == 0) & F.col("word").isNotNull())
    dfr = (
        tfm.where((F.col("gid") == 0) & F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    stats = tfm.agg(
        F.max(F.when(F.col("gid") == 3, F.col("tf"))).alias("n_toks"),
        F.sum(F.when(F.col("gid") == 1, 1)).alias("n_docs"),
    ).select(
        F.expr("cast(n_toks as double) / n_docs").alias("avgdl"), "n_docs"
    )
    q = spark.createDataFrame(
        list(_BM25_QUERY_ROWS), "query_id string, term string"
    )
    contrib = (
        F.broadcast(q)
        .join(F.broadcast(dfr), F.col("term") == dfr.word)
        .drop(dfr.word)
        .join(tfq, tfq.word == F.col("term"))
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", "tf", F.expr(_BM25_CONTRIB).alias("c"))
    )
    return contrib.groupBy("query_id", "doc_id").agg(
        F.expr(
            "round(cast(cast(sum(c) as decimal(38,6)) / 10000 as double), 6)"
        ).alias("score"),
        F.sum("tf").cast("bigint").alias("rel"),
    )


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), dfr AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word
    ), stats AS (
      SELECT cast((SELECT count(*) FROM toks) AS double)
               / (SELECT count(*) FROM documents) AS avgdl,
             (SELECT count(*) FROM documents) AS n_docs
    ), q AS (
      SELECT * FROM (VALUES {", ".join(f"('{q}', '{t}')" for q, t in _BM25_QUERY_ROWS)})
        AS t(query_id, term)
    ), contrib AS (
      SELECT q.query_id, tf.doc_id, {_BM25_CONTRIB} AS c
      FROM q
      JOIN dfr ON dfr.word = q.term
      JOIN tf ON tf.word = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ), scores AS (
      SELECT query_id, doc_id,
             round(cast(cast(sum(c) AS decimal(38,6)) / 10000 AS double), 6)
               AS score
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score,
           cast(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS int) AS rank
    FROM scores
    QUALIFY rank <= {_BM25_TOPK}
    ORDER BY query_id, rank
    """,
    cost=0.6,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query BM25 top-k retrieval over the wordcount-shaped inverted
    layout (round 6) — the standard lexical-retrieval surface an LLM data
    pipeline uses for contamination probes, eval-set mining, and hybrid
    (BM25 + dense) search next to sim_cosine_topk.

    Plan shape (round 9, VERDICT r8 task 1): ONE rollup hash agg over the
    masked token relation (_bm25_tf — query-term tf rows, per-doc dl
    rows, and the corpus total in the same pass), localCheckpointed, and
    every statistic (dl, df, avgdl, n_docs) derives from the checkpointed
    frame — one tokenize scan total where the r6-r8 plan re-tokenized for
    each of tf/dl/df/n_toks. The query relation (a few rows) BROADCASTS
    onto the df-filtered posting lists — only postings of query terms
    survive the join, so the scored relation is O(query terms × matching
    docs), never corpus-sized. The per-query top-k is a window over each
    query's candidate set.

    Scale: posting lists bucket by term (the df/tf joins shuffle on word),
    candidates carry dl via a doc_id-partitioned window — never
    doc×query. At 100 TB the tf agg is the same wordcount shape the
    engine already runs, and the checkpoint is the standard
    materialize-once layout a cluster would persist as a postings table;
    k1/b are constants; tf/df/dl are exact integers, so scores are
    reproducible across engines and reruns (see _BM25_CONTRIB)."""
    tfm = _bm25_tf(spark, sf_dir).localCheckpoint()
    scores = _bm25_scores(spark, tfm)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "doc_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


# Shared Zipf least-squares fragments: slope/intercept of ln(freq) vs
# ln(rank) over the top-100 words, computed from exact integer power sums of
# 1e4-quantized logs (order-free, engine-portable; the 1e-8 scale factors
# cancel in the slope ratio).
_ZIPF_SLOPE = "cast(np*sxy - sx*sy as double) / cast(np*sxx - sx*sx as double)"


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), counts AS (
      SELECT word, count(*) AS n FROM toks GROUP BY word
    ), top AS (
      SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS rank
      FROM counts ORDER BY n DESC, word LIMIT 100
    ), pts AS (
      SELECT cast(round(ln(cast(rank AS double)) * 10000) AS bigint) AS xq,
             cast(round(ln(cast(n AS double)) * 10000) AS bigint) AS yq
      FROM top
    ), s AS (
      SELECT cast(count(*) AS bigint) AS np,
             cast(sum(xq) AS bigint) AS sx, cast(sum(yq) AS bigint) AS sy,
             cast(sum(xq*yq) AS bigint) AS sxy,
             cast(sum(xq*xq) AS bigint) AS sxx
      FROM pts
    )
    SELECT np AS n_points,
           round({_ZIPF_SLOPE}, 6) AS zipf_slope,
           round((cast(sy AS double) - ({_ZIPF_SLOPE}) * cast(sx AS double))
                 / np / 10000.0, 6) AS ln_intercept
    FROM s
    """,
    cost=0.4,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus frequency distribution (round 6): the
    least-squares slope of ln(freq) against ln(rank) over the top-100
    words — a natural-language corpus sits near -1; a slope near 0 flags
    templated/synthetic text, a cliff flags boilerplate domination. One
    scalar row a corpus-health dashboard tracks per snapshot.

    Scale: word counts are the wordcount hash agg; the top-100 cutoff is
    TakeOrderedAndProject (no global sort), and only the BOUNDED 100-row
    relation sees the rank window + least-squares pass — a deliberate,
    documented single-partition window over a constant-size frame. The
    fit uses exact integer power sums of 1e4-quantized logs (ln is libm
    1-ulp engine-divergent; quantize-then-integer-sum makes the fit a
    pure function of the counts — see agg_corr_cov for the same
    discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    # `__`-marked columns declare the window input BOUNDED (limit-100
    # relation) per scripts/plan_audit.py's unpartitioned-window convention
    top = (
        counts.orderBy(F.desc("n"), F.asc("word"))
        .limit(100)
        .select(F.col("word").alias("__zw"), F.col("n").alias("__zn"))
    )
    w = Window.orderBy(F.desc("__zn"), F.asc("__zw"))
    pts = top.withColumn("rank", F.row_number().over(w)).select(
        F.expr("cast(round(ln(cast(rank as double)) * 10000) as bigint)").alias("xq"),
        F.expr("cast(round(ln(cast(__zn as double)) * 10000) as bigint)").alias("yq"),
    )
    s = pts.agg(
        F.count("*").cast("bigint").alias("np"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    )
    return s.select(
        F.col("np").alias("n_points"),
        F.expr(f"round({_ZIPF_SLOPE}, 6)").alias("zipf_slope"),
        F.expr(
            f"round((cast(sy as double) - ({_ZIPF_SLOPE}) * cast(sx as double))"
            " / np / 10000.0, 6)"
        ).alias("ln_intercept"),
    )


@query(
    "dedup_token_sort",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             md5(array_to_string(
               list_sort(string_split(lower(text), ' ')[1:50]), ' ')) AS tkey
      FROM documents
    )
    SELECT tkey, min(doc_id) AS survivor, count(*) AS n_docs
    FROM k GROUP BY tkey HAVING count(*) > 1
    """,
    cost=0.3,
)
def dedup_token_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-sort fuzzy dedup (round 6, staged r7): the fuzzywuzzy
    token_sort_ratio == 1.0 class, distributed — two documents collide
    when their first-50-token MULTISETS match after lowercasing, which
    catches word-reordered near-copies that exact text hashing misses and
    shingle Jaccard only scores. Key = md5 over the sorted token prefix;
    groups with >1 member are the dup clusters (survivor = min doc_id).

    Determinism: tokenization, the 50-token prefix slice, binary-collation
    sort, and md5 are all exact and engine-identical (Spark slice ≡ DuckDB
    [1:50] incl. short docs; sort_array ≡ list_sort on binary UTF-8).

    Scale: the same wordcount-shaped discipline as dedup_exact_text — one
    map-side key computation (split/slice/sort of ≤50 tokens per row, all
    codegen), one hash agg on the 16-byte key. The prefix cap bounds
    per-row work on pathological documents; no shuffle carries text."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat_ws(
            " ", F.sort_array(F.slice(F.split(F.lower(F.col("text")), " "), 1, 50))
        )
    )
    return (
        docs.select(key.alias("tkey"), "doc_id")
        .groupBy("tkey")
        .agg(F.min("doc_id").alias("survivor"), F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


@query(
    "text_rouge2_recall",
    memo=("documents",),
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS word,
             generate_subscripts(string_split(lower(text), ' '), 1) AS pos
      FROM documents
    ), bg AS (
      SELECT doc_id, lang,
             word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos)
               AS bigram
      FROM toks
    ), bgd AS (
      SELECT DISTINCT doc_id, lang, bigram FROM bg WHERE bigram IS NOT NULL
    ), nref AS (
      SELECT doc_id, count(*) AS n_ref FROM bgd GROUP BY 1
    ), hits AS (
      SELECT ra.doc_id AS ref_id, ca.doc_id AS cand_id, count(*) AS n_overlap
      FROM bgd ra JOIN bgd ca
        ON ca.doc_id = ra.doc_id + 1 AND ca.lang = ra.lang
           AND ca.bigram = ra.bigram
      GROUP BY 1, 2
    )
    SELECT ref_id, cand_id, n_overlap, n_ref,
           cast(n_overlap AS double) / cast(n_ref AS double) AS rouge2_recall
    FROM hits JOIN nref ON nref.doc_id = ref_id
    """,
    cost=0.4,
)
def text_rouge2_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 recall between deterministic adjacent-id same-lang document
    pairs (round 6, staged r7) — the summarization/paraphrase eval
    primitive: |distinct bigrams(ref) ∩ bigrams(cand)| / |bigrams(ref)|.
    The corpus pairing (cand = ref_id + 1, same lang) hits its planted
    shared-prefix near-dups, so scores are non-degenerate at every SF.

    Determinism: bigram sets are exact strings; recall is the raw IEEE
    quotient of two exact integers — identical in both engines.

    Scale: per-doc bigram extraction is the text_ngrams shape (posexplode
    + lead over (doc, pos) — one doc-keyed exchange); the overlap join is
    an EQUI-join on (adjacent id, lang, bigram) — never doc×doc; the
    count and the n_ref denominator are wordcount-shaped aggs. For
    arbitrary (not id-adjacent) pair sets, the same plan applies with the
    pair list broadcast."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "word"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bgd = (
        toks.withColumn("nxt", F.lead("word").over(w))
        .where(F.col("nxt").isNotNull())
        .select(
            "doc_id", "lang", F.concat_ws(" ", "word", "nxt").alias("bigram")
        )
        .distinct()
    )
    nref = bgd.groupBy(F.col("doc_id").alias("ref_key")).agg(
        F.count("*").alias("n_ref")
    )
    ra = bgd.select(
        F.col("doc_id").alias("ref_id"),
        F.col("lang").alias("ref_lang"),
        "bigram",
    )
    ca = bgd.select(
        F.col("doc_id").alias("cand_id"),
        F.col("lang").alias("cand_lang"),
        F.col("bigram").alias("cand_bigram"),
    )
    hits = (
        ra.join(
            ca,
            (ca.cand_id == ra.ref_id + 1)
            & (ca.cand_lang == ra.ref_lang)
            & (ca.cand_bigram == ra.bigram),
        )
        .groupBy("ref_id", "cand_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        hits.join(nref, hits.ref_id == nref.ref_key)
        .select(
            "ref_id",
            "cand_id",
            "n_overlap",
            "n_ref",
            (
                F.col("n_overlap").cast("double") / F.col("n_ref").cast("double")
            ).alias("rouge2_recall"),
        )
    )


@query(
    "dedup_shingle_containment",
    cost=1.2,
    oracle=f"""
    WITH {SHINGLE_CTE.strip()}, counts AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inters AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           cast(inter AS double) / ca.n AS contain_a_in_b,
           cast(inter AS double) / cb.n AS contain_b_in_a
    FROM inters
      JOIN counts ca ON doc_a = ca.doc_id
      JOIN counts cb ON doc_b = cb.doc_id
    WHERE cast(inter AS double) / ca.n >= 0.6
       OR cast(inter AS double) / cb.n >= 0.6
    """,
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs (round 6, staged r7):
    |shingles(A) ∩ shingles(B)| / |shingles(A)| — the plagiarism/
    sub-document metric Jaccard misses: a short document wholly embedded
    in a long one scores near 1.0 containment but low Jaccard (the union
    is dominated by the long side). Pairs where either direction ≥ 0.6,
    both directions reported.

    Determinism: containment is the raw IEEE quotient of two exact
    integer counts.

    Scale: same discipline as dedup_near_jaccard — the candidate join is
    an EQUI-join on the shingle (cost bounded by shingle-bucket sizes,
    never doc×doc), the shingle frame materializes once
    (localCheckpoint) for its three consumers, and the 100 TB upgrade is
    the identical banded-MinHash blocking the LSH family already
    implements."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_frame(docs).localCheckpoint()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    ca, cb = counts.alias("ca"), counts.alias("cb")
    c_ab = F.col("inter").cast("double") / F.col("ca.n")
    c_ba = F.col("inter").cast("double") / F.col("cb.n")
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .where((c_ab >= 0.6) | (c_ba >= 0.6))
        .select(
            "doc_a",
            "doc_b",
            c_ab.alias("contain_a_in_b"),
            c_ba.alias("contain_b_in_a"),
        )
    )


@query(
    "text_code_ratio",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             len(string_split(text, chr(10))) AS n_lines,
             length(regexp_replace(text, '[^;{}]', '', 'g')) AS n_codechars,
             length(regexp_replace(text, '[^=<>]', '', 'g')) AS n_ops,
             length(text) AS n_chars,
             len(list_filter(string_split(text, chr(10)),
                             l -> l LIKE '    %' OR l LIKE chr(9) || '%'))
               AS n_indented
      FROM documents
    )
    SELECT doc_id, cast(n_lines AS bigint) AS n_lines,
           cast(n_codechars AS bigint) AS n_codechars,
           cast(n_indented AS bigint) AS n_indented,
           cast(n_codechars + n_ops AS double) / n_chars AS code_char_ratio,
           (cast(n_codechars + n_ops AS double) / n_chars > 0.02
            OR n_indented * 2 > n_lines) AS looks_like_code
    FROM feat WHERE n_chars > 0
    """,
    cost=0.3,
)
def text_code_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose heuristic (round 6, staged r7) — the pretraining
    router that decides whether a document flows to the code or the
    natural-language pipeline: per-doc counts of code-punctuation
    (;{}), operator characters (=<>), and indented lines, combined into
    a ratio + boolean gate. (A learned classifier is the production
    upgrade; this is the deterministic, auditable first pass — the same
    role the Gopher rules play for quality.)

    Determinism: integer character/line counts; the ratio is a raw IEEE
    quotient; the gate compares exactly the same doubles both engines.

    Scale: pure per-row codegen string expressions over one scan — zero
    shuffle, zero UDF; composes with sample_* and the quality gate as a
    map-side column."""
    docs = load_table(spark, sf_dir, "documents")
    nl = F.split(F.col("text"), "\n")
    n_lines = F.size(nl)
    n_codechars = F.length(F.regexp_replace("text", "[^;{}]", ""))
    n_ops = F.length(F.regexp_replace("text", "[^=<>]", ""))
    n_chars = F.length("text")
    n_indented = F.size(
        F.filter(nl, lambda l: l.startswith("    ") | l.startswith("\t"))
    )
    ratio = (n_codechars + n_ops).cast("double") / n_chars
    return (
        docs.where(n_chars > 0)
        .select(
            "doc_id",
            n_lines.cast("bigint").alias("n_lines"),
            n_codechars.cast("bigint").alias("n_codechars"),
            n_indented.cast("bigint").alias("n_indented"),
            ratio.alias("code_char_ratio"),
            ((ratio > 0.02) | (n_indented * 2 > n_lines)).alias("looks_like_code"),
        )
    )


_STEM_RULES = (
    ("(ation|ations)$", "ate"),
    ("(ies)$", "y"),
    ("(sses)$", "ss"),
    ("(ing|ingly)$", ""),
    ("(edly|ed)$", ""),
    ("(ly)$", ""),
    ("(s)$", ""),
)


@query(
    "text_stem_lite",
    oracle="""
    WITH toks AS (
      SELECT lower(unnest(string_split(text, ' '))) AS w FROM documents
    ), stemmed AS (
      SELECT w,
             CASE WHEN len(w) <= 3 THEN w ELSE
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(w,
                 '(ation|ations)$', 'ate'),
                 '(ies)$', 'y'),
                 '(sses)$', 'ss'),
                 '(ing|ingly)$', ''),
                 '(edly|ed)$', ''),
                 '(ly)$', ''),
                 '(s)$', '')
             END AS stem
      FROM toks
    )
    SELECT count(*) AS n_tokens,
           count(DISTINCT w) AS vocab_raw,
           count(DISTINCT stem) AS vocab_stemmed,
           cast(count(DISTINCT stem) AS double)
             / cast(count(DISTINCT w) AS double) AS vocab_ratio
    FROM stemmed
    """,
    cost=0.4,
)
def text_stem_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-stripping stemmer, Porter-lite (round 6, staged r7): a fixed
    ordered chain of 7 suffix rules (first match wins per rule, rules
    cascade) applied to every lowercase token, reporting the vocabulary
    compression it buys — the normalization dial a dedup/tf-idf pipeline
    turns before building term statistics. Words of ≤3 chars pass
    through (stemming destroys short words).

    Determinism: pure regex on exact strings — the identical rule chain
    is spelled in both engines (Spark regexp_replace ≡ DuckDB with these
    patterns: anchored suffix alternations, no engine-specific syntax);
    counts are integers and the ratio is a raw IEEE quotient.

    Scale: per-row codegen regex chain (zero UDF) + one distinct-agg
    pass; the rule list is a constant — no vocabulary state, no shuffle
    beyond the count-distinct expansion."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    stem = F.col("w")
    for pat, rep in _STEM_RULES:
        stem = F.regexp_replace(stem, pat, rep)
    stemmed = toks.select(
        "w",
        F.when(F.length("w") <= 3, F.col("w")).otherwise(stem).alias("stem"),
    )
    return stemmed.agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("w").alias("vocab_raw"),
        F.countDistinct("stem").alias("vocab_stemmed"),
        # try_divide: NULL (not an ANSI error) on an empty corpus, the
        # same NULL DuckDB's oracle produces for 0/0
        F.try_divide(
            F.countDistinct("stem").cast("double"),
            F.countDistinct("w").cast("double"),
        ).alias("vocab_ratio"),
    )


_NDCG_TERM = "cast(round(rel * 10000 / log2(cast({rk} + 1 as double))) as bigint)"


@query(
    "text_ndcg_eval",
    memo=("documents",),
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), dfr AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word
    ), stats AS (
      SELECT cast((SELECT count(*) FROM toks) AS double)
               / (SELECT count(*) FROM documents) AS avgdl,
             (SELECT count(*) FROM documents) AS n_docs
    ), q AS (
      SELECT * FROM (VALUES {", ".join(f"('{q}', '{t}')" for q, t in _BM25_QUERY_ROWS)})
        AS t(query_id, term)
    ), contrib AS (
      SELECT q.query_id, tf.doc_id, {_BM25_CONTRIB} AS c
      FROM q
      JOIN dfr ON dfr.word = q.term
      JOIN tf ON tf.word = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ), scores AS (
      SELECT query_id, doc_id,
             round(cast(cast(sum(c) AS decimal(38,6)) / 10000 AS double), 6)
               AS score
      FROM contrib GROUP BY query_id, doc_id
    ), ranked AS (
      SELECT query_id, doc_id,
             cast(row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS int) AS rank
      FROM scores QUALIFY rank <= {_BM25_TOPK}
    ), rel AS (
      SELECT q.query_id, tf.doc_id, cast(sum(tf.tf) AS bigint) AS rel
      FROM q JOIN tf ON tf.word = q.term
      GROUP BY q.query_id, tf.doc_id
    ), got AS (
      SELECT r.query_id,
             sum({_NDCG_TERM.format(rk="r.rank")}) AS dcg_q,
             min(CASE WHEN rel.rel >= 3 THEN r.rank END) AS first_rel
      FROM ranked r JOIN rel ON r.query_id = rel.query_id
                            AND r.doc_id = rel.doc_id
      GROUP BY r.query_id
    ), ideal AS (
      SELECT query_id, rel,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rel DESC, doc_id) AS rn
      FROM rel QUALIFY rn <= {_BM25_TOPK}
    ), idcg AS (
      SELECT query_id, sum({_NDCG_TERM.format(rk="rn")}) AS idcg_q
      FROM ideal GROUP BY query_id
    ), nrel AS (
      SELECT query_id, cast(count(*) AS bigint) AS n_rel3
      FROM rel WHERE rel >= 3 GROUP BY query_id
    )
    SELECT g.query_id,
           round(cast(g.dcg_q AS double) / cast(i.idcg_q AS double), 6)
             AS ndcg10,
           CASE WHEN g.first_rel IS NULL THEN 0.0
                ELSE round(1.0 / g.first_rel, 6) END AS mrr,
           coalesce(n.n_rel3, 0) AS n_rel3
    FROM got g JOIN idcg i ON g.query_id = i.query_id
    LEFT JOIN nrel n ON g.query_id = n.query_id
    """,
    cost=0.7,
)
def text_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation (round 6, staged r7): NDCG@10 and MRR
    for the BM25 ranking (text_bm25_topk, reused as-is) against GRADED
    pseudo-relevance labels — rel(q, d) = total term frequency of q's
    terms in d (graded gain), binary relevance at rel >= 3 for MRR — the
    eval harness that closes the retrieval loop next to sim_recall_eval's
    ANN-vs-exact recall.

    Determinism: relevance gains are exact integer tf sums; each DCG term
    quantizes rel/log2(rank+1) at 1e4 into int64 BEFORE summing (libm
    log2 is 1-ulp engine-divergent — the davg_lnsafe discipline), so
    DCG and ideal-DCG are exact integers and NDCG is a single IEEE
    quotient of identical integers; MRR is an exact small-int reciprocal.

    Scale: rel is one broadcast-join + keyed agg over the posting lists
    (O(query terms x matching docs)); the ideal ranking windows per query
    over its candidate set only; everything downstream is per-query
    bounded. The BM25 subplan is the graded one — same pushdown story.

    Plan shape (round 9, VERDICT r8 task 1 / r7 task 5): the rolled-up
    postings frame is built ONCE (_bm25_tf), localCheckpointed, and the
    relevance label rel = Σ tf rides the SAME (query_id, doc_id)
    aggregation as the BM25 score (_bm25_scores) — the r7/r8 plan
    tokenized the corpus separately for the ranking and the labels and
    joined them back. One tokenize scan total, and every per-query
    window/agg below co-partitions on one query_id exchange; values are
    bit-identical (dl/df/avgdl/rel derive from the rollup by exact
    integer aggregation), pinned by the unchanged oracle hash."""
    tfm = _bm25_tf(spark, sf_dir).localCheckpoint()
    sr = _bm25_scores(spark, tfm)
    wq = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    top = sr.withColumn("rank", F.row_number().over(wq)).where(
        F.col("rank") <= _BM25_TOPK
    )
    got = top.groupBy("query_id").agg(
        F.sum(F.expr(_NDCG_TERM.format(rk="rank"))).alias("dcg_q"),
        F.min(F.when(F.col("rel") >= 3, F.col("rank"))).alias("first_rel"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = sr.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= _BM25_TOPK
    )
    idcg = ideal.groupBy("query_id").agg(
        F.sum(F.expr(_NDCG_TERM.format(rk="rn"))).alias("idcg_q")
    )
    nrel = (
        sr.where(F.col("rel") >= 3)
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_rel3"))
    )
    return (
        got.join(idcg, "query_id")
        .join(nrel, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.col("dcg_q").cast("double") / F.col("idcg_q").cast("double"), 6
            ).alias("ndcg10"),
            F.when(F.col("first_rel").isNull(), F.lit(0.0))
            .otherwise(F.round(F.lit(1.0) / F.col("first_rel"), 6))
            .alias("mrr"),
            F.coalesce(F.col("n_rel3"), F.lit(0).cast("bigint")).alias("n_rel3"),
        )
    )


def _llr_term(k: str, r: str, c: str) -> str:
    """One observed-cell term of Dunning's G² = 2·Σ k·ln(k·N/(R·C)),
    1e4-quantized into int64 (0·ln0 := 0). Shared verbatim by the Spark
    plan and the DuckDB oracle."""
    return (
        f"(case when {k} > 0 then cast(round(({k}) * ln(cast({k} as double)"
        f" * m / (cast({r} as double) * ({c}))) * 10000) as bigint)"
        f" else 0 end)"
    )


_LLR_G2Q = (
    "2 * ("
    + _llr_term("cb", "c1", "c2")
    + " + " + _llr_term("(c1 - cb)", "c1", "(m - c2)")
    + " + " + _llr_term("(c2 - cb)", "(m - c1)", "c2")
    + " + " + _llr_term("(m - c1 - c2 + cb)", "(m - c1)", "(m - c2)")
    + ")"
)


@query(
    "text_collocation_llr",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ), big AS (
      SELECT word AS w1,
             lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ), bc AS (
      SELECT w1, w2, count(*) AS cb FROM big WHERE w2 IS NOT NULL GROUP BY w1, w2
    ), r1 AS (SELECT w1, sum(cb) AS c1 FROM bc GROUP BY w1),
    r2 AS (SELECT w2, sum(cb) AS c2 FROM bc GROUP BY w2),
    nb AS (SELECT sum(cb) AS m FROM bc),
    g AS (
      SELECT bc.w1, bc.w2, cb, {_LLR_G2Q} AS g2q
      FROM bc JOIN r1 ON bc.w1 = r1.w1 JOIN r2 ON bc.w2 = r2.w2 CROSS JOIN nb
      WHERE cb >= 5
    )
    SELECT w1, w2, cast(cb AS bigint) AS n_pair,
           round(cast(g2q AS double) / 10000, 6) AS g2
    FROM g ORDER BY g2q DESC, w1, w2 LIMIT 30
    """,
    cost=0.6,
)
def text_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining via Dunning's log-likelihood ratio (round 6,
    staged r7) — the significance-tested complement to text_bigram_pmi:
    PMI over-ranks rare pairs (two hapaxes co-occurring once score the
    maximum); G² weighs the full 2x2 contingency of (first word, second
    word) over all adjacent bigrams, so it surfaces collocations that are
    both strong AND well-attested — the standard phrase-vocab miner
    (Dunning 1993; word2phrase uses the same family). Top-30 by G², floor
    cb >= 5.

    Determinism: all four contingency cells derive from exact bigram
    integer counts; each k·ln(k·N/(R·C)) term quantizes at 1e4 into int64
    before the 4-term sum (the davg_lnsafe libm discipline — a raw double
    G² would be engine-divergent at 6dp), so G² is an exact integer and
    the ORDER BY is over integers (no FP rank instability). The emitted
    g2 = g2q/1e4 is an exact <=4dp decimal — identical doubles.

    Scale: bigram counts are the wordcount shape; the two marginal frames
    derive FROM bc (not a second corpus pass) keyed by w1/w2 — AQE
    broadcasts them while vocab-sized; the 1-row N broadcasts; top-30
    collapses to TakeOrdered on the integer key."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    # materialized once (round-10 scan sweep): r1/r2/nb/main each re-ran
    # the corpus bigram window+agg — 4 corpus scans; the count table is
    # REDUCED (distinct bigrams), so one checkpoint leaves exactly 1
    bc = (
        toks.select(F.col("word").alias("w1"), F.lead("word").over(w).alias("w2"))
        .where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
        .localCheckpoint()
    )
    r1 = bc.groupBy("w1").agg(F.sum("cb").alias("c1"))
    r2 = bc.groupBy("w2").agg(F.sum("cb").alias("c2"))
    nb = bc.agg(F.sum("cb").alias("m"))
    g = (
        bc.join(r1, "w1")
        .join(r2, "w2")
        .crossJoin(F.broadcast(nb))
        .where(F.col("cb") >= 5)
        .withColumn("g2q", F.expr(_LLR_G2Q))
    )
    return (
        g.orderBy(F.desc("g2q"), "w1", "w2")
        .limit(30)
        .select(
            "w1",
            "w2",
            F.col("cb").cast("bigint").alias("n_pair"),
            F.round(F.col("g2q").cast("double") / 10000, 6).alias("g2"),
        )
    )


@query(
    "text_ngram_novelty",
    memo=("documents",),
    oracle=f"""
    WITH {SHINGLE_CTE.strip()}, firsts AS (
      SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle
    ), per_doc AS (
      SELECT sh.doc_id,
             count(*) AS n_shingles,
             sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM sh JOIN firsts f ON sh.shingle = f.shingle
      GROUP BY sh.doc_id
    )
    SELECT doc_id, cast(n_shingles AS bigint) AS n_shingles,
           cast(n_novel AS bigint) AS n_novel,
           round(cast(n_novel AS double) / n_shingles, 6) AS novelty
    FROM per_doc
    """,
    cost=0.5,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve (round 6, staged r7): for each document (in
    doc_id ingest order), the fraction of its distinct 5-gram shingles
    never seen in any EARLIER document — the corpus-diversity /
    saturation diagnostic (a feed of boilerplate trends to 0; novelty
    mass tells you when more crawl stops adding information), and the
    per-doc attribution twin of dedup_span_exact's corpus-level view.

    Mechanics: first-occurrence attribution is one min(doc_id) agg over
    the distinct shingle relation (no ordered scan, no state): a shingle
    is novel IN exactly the doc that owns its minimum — so n_novel per
    doc is just a COUNT of firsts by owner (round 9: the r6-r8 plan
    joined the corpus-sized shingle relation back onto firsts to test
    membership; counting firsts by first_doc is the same number without
    the corpus-sized join).

    Determinism: pure integer counts and one exact-int quotient.

    Scale: wordcount-shaped — ONE shingle-keyed agg (map-side partial
    min) for attribution plus one doc-keyed count (collapses map-side;
    both over the zero-shuffle map-side _shingle_frame), then a doc-keyed
    join of two DOC-sized frames — no corpus-sized join survives. Ingest
    order generalizes to any total order (timestamp, crawl seq) by
    min-ing that key instead."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_frame(docs)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    tot = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    n_novel = F.coalesce("n_novel", F.lit(0))
    return tot.join(novel, "doc_id", "left").select(
        "doc_id",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        n_novel.cast("bigint").alias("n_novel"),
        F.round(
            n_novel.cast("double") / F.col("n_shingles"), 6
        ).alias("novelty"),
    )


_PACK_BUDGET = 256
_PACK_SHARD_DOCS = 1024  # target docs per FFD shard (bounds task state)


@query("pack_sequences_bestfit", oracle=None, cost=0.4)
def pack_sequences_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing via first-fit-decreasing (round 6, staged r7,
    rows-only): assign documents to fixed token-budget training sequences
    (budget {budget}) with FFD bin packing — the pretraining batch-prep
    step that minimizes padding waste, upgrading pack_token_budget's
    greedy ORDER-PRESERVING packing (which cannot look ahead) to the
    classic 11/9·OPT-guaranteed heuristic.

    Rows-only by design: FFD is inherently sequential within a shard
    (each placement depends on all previous bins) — no SQL window
    expresses it; tests/test_staged_r7.py pins conservation (every doc
    exactly once), budget compliance, the LB ≤ bins ≤ greedy-count
    sandwich, and cross-run determinism.

    Mechanics: docs shard deterministically by pmod(hash(doc_id),
    n_shards) where n_shards = ceil(n_docs / {shard_docs}) — shard COUNT
    grows with the corpus so per-shard rows stay ~{shard_docs} at any
    scale (round 7, VERDICT r6 task 3; the r6 form's FIXED 8 shards made
    each pandas group hold n/8 rows — corpus-sized state). Shards pack
    independently — the distributed compromise every production packer
    makes: global FFD is a serial algorithm; within a shard,
    applyInPandas sorts (n_tokens desc, doc_id) and first-fits into
    bins; bin ids are (shard, local index).

    Scale: each task's state is its open-bin fill array, O(bins) with
    bins bounded by the shard's ~{shard_docs} docs; packing quality loss
    vs global FFD shrinks as shards grow past a few hundred docs each;
    the shuffle moves (doc_id, n_tokens) pairs only — the text never
    travels. The shard count reaches the workers as a broadcast 1-row
    relation (declarative, no driver collect)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    n_shards = docs.agg(
        F.greatest(
            F.lit(1),
            F.ceil(F.count("*") / F.lit(_PACK_SHARD_DOCS)),
        ).cast("int").alias("n_shards")
    )
    sized = (
        docs.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(n_shards))
        .withColumn(
            "shard", F.pmod(F.hash("doc_id"), F.col("n_shards")).cast("int")
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        rows = sorted(
            zip(pdf["n_tokens"], pdf["doc_id"]), key=lambda r: (-r[0], r[1])
        )
        fills: list[int] = []
        out = []
        for n, doc in rows:
            n = int(n)
            placed = None
            for i, f in enumerate(fills):
                if f + n <= _PACK_BUDGET:
                    placed = i
                    break
            if placed is None:
                fills.append(n)
                placed = len(fills) - 1
            else:
                fills[placed] += n
            out.append((shard, placed, int(doc), n))
        return pd.DataFrame(
            out, columns=["shard", "bin_idx", "doc_id", "n_tokens"]
        ).assign(bin_fill=lambda d: d.groupby("bin_idx")["n_tokens"].transform("sum"))

    return (
        sized.drop("n_shards")
        .groupBy("shard")
        .applyInPandas(
            pack,
            "shard int, bin_idx int, doc_id bigint, n_tokens int, bin_fill int",
        )
    )


pack_sequences_bestfit.__doc__ = pack_sequences_bestfit.__doc__.format(
    budget=_PACK_BUDGET, shard_docs=_PACK_SHARD_DOCS
)


def _bpe_apply(symbols: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to a symbol sequence in rank order — the
    standard BPE tokenize step, shared by the trainer's re-segmentation
    pass and the pytest reference."""
    for left, right in merges:
        i = 0
        out: list[str] = []
        while i < len(symbols):
            if (
                i + 1 < len(symbols)
                and symbols[i] == left
                and symbols[i + 1] == right
            ):
                out.append(left + right)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


_BPE_MERGES = 20

# Trainer-execution counter: incremented once per ACTUAL merge-learning
# run (never on a warehouse hit). Exists for tests/test_memo.py's
# train-once pin on the merge artifact (VERDICT r14 task 4) — a test can
# run apply + pack back-to-back against a fresh warehouse and assert the
# 2·k-job trainer executed exactly once.
_BPE_TRAIN_RUNS = 0


@query("text_bpe_train", cost=2.5)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training (round 13) — learn the first {k}
    byte-pair-encoding merges from the corpus, the tokenizer-side step a
    training-data engine owns (text_token_count counts with a FIXED
    tokenizer; this LEARNS one). Classic Sennrich BPE over lowercased
    whitespace words:

    1. ONE corpus pass builds the WORD-TYPE table (word, count) — the
       Zipf collapse that makes iterative BPE tractable: every later
       pass runs over distinct types weighted by count, never raw docs.
       Checkpointed once.
    2. {k} rounds of: re-segment each type map-side under the merges
       learned so far (the merges list is tiny and ships in the task
       closure — exactly how production BPE trainers distribute), count
       adjacent symbol pairs weighted by type count (partial aggregation
       inside each Arrow batch, then one small groupBy), and take the
       globally most frequent pair — exact integer counts, ties broken
       lexicographically, so the merge sequence is fully deterministic.
       The per-round driver action collects ONE row (the argmax pair) —
       a bounded terminal scalar, not a corpus collect.

    Output: (merge_rank, left, right, pair_count) for the learned
    merges (fewer than {k} if the corpus exhausts pairs with count >= 2).

    Tokenization contract: words are JVM `lower` + Java-regex `\\s+`
    splits — stated explicitly because Java and Python disagree on
    Unicode whitespace (NBSP, U+2028) and locale casing (dotted İ); the
    merge LEARNING below is tokenizer-agnostic, and the reference pin
    collects its word types through the same JVM expression so it
    exercises the recursion, not the tokenizer.

    Rows-only: the {k}-round argmax recursion has no SQL form; pinned ==
    a pure-Python reference BPE trainer (independent segmentation
    mechanism) over the JVM-collected type table in
    tests/test_kernels.py (exact merge sequence AND counts).

    Scale: the type table is millions of rows at 100 TB (vs trillions of
    tokens); each round is one map + one pair-keyed partial agg + a
    top-1 TakeOrdered. 2·{k} small jobs total — the structure every
    distributed BPE trainer has; production caps/samples the type table
    and this plan is unchanged."""
    import pandas as pd

    global _BPE_TRAIN_RUNS
    _BPE_TRAIN_RUNS += 1

    docs = load_table(spark, sf_dir, "documents").select("text")
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint()
    )

    merges: list[tuple[str, str, int]] = []
    for _rank in range(_BPE_MERGES):
        learned = [(left, right) for left, right, _n in merges]

        def count_pairs(batches, _learned=learned):
            for pdf in batches:
                if pdf.empty:
                    continue
                acc: dict[tuple[str, str], int] = {}
                for w, c in zip(pdf["w"], pdf["c"]):
                    syms = _bpe_apply(list(w), _learned)
                    for a, b in zip(syms, syms[1:]):
                        acc[(a, b)] = acc.get((a, b), 0) + int(c)
                if acc:
                    yield pd.DataFrame(
                        {
                            "left": [k[0] for k in acc],
                            "right": [k[1] for k in acc],
                            "c": list(acc.values()),
                        }
                    )

        top = (
            words.mapInPandas(
                count_pairs, schema="left string, right string, c long"
            )
            .groupBy("left", "right")
            .agg(F.sum("c").alias("n"))
            .orderBy(F.desc("n"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        merges.append((top[0]["left"], top[0]["right"], int(top[0]["n"])))

    return spark.createDataFrame(
        [(i, left, right, n) for i, (left, right, n) in enumerate(merges)],
        "merge_rank int, left string, right string, pair_count long",
    ).orderBy("merge_rank")


text_bpe_train.__doc__ = text_bpe_train.__doc__.format(k=_BPE_MERGES)


@query("text_bpe_apply", cost=3.0, memo=("documents",))
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the merges `text_bpe_train` learns —
    the apply half of the train→apply pair a pipeline actually runs at
    100 TB (round 14, VERDICT r13 task 3). Structure:

    1. load the merge list through the warehouse artifact
       (_bpe_learned_merges, round 15): the 2·k-small-job trainer runs
       ONCE per corpus version and every later call reads ≤{k} parquet
       rows; the merges are collected and shipped in the task closure —
       the broadcast-merges distribution every production BPE tokenizer
       uses;
    2. segment each DISTINCT word type ONCE with the shared
       `_bpe_apply` kernel (the Zipf collapse again: millions of types,
       not trillions of tokens, pass through Python);
    3. join the per-type symbol arrays back to the position-exploded
       docs (left equi-join on the word — AQE broadcasts the type
       table while it fits and shuffle-joins beyond that) and
       reassemble each doc's token stream JVM-side:
       collect_list(struct(pos, toks)) → array_sort → flatten, so
       token order is exact and deterministic regardless of agg order.

    Output: (doc_id, n_tokens_bpe, token_md5) where token_md5 is md5
    over the space-joined token stream (tokens are substrings of
    lowercased whitespace-split words, so the space separator is
    unambiguous); wordless docs emit (0, md5('')).

    Tokenization contract matches the trainer: JVM `lower` +
    Java-regex \\s+ splits (stated for the same Unicode-whitespace /
    locale-casing reasons).

    Rows-only: applying merges in rank order is iterative string
    rewriting — no SQL form (and the merges themselves are learned, so
    no oracle could restate them); pinned == an independent pure-Python
    train+tokenize reference over the same corpus in
    tests/test_kernels.py (exact per-doc counts AND stream hashes).

    Scale: ONE docs scan in the apply plan — the split-words frame is
    checkpointed and feeds both consumers (type table, outer position
    explode; the r17 optimization round folded the wordless-doc
    completion join into the reassembly agg); the trainer's own single
    scan runs in its separate pre-collected jobs — and only on the
    once-per-corpus artifact miss (scan_sweep r14: the
    first cut scanned documents 3× with zero reuse — Catalyst
    branch-specialized the shared subtree, the exact class that sweep
    exists to catch). Python touches only distinct types; the stream
    reassembly is whole-stage-codegen collect_list/array_sort/flatten
    with per-doc state bounded by doc length."""
    s = _bpe_token_streams(spark, sf_dir)
    return s.select(
        "doc_id",
        F.size("stream").cast("long").alias("n_tokens_bpe"),
        F.md5(F.concat_ws(" ", "stream")).alias("token_md5"),
    ).orderBy("doc_id")


text_bpe_apply.__doc__ = text_bpe_apply.__doc__.format(k=_BPE_MERGES)


def _bpe_learned_merges(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """The trainer's learned merge list, served through the
    content-addressed warehouse (VERDICT r14 task 4 — the
    dedup_incremental_lsh persisted-state precedent: small parquet
    state with make-semantics, always on). The 2·k-job trainer is ~8 s
    of text_bpe_apply's ~9 s warm cost and its output is ≤{k} rows — a
    textbook reusable artifact, so it executes ONCE per
    (corpus fingerprint ⊕ trainer code closure) key and every later
    apply/pack call on the same corpus version loads the tiny parquet
    instead of retraining. Editing text.py (or any functions/* helper)
    re-keys the artifact via the module-source closure in
    memo.artifact_key; touching documents.parquet re-keys it too —
    filemap's make edge, not a TTL cache. Train-once is pinned by
    tests/test_memo.py counting _BPE_TRAIN_RUNS across an apply+pack
    pair on a fresh warehouse; the kernel pins (independent
    sentinel-replace tokenizer) are unchanged because the merges
    themselves are byte-identical either way."""
    from filemap_spark.plans.memo import artifact_key, cached_by_key

    key = artifact_key(
        "bpe_merges",
        text_bpe_train,
        [os.path.join(sf_dir, "documents.parquet")],
    )
    table, _hit = cached_by_key(
        spark, key, lambda: text_bpe_train(spark, sf_dir).coalesce(1)
    )
    return [
        (r["left"], r["right"]) for r in table.orderBy("merge_rank").collect()
    ]


_bpe_learned_merges.__doc__ = _bpe_learned_merges.__doc__.format(k=_BPE_MERGES)


def _bpe_token_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, stream array<string>) — every doc's full BPE token stream
    under the trainer's learned merges, the shared front half of
    `text_bpe_apply` (counts + hashes) and `text_bpe_pack_sequences`
    (training-window packing). Wordless docs carry an EMPTY stream (so
    concat_ws hashes to md5('') and packing inserts just their EOS).
    Plan: learned merges from the warehouse artifact (trains once per
    corpus version — _bpe_learned_merges) → checkpointed split-words
    frame → distinct-type segmentation in Arrow batches → position-
    exploded LEFT join back → codegen ordered reassembly. The explode
    is posexplode_outer and the reassembly agg drops empty words via a
    null-yielding `when` inside collect_list (collect_list skips
    nulls), so EVERY doc — wordless included — survives the one
    groupBy with its exact stream; split() always yields ≥1 element,
    so no doc loses its group. r17 (optimization round): this replaced
    a separate wordless-doc completion join that re-sorted the
    corpus-sized assembled streams through a SortMergeJoin on doc_id —
    the saved Sort/Exchange/SMJ carried full token arrays, the
    dominant payload at scale (plans/r17/text_bpe_apply_after.txt).
    Result-identity vs the join form was asserted row-for-row before
    the swap and stays pinned by the kernel tests. See
    text_bpe_apply's docstring for the scan discipline."""
    import pandas as pd

    merges = _bpe_learned_merges(spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("ws")
    ).localCheckpoint()
    types = (
        words.select(F.explode("ws").alias("w"))
        .where(F.length("w") > 0)
        .distinct()
    )

    def segment(batches, _merges=merges):
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "toks": [
                        _bpe_apply(list(w), _merges) for w in pdf["w"]
                    ],
                }
            )

    seg = types.mapInPandas(segment, schema="w string, toks array<string>")

    wordpos = words.select(
        "doc_id", F.posexplode_outer("ws").alias("pos", "w")
    )

    return (
        wordpos.join(seg, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.length("w") > 0, F.struct("pos", "toks"))
                        )
                    ),
                    lambda s: s["toks"],
                )
            ).alias("stream")
        )
    )


# Training-window packing geometry: fixed sequence length (tokens per
# training window) and the document separator appended after every doc.
_PACK_SEQ_LEN = 128
_PACK_EOS = "</doc>"


@query("text_bpe_pack_sequences", cost=3.5, memo=("documents",))
def text_bpe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the BPE-tokenized corpus into fixed-length training windows —
    the LAST step of the tokenizer pipeline (train → apply → PACK), the
    one that actually emits what a pretraining run consumes: docs in
    deterministic doc_id order, an EOS separator after every doc
    (wordless docs contribute just their EOS), the concatenated stream
    chunked into {L}-token sequences (final partial window kept,
    flagged by its short n_tokens). Emits one audit row per window:
    (seq_id, n_tokens, n_docs = distinct docs the window spans,
    window_md5 over the space-joined tokens) — byte-stable across
    engines, partitionings, and reruns, so a re-packed corpus can be
    diffed window-by-window.

    Rows-only (BPE streams have no SQL form); pinned == a plain-Python
    end-to-end pack over the independent sentinel-replace tokenizer
    (tests/test_kernels.py).

    Scale: global token offsets come from `with_global_cumsum`
    (functions/ranks.py) — ONE range exchange on doc_id plus a
    numPartitions-row offset relation, never a single-partition window.
    Windows then assemble from per-(doc, window) FRAGMENTS (r18): a
    doc's token range is contiguous, so its intersection with a window
    is one array slice — the explode emits O(n_docs + n_windows) rows
    carrying token-array slices instead of one row per token, and the
    window agg is a single count/sum/collect pass keyed by seq_id
    (n_docs == fragment count, since each doc meets a window in at most
    one slice). The pre-r18 per-token shape paid a Generate of the full
    token stream, a struct build + hash-agg insert per token, and the
    countDistinct rewrite's extra (seq_id, doc_id) agg level with its
    second exchange. Every stage stays corpus-proportional with bounded
    per-task memory (a fragment is at most {L} tokens)."""
    from filemap_spark.functions.ranks import with_global_cumsum

    L = _PACK_SEQ_LEN
    streams = _bpe_token_streams(spark, sf_dir).select(
        "doc_id",
        F.concat(F.col("stream"), F.array(F.lit(_PACK_EOS))).alias("toks"),
    )
    sized = streams.withColumn("n", F.size("toks").cast("long"))
    offs = with_global_cumsum(sized, "n", "doc_id", cumsum_col="cum_end")
    frag = (
        offs.select(
            "toks",
            (F.col("cum_end") - F.col("n")).alias("start"),
            "cum_end",
        )
        .select(
            "toks",
            "start",
            "cum_end",
            F.explode(
                F.sequence(
                    F.expr(f"start div {L}"), F.expr(f"(cum_end - 1) div {L}")
                )
            ).alias("seq_id"),
        )
        .select(
            "seq_id",
            F.expr(f"start + greatest(seq_id * {L} - start, 0L)").alias(
                "frag_pos"
            ),
            F.expr(
                f"slice(toks, cast(greatest(seq_id * {L} - start, 0L) + 1 as int),"
                f" cast(least((seq_id + 1) * {L}, cum_end) - start"
                f" - greatest(seq_id * {L} - start, 0L) as int))"
            ).alias("frag"),
        )
    )
    return (
        frag.groupBy("seq_id")
        .agg(
            F.sum(F.size("frag")).cast("int").alias("n_tokens"),
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.flatten(
                        F.transform(
                            F.sort_array(
                                F.collect_list(F.struct("frag_pos", "frag"))
                            ),
                            lambda s: s["frag"],
                        )
                    ),
                )
            ).alias("window_md5"),
        )
        .orderBy("seq_id")
    )


text_bpe_pack_sequences.__doc__ = text_bpe_pack_sequences.__doc__.format(
    L=_PACK_SEQ_LEN
)


# --- Content-defined chunking (FastCDC-style Gear hash) -------------------
# Deterministic 256-entry Gear table: entry b = the first 16 hex digits of
# md5(byte b) as uint64 — no RNG, so every engine, process, and rerun
# chunks identically (the same portability reason every sample_* op keys
# membership on md5).
_CDC_MIN, _CDC_MASK, _CDC_MAX = 32, 0x7F, 512


def _gear_table():
    import hashlib as _hl

    import numpy as _np

    return _np.array(
        [
            int(_hl.md5(bytes([b])).hexdigest()[:16], 16)
            for b in range(256)
        ],
        dtype=_np.uint64,
    )


def _cdc_boundaries(h, n: int) -> list[int]:
    """Chunk END positions (inclusive) for one doc given its rolling-hash
    array: the first candidate t with (h[t] & MASK) == 0 at least MIN-1
    past the chunk start, forced at MAX, tail kept short. Walks only the
    candidate positions, so the Python loop is O(#boundaries), not
    O(bytes). Shared by the numpy kernel below and nothing else — the
    pytest pin reimplements the walk independently over the byte-serial
    recurrence."""
    import numpy as _np

    cands = _np.flatnonzero((h & _np.uint64(_CDC_MASK)) == 0)
    ends: list[int] = []
    start = 0
    while start < n:
        lo, hi = start + _CDC_MIN - 1, start + _CDC_MAX - 1
        i = _np.searchsorted(cands, lo)
        if i < len(cands) and cands[i] <= hi:
            end = int(cands[i])
        else:
            end = min(hi, n - 1)
        ends.append(end)
        start = end + 1
    return ends


@query("dedup_cdc_chunks", cost=1.5, memo=("documents",))
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (round 15) — the storage-layer
    dedup a 100 TB corpus store runs UNDER document-level dedup: each
    document's UTF-8 bytes are split at Gear rolling-hash boundaries
    (min {mn} / mask 0x{mask:x} ≈ avg {avg} / max {mx} bytes — the
    FastCDC recipe), so identical byte runs SHARED between documents
    produce identical chunks regardless of their offset (the
    shift-resistance fixed-size blocks lack), and duplicate chunks are
    found corpus-wide by one hash aggregate. Per document: chunk count,
    byte count, and how many chunks/bytes also appear in ANOTHER
    document — the dedup-savings report.

    Gear hash: h_t = 2·h_(t-1) + gear[b_t] mod 2^64 — equivalently the
    64-byte windowed sum Σ gear[b_(t-k)]·2^k, which is how the kernel
    VECTORIZES it (64 shifted adds over the whole byte array, no
    per-byte Python); the boundary walk touches only candidate
    positions. The pytest pin (tests/test_kernels.py) recomputes chunks
    through the BYTE-SERIAL recurrence — a genuinely independent
    mechanism that agrees only if both the window identity and the
    MIN/MAX walk are right.

    Rows-only: a rolling hash over byte streams has no SQL form. Plan:
    one Arrow-batched mapInPandas chunking pass (embarrassingly
    parallel, numpy kernels), checkpointed so popularity and the
    per-doc report share ONE documents scan; popularity is one hash agg
    on 16-byte chunk hashes (never chunk bytes — the dedup_line_level
    shuffle discipline); membership rides a hash equi-join on the chunk
    hash; the report is one keyed agg per doc. No all-pairs anywhere;
    chunk state is bounded by doc length."""
    import pandas as pd
    import numpy as np

    gear = _gear_table()
    docs = spread_single_split(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )

    def chunk(batches, _gear=gear):
        import hashlib as _hl

        for pdf in batches:
            if pdf.empty:
                continue
            out_doc, out_idx, out_h, out_len = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8") if text else b""
                n = len(raw)
                if n == 0:
                    continue
                b = np.frombuffer(raw, dtype=np.uint8)
                g = _gear[b]
                h = np.zeros(n, dtype=np.uint64)
                for k in range(64):
                    if k >= n:
                        break
                    h[k:] += g[: n - k] << np.uint64(k)
                start = 0
                for idx, end in enumerate(_cdc_boundaries(h, n)):
                    piece = raw[start : end + 1]
                    out_doc.append(int(doc_id))
                    out_idx.append(idx)
                    out_h.append(_hl.md5(piece).hexdigest())
                    out_len.append(len(piece))
                    start = end + 1
            if out_doc:
                yield pd.DataFrame(
                    {
                        "doc_id": out_doc,
                        "idx": out_idx,
                        "h": out_h,
                        "length": out_len,
                    }
                )

    chunks = docs.mapInPandas(
        chunk, schema="doc_id long, idx int, h string, length int"
    ).localCheckpoint()
    pop = chunks.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    dup = F.col("n_docs") > 1
    return (
        chunks.join(pop, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_chunks"),
            F.sum("length").cast("bigint").alias("n_bytes"),
            F.sum(F.when(dup, 1).otherwise(0)).cast("int").alias("n_dup_chunks"),
            F.sum(F.when(dup, F.col("length")).otherwise(0))
            .cast("bigint")
            .alias("dup_bytes"),
        )
        .orderBy("doc_id")
    )


dedup_cdc_chunks.__doc__ = dedup_cdc_chunks.__doc__.format(
    mn=_CDC_MIN, mask=_CDC_MASK, avg=_CDC_MASK + 1, mx=_CDC_MAX
)


# ---------------------------------------------------------------------------
# Incremental learned quality tier (round 16, VERDICT r15 task 4) — the NB
# count tables are mergeable exact integers, so the base-corpus training
# pass persists as a content-addressed warehouse artifact and a delta
# ingest is ONE hash agg + a 65-row merge. filemap's make-semantics
# applied to the learned tier: re-ingesting the same base corpus is a
# warehouse hit; only arriving docs pay training cost.

# Base-ingest execution counter: incremented once per ACTUAL base-corpus
# count-table build (never on a warehouse hit) — tests/test_memo.py's
# ingest-once pin, the _BPE_TRAIN_RUNS precedent.
_NB_INGEST_RUNS = 0


def nb_count_table(lab: DataFrame) -> DataFrame:
    """Exact-integer Naive-Bayes count table of a labeled corpus slice:
    (bucket, nk, nd) token counts per hashed feature bucket for the
    keep/drop classes, plus one bucket = -1 row carrying the DOC-level
    priors (dk, dd) in the same columns. `lab` is the standard labeled
    frame (doc_id, ws array<string>, gopher_verdict). The table is the
    complete sufficient statistic of the classifier — two slices' tables
    merge by bucket-keyed integer addition with zero information loss,
    which is what makes the tier incrementally trainable."""
    toks = lab.select(
        "gopher_verdict", F.explode("ws").alias("word")
    ).withColumn("bucket", _hash_bucket_col("word"))
    is_keep = (F.col("gopher_verdict") == "keep").cast("long")
    cb = toks.groupBy("bucket").agg(
        F.sum(is_keep).alias("nk"), F.sum(1 - is_keep).alias("nd")
    )
    pr = lab.agg(
        F.sum(is_keep).alias("nk"), F.sum(1 - is_keep).alias("nd")
    ).select(F.lit(-1).cast("int").alias("bucket"), "nk", "nd")
    return cb.unionByName(pr)


def nb_ingest_counts(docs: DataFrame) -> DataFrame:
    """`nb_count_table` over a raw (doc_id, text) batch — labels the
    batch with the shared Gopher verdict expression first. The
    foreachBatch entry point: a streaming ingest loop appends each
    micro-batch's table to its count ledger and the merged ledger is
    ALWAYS exactly the full-retrain model (tests/test_streaming.py)."""
    lab = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        _gopher_columns()["verdict"].alias("gopher_verdict"),
    )
    return nb_count_table(lab)


@query(
    "text_quality_incremental",
    cost=1.5,
    oracle=f"""
    WITH {{GOPHER}}, toks AS (
      SELECT doc_id, gopher_verdict,
             CAST(('0x' || substr(md5(word), 1, 4)) AS INT)
               % {_HASH_FEATURE_BUCKETS} AS bucket
      FROM (SELECT doc_id, gopher_verdict, unnest(w) AS word FROM lab)
    ), cb_base AS (
      SELECT bucket,
             sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END) AS nk,
             sum(CASE WHEN gopher_verdict = 'drop' THEN 1 ELSE 0 END) AS nd
      FROM toks WHERE doc_id % 10 != 0 GROUP BY bucket
    ), cb_delta AS (
      SELECT bucket,
             sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END) AS nk,
             sum(CASE WHEN gopher_verdict = 'drop' THEN 1 ELSE 0 END) AS nd
      FROM toks WHERE doc_id % 10 = 0 GROUP BY bucket
    ), cb AS (
      SELECT bucket, cast(sum(nk) AS bigint) AS nk,
             cast(sum(nd) AS bigint) AS nd
      FROM (SELECT * FROM cb_base UNION ALL SELECT * FROM cb_delta)
      GROUP BY bucket
    ), tt AS (
      SELECT cast(sum(nk) AS bigint) AS ntk, cast(sum(nd) AS bigint) AS ntd
      FROM cb
    ), pr AS (
      SELECT cast(b.dk + d.dk AS bigint) AS dk,
             cast(b.dd + d.dd AS bigint) AS dd
      FROM (SELECT sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END) AS dk,
                   sum(CASE WHEN gopher_verdict = 'drop' THEN 1 ELSE 0 END) AS dd
            FROM lab WHERE doc_id % 10 != 0) b
      CROSS JOIN
           (SELECT sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END) AS dk,
                   sum(CASE WHEN gopher_verdict = 'drop' THEN 1 ELSE 0 END) AS dd
            FROM lab WHERE doc_id % 10 = 0) d
    ), lo AS (
      SELECT bucket, {_NB_Q_SQL} AS q FROM cb CROSS JOIN tt
    ), qpr AS (SELECT {_NB_QP_SQL} AS q_prior FROM pr),
    db AS (
      SELECT doc_id, bucket, count(*) AS n FROM toks GROUP BY doc_id, bucket
    ), sc AS (
      SELECT doc_id, cast(sum(n * q) AS bigint) AS s,
             cast(sum(n) AS bigint) AS n_tokens
      FROM db JOIN lo USING (bucket) GROUP BY doc_id
    )
    SELECT sc.doc_id,
           CASE WHEN sc.doc_id % 10 = 0 THEN 'delta' ELSE 'base' END
             AS ingest_phase,
           sc.n_tokens,
           {_NB_SCORE_SQL} AS nb_score,
           CASE WHEN sc.s + qpr.q_prior > 0 THEN 'keep' ELSE 'drop' END
             AS nb_verdict
    FROM sc CROSS JOIN qpr
    ORDER BY doc_id
    """.replace("{GOPHER}", _GOPHER_LABEL_CTES),
)
def text_quality_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin of `text_quality_classifier` (round 16, VERDICT
    r15 task 4 — the learned tier gains filemap's make-semantics): the
    base corpus (doc_id % 10 != 0) trains ONCE and its (bucket, class)
    count table persists as a content-addressed warehouse artifact (the
    BPE-merge / incremental-LSH precedent, plans/memo.py); the arriving
    delta (doc_id % 10 = 0) is ingested with ONE hash agg, merged into
    the ledger by bucket-keyed integer addition, and the whole corpus is
    scored against the merged model. Per doc: the ingest phase it
    arrived in, exact token count, NB log-odds score, and the learned
    verdict.

    Why the merge is provably a full retrain (the ts_hypertable_rollup
    argument): the count table is the classifier's COMPLETE sufficient
    statistic, and its entries are exact int64 token/doc counts — so
    count(base) + count(delta) = count(base ∪ delta) is integer
    arithmetic, not an approximation, and the merged model is
    bit-identical to retraining on everything. The oracle restates
    exactly that: it builds base and delta count CTEs, merges them by
    bucket, and the driver hash-checks the scores — incremental ≡
    retrain is the graded claim, not a comment. A pytest additionally
    pins this op's (doc_id, n_tokens, nb_score, nb_verdict) equal to
    `text_quality_classifier`'s full-retrain output row for row.

    Determinism: identical to the classifier — 1e4-quantized log-odds
    over ~{B}+1 distinct ln calls, exact integer dot products, integer
    gate, decimal descale.

    Scale: ONE documents scan (the labeled frame is checkpointed; base
    build on a warehouse miss, delta counts, and scoring all derive from
    it); the artifact is ≤{B}+1 rows at ANY corpus size, the merge is a
    {B}+1-row shuffle, and scoring is the classifier's broadcast-model
    plan. At 100 TB the steady state is: base ledger parquet sits in the
    warehouse, each arriving partition pays one token hash-agg over ITS
    docs only — training cost scales with the delta, never the corpus.
    The foreachBatch twin (tests/test_streaming.py) runs the same loop
    batch-at-a-time through `nb_ingest_counts`."""
    global _NB_INGEST_RUNS
    from filemap_spark.plans.memo import artifact_key, cached_by_key

    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        _gopher_columns()["verdict"].alias("gopher_verdict"),
    ).localCheckpoint()
    is_delta = F.col("doc_id") % 10 == 0

    def build_base() -> DataFrame:
        global _NB_INGEST_RUNS
        _NB_INGEST_RUNS += 1
        return nb_count_table(lab.where(~is_delta)).coalesce(1)

    key = artifact_key(
        "nb_counts_base",
        text_quality_incremental,
        [os.path.join(sf_dir, "documents.parquet")],
    )
    base, _hit = cached_by_key(spark, key, build_base)
    delta = nb_count_table(lab.where(is_delta))
    merged = (
        base.unionByName(delta)
        .groupBy("bucket")
        .agg(F.sum("nk").alias("nk"), F.sum("nd").alias("nd"))
    )
    cb = merged.where(F.col("bucket") >= 0)
    tt = cb.agg(
        F.sum("nk").cast("bigint").alias("ntk"),
        F.sum("nd").cast("bigint").alias("ntd"),
    )
    lo = cb.crossJoin(F.broadcast(tt)).select(
        "bucket", F.expr(_NB_Q_SQL).alias("q")
    )
    consts = merged.where(F.col("bucket") == -1).select(
        F.col("nk").alias("dk"), F.col("nd").alias("dd")
    ).select(F.expr(_NB_QP_SQL).alias("q_prior"))

    toks = lab.select(
        "doc_id", F.explode("ws").alias("word")
    ).withColumn("bucket", _hash_bucket_col("word"))
    db = toks.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("n"))
    sc = (
        db.join(F.broadcast(lo), "bucket")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc_id", "q_prior")
        .agg(
            F.sum(F.col("n") * F.col("q")).cast("bigint").alias("s"),
            F.sum("n").cast("bigint").alias("n_tokens"),
        )
    )
    return sc.select(
        "doc_id",
        F.when(is_delta, "delta").otherwise("base").alias("ingest_phase"),
        "n_tokens",
        F.expr(_NB_SCORE_SQL).alias("nb_score"),
        F.when(F.col("s") + F.col("q_prior") > 0, "keep")
        .otherwise("drop")
        .alias("nb_verdict"),
    ).orderBy("doc_id")


text_quality_incremental.__doc__ = text_quality_incremental.__doc__.format(
    B=_HASH_FEATURE_BUCKETS
)


# DSIR importance log-weight per hashed bigram bucket — the same
# quantize-at-1e4 ln discipline as _NB_Q_SQL (~B+1 distinct ln calls,
# then exact integer dot products): q = round((ln(tk+1) − ln(tt+B)
# − ln(rk+1) + ln(tr+B))·1e4), target = Gopher-keep docs, raw = all.
_DSIR_Q_SQL = (
    "cast(round((ln(cast(tk + 1 as double)) - ln(cast(tt + {B} as double))"
    " - ln(cast(rk + 1 as double)) + ln(cast(tr + {B} as double)))"
    " * 10000) as bigint)"
).format(B=_HASH_FEATURE_BUCKETS)
# exact integer q-units -> double, featureless docs at exactly 0.0
_DSIR_SCORE_SQL = (
    "cast(cast(coalesce(s, 0) as decimal(38,4)) / 10000 as double)"
)


@query(
    "text_dsir_importance",
    cost=1.0,
    oracle=f"""
    WITH {{GOPHER}}, big AS (
      SELECT doc_id, gopher_verdict, w[i] || ' ' || w[i + 1] AS bg
      FROM (SELECT doc_id, gopher_verdict, w,
                   unnest(generate_series(1, len(w) - 1)) AS i
            FROM lab)
    ), bb AS (
      SELECT doc_id, gopher_verdict,
             CAST(('0x' || substr(md5(bg), 1, 4)) AS INT)
               % {_HASH_FEATURE_BUCKETS} AS bucket
      FROM big
    ), raw AS (
      SELECT bucket, cast(count(*) AS bigint) AS rk,
             cast(sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END)
                  AS bigint) AS tk
      FROM bb GROUP BY bucket
    ), tot AS (
      SELECT cast(sum(rk) AS bigint) AS tr, cast(sum(tk) AS bigint) AS tt
      FROM raw
    ), lo AS (
      SELECT bucket, {_DSIR_Q_SQL} AS q FROM raw CROSS JOIN tot
    ), db AS (
      SELECT doc_id, bucket, count(*) AS n FROM bb GROUP BY doc_id, bucket
    ), sc AS (
      SELECT doc_id, cast(sum(n * q) AS bigint) AS s,
             cast(sum(n) AS bigint) AS n_feats
      FROM db JOIN lo USING (bucket) GROUP BY doc_id
    )
    SELECT lab.doc_id,
           cast(coalesce(sc.n_feats, 0) AS bigint) AS n_feats,
           {_DSIR_SCORE_SQL} AS log_importance,
           cast(coalesce(sc.s, 0) > 0 AS int) AS dsir_keep
    FROM lab LEFT JOIN sc ON lab.doc_id = sc.doc_id
    ORDER BY lab.doc_id
    """.replace("{GOPHER}", _GOPHER_LABEL_CTES),
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (round 16) — Data Selection via Importance
    Resampling (Xie et al. 2023), the published target-distribution
    data-selection pass an LLM curation pipeline runs when it has a
    high-quality target slice and a raw crawl: per document, the
    log importance weight log(p_target(x)/p_raw(x)) under hashed-bigram
    bag-of-features n-gram models. Target = the Gopher-keep slice (the
    same heuristic bootstrap the NB tier trains on — swap in a curated
    slice and the plan is unchanged); raw = the full corpus. Features
    are BIGRAMS hashed into {B} buckets via the shared md5 bucket hash —
    the paper's hashed n-gram estimator, order-sensitive where the
    unigram NB tier is not.

    Per doc: n_feats (exact bigram count), log_importance
    (Σ_f c_f·(log p̂_target(f) − log p̂_raw(f)), Laplace +1 on bucket
    counts, +{B} on totals), and the dsir_keep gate (weight > 0: the doc
    looks more target-like than raw-average). Docs with <2 words have
    no bigrams and score exactly 0 via the LEFT join — never silently
    dropped. The weight column IS the resampling input: compose with
    `sample_importance_hashed` for the paper's sampled-corpus step.

    Determinism: the NB discipline verbatim — per-bucket log ratios
    quantize at 1e4 into int64 (~{B}+1 distinct ln calls total), per-doc
    scores are exact integer dot products descaled once through the
    decimal path, and the gate compares the integer sum to zero.

    Scale: ONE documents scan (labeled frame checkpointed); bigrams are
    built map-side with zip_with on the split array (no per-doc window
    shuffle — contrast text_bigram_pmi, which needs positions); the
    model is a {B}-row broadcast, scoring is one (doc, bucket) hash agg
    + broadcast join + doc-keyed agg. No vocabulary state at any corpus
    size — the hashing-trick property again."""
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        _gopher_columns()["verdict"].alias("gopher_verdict"),
    ).localCheckpoint()
    bg = lab.select(
        "doc_id",
        "gopher_verdict",
        F.explode(
            F.expr(
                "zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)),"
                " slice(ws, 2, greatest(size(ws) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bg"),
    ).withColumn("bucket", _hash_bucket_col("bg"))
    # ONE tokenize pass (r18, the sample_importance_hashed r12 rewrite
    # applied to the bigram model): the doc×bucket agg keeps the verdict
    # as a grouping key (functionally dependent on doc_id — zero extra
    # groups), and the per-bucket model distribution re-aggregates THAT
    # frame instead of re-running the explode+md5 pipeline. Both
    # consumers hang off one identical exchange subtree which
    # ReuseExchange dedupes; the explicit no-op null guards keep every
    # branch's inferred-filter set (hence canonical plan) identical —
    # without them the joins push isnotnull() into only some branches
    # and the scan+explode runs twice (the relational.py precedent).
    dbl = (
        bg.select("doc_id", "gopher_verdict", "bucket")
        .where(F.col("doc_id").isNotNull() & F.col("bucket").isNotNull())
        .groupBy("doc_id", "gopher_verdict", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    raw = dbl.groupBy("bucket").agg(
        F.sum("n").cast("bigint").alias("rk"),
        F.sum(
            F.when(F.col("gopher_verdict") == "keep", F.col("n")).otherwise(0)
        ).cast("bigint").alias("tk"),
    )
    tot = raw.agg(
        F.sum("rk").cast("bigint").alias("tr"),
        F.sum("tk").cast("bigint").alias("tt"),
    )
    lo = raw.crossJoin(F.broadcast(tot)).select(
        "bucket", F.expr(_DSIR_Q_SQL).alias("q")
    )
    sc = (
        dbl.join(F.broadcast(lo), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.col("q")).cast("bigint").alias("s"),
            F.sum("n").cast("bigint").alias("n_feats"),
        )
    )
    return (
        lab.select("doc_id")
        .join(sc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            F.expr(_DSIR_SCORE_SQL).alias("log_importance"),
            (F.coalesce("s", F.lit(0)) > 0).cast("int").alias("dsir_keep"),
        )
        .orderBy("doc_id")
    )


text_dsir_importance.__doc__ = text_dsir_importance.__doc__.format(
    B=_HASH_FEATURE_BUCKETS
)


# Kneser-Ney per-bigram −ln p, spelled over exact-integer model columns
# with d = 3/4: p = [(4·c12 − 3)·Ncc + 3·N1+fw(w1)·N1+bw(w2)] / (4·c1·Ncc)
# — every doc bigram is in the corpus model (c12 ≥ 1), so the discount
# max(c12 − d, 0) simplifies to the exact integer 4·c12 − 3 ≥ 1 and the
# numerator is strictly positive. Products are spelled cast-to-double
# FIRST (each IEEE multiply/add correctly rounded, identical in both
# engines) so the expression never overflows int64 at any corpus scale.
_KN_NLP_SQL = (
    "ln(cast(4 * c1 as double) * cast(ncc as double))"
    " - ln(cast(4 * c12 - 3 as double) * cast(ncc as double)"
    " + cast(3 * n1fw as double) * cast(n1bw as double))"
)


@query(
    "text_kneser_ney_logprob",
    cost=1.2,
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ), bg0 AS (
      SELECT doc_id, word AS w1,
             lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ), bg AS (SELECT * FROM bg0 WHERE w2 IS NOT NULL),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    fw AS (SELECT w1, cast(sum(c12) AS bigint) AS c1,
                  cast(count(*) AS bigint) AS n1fw
           FROM c12 GROUP BY w1),
    bw AS (SELECT w2, cast(count(*) AS bigint) AS n1bw FROM c12 GROUP BY w2),
    t AS (SELECT cast(count(*) AS bigint) AS ncc FROM c12)
    SELECT doc_id, cast(count(*) AS bigint) AS n_bigrams,
           {davg_lnsafe(_KN_NLP_SQL, 'avg_neg_logp')}
    FROM bg JOIN c12 USING (w1, w2) JOIN fw USING (w1) JOIN bw USING (w2)
         CROSS JOIN t
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM scoring (round 16) — the top of
    the quality-scoring ladder (unigram → add-one bigram → KN bigram):
    the smoothing every serious n-gram LM quality filter (the
    CCNet-style perplexity gate) actually uses. Add-one smothers the
    signal on Zipf data; KN discounts each seen bigram by d = 3/4 and
    backs off to the CONTINUATION unigram — p_cont(w2) ∝ how many
    distinct predecessors w2 has, not how often it occurs — so
    "of the" scores on the fan-out of its context, and a frequent word
    glued to one fixed neighbor (boilerplate) stops looking fluent:

      p(w2|w1) = max(c12 − d, 0)/c1 + d·(N1+fw(w1)/c1)·(N1+bw(w2)/Ncc)

    with c1 the context count, N1+fw/N1+bw the distinct-successor /
    distinct-predecessor type counts and Ncc the distinct-bigram total.
    Per doc: the mean negative log-likelihood over its bigrams.

    Determinism: with d = 3/4 the probability is the exact integer ratio
    in _KN_NLP_SQL; each −ln p is two ln calls on doubles produced by
    identically-spelled correctly-rounded IEEE products (the ts_acf
    discipline), and the mean runs through davg_lnsafe's 1e4 per-row
    quantization + exact-int64 sum (the text_bigram_logprob lesson —
    libm ln differs by 1 ulp between engines).

    Scale: the bigram count table is materialized ONCE (vocab²-bounded,
    Zipf ≪ corpus) and all three model marginals derive from it — the
    forward (c1, N1+fw) and backward (N1+bw) type counts and the 1-row
    Ncc — so the corpus is tokenized exactly once. All LM joins are
    UNHINTED (AQE broadcasts while small, shuffled-hash at 100 TB — the
    text_unigram_logprob OOM lesson); the 1-row total is broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.select(
            "doc_id",
            F.col("word").alias("w1"),
            F.lead("word").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    # one materialization feeds all three marginals + the probe join —
    # the text_bigram_logprob round-10 scan-sweep form; bg itself stays
    # un-checkpointed (corpus-sized per-bigram rows, the bm25 lesson).
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12")).localCheckpoint()
    fw = c12.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count("*").cast("bigint").alias("n1fw"),
    )
    bw = c12.groupBy("w2").agg(F.count("*").cast("bigint").alias("n1bw"))
    t = c12.agg(F.count("*").cast("bigint").alias("ncc"))
    return (
        bg.join(c12, ["w1", "w2"])
        .join(fw, "w1")
        .join(bw, "w2")
        .crossJoin(F.broadcast(t))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.expr(davg_lnsafe(_KN_NLP_SQL, "avg_neg_logp")),
        )
        .orderBy("doc_id")
    )


# GPT-3/PaLM-style decontamination n: 13 consecutive tokens. Docs shorter
# than n contribute no n-grams (slice(ws, 1, 0) is the typed empty array;
# Spark's sequence() would DESCEND on a negative span — the guard is
# correctness, not style).
_CONTAM_N = 13


@query(
    "text_contamination_ngram",
    cost=0.5,
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), g AS (
      SELECT doc_id, array_to_string(ws[i:i+{_CONTAM_N - 1}], ' ') AS ng
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - {_CONTAM_N} + 1)) AS i
            FROM w)
    ), ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 7),
    tr AS (SELECT doc_id, ng FROM g WHERE doc_id % 10 <> 7),
    tot AS (
      SELECT doc_id, cast(count(*) AS bigint) AS n_ngrams
      FROM tr GROUP BY doc_id
    ), hit AS (
      SELECT doc_id, cast(count(*) AS bigint) AS n_hit_occurrences,
             cast(count(DISTINCT ng) AS bigint) AS n_hit_ngrams
      FROM tr JOIN ev USING (ng) GROUP BY doc_id
    )
    SELECT doc_id, n_ngrams, n_hit_ngrams, n_hit_occurrences,
           {mean_micro_6dp("n_hit_ngrams * 1000000", "n_ngrams")}
             AS contamination_frac
    FROM hit JOIN tot USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (round 16) — the published 13-gram
    collision rule (GPT-3 appendix C / PaLM): a training document is
    contaminated if any {N} consecutive tokens also appear in the
    held-out evaluation set. Eval slice = doc_id % 10 == 7 (the fixture
    proxy for a benchmark suite); train = everything else. Output: one
    row per CONTAMINATED train doc — its n-gram total, how many distinct
    n-grams collide, raw collision occurrences, and the 6dp contaminated
    fraction — the report a curation pipeline feeds back into
    dedup_materialize_clean's drop list before training.

    Determinism: n-grams are exact string joins of the token array (no
    hashing, no FP); counts are exact integers; the fraction descales
    the exact integer ratio through mean_micro_6dp's int64 tie rule.

    Scale: ONE documents scan (the per-doc token-array frame is
    checkpointed, the dsir-lab pattern — doc-sized, never the exploded
    stream); n-grams are built MAP-SIDE by transform-over-slice (no
    positions window); the eval side reduces to distinct n-grams and the
    probe join is UNHINTED — a real benchmark suite is human-written and
    bounded (~1e6-1e7 n-grams at any corpus size), so AQE broadcasts it
    and the train side never shuffles; with this fixture's
    corpus-proportional eval slice the same plan degrades to a
    shuffled-hash join instead of an executor OOM (the unigram-LM
    lesson). Per-doc totals aggregate doc-keyed, no driver state."""
    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).localCheckpoint()
    ng = _contam_ngrams(ws)
    ev = ng.where(F.col("doc_id") % 10 == 7).select("ng").distinct()
    tr = ng.where(F.col("doc_id") % 10 != 7)
    return _contam_report(tr, ev).orderBy("doc_id")


text_contamination_ngram.__doc__ = text_contamination_ngram.__doc__.format(
    N=_CONTAM_N
)


# Train-once pin for the incremental decontamination twin: how many
# times the base-report/eval-index artifacts were BUILT this process —
# BOTH builders increment it (ADVICE r16: a warehouse holding the eval
# index but not the base report — a run killed between the two writes —
# must still show the base rebuild), so a cold warehouse reads +2 and
# repeated runs on an unchanged corpus add 0.
_CONTAM_BASE_RUNS = 0


def _contam_ngrams(ws_frame: DataFrame) -> DataFrame:
    """(doc_id, ng) — the exploded {N}-gram stream over a (doc_id, ws)
    token-array frame; map-side transform-over-slice, empty for docs
    shorter than {N} tokens (shared by the batch and incremental
    decontamination ops)."""
    n = _CONTAM_N
    return ws_frame.select(
        "doc_id",
        F.explode(
            F.expr(
                f"case when size(ws) >= {n} then"
                f" transform(sequence(1, size(ws) - {n} + 1),"
                f" i -> array_join(slice(ws, i, {n}), ' '))"
                f" else slice(ws, 1, 0) end"
            )
        ).alias("ng"),
    )


def _contam_report(tr: DataFrame, ev: DataFrame) -> DataFrame:
    """Per-contaminated-doc collision report of a train n-gram stream
    `tr` against a distinct eval n-gram set `ev` — the shared back half
    of both decontamination ops (unhinted probe join + exact-integer
    6dp fraction)."""
    tot = tr.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_ngrams")
    )
    hit = tr.join(ev, "ng").groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_hit_occurrences"),
        F.countDistinct("ng").cast("bigint").alias("n_hit_ngrams"),
    )
    return hit.join(tot, "doc_id").select(
        "doc_id",
        "n_ngrams",
        "n_hit_ngrams",
        "n_hit_occurrences",
        F.expr(
            mean_micro_6dp("n_hit_ngrams * 1000000", "n_ngrams")
        ).alias("contamination_frac"),
    )


@query(
    "text_contamination_incremental",
    cost=0.8,
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), g AS (
      SELECT doc_id, array_to_string(ws[i:i+{_CONTAM_N - 1}], ' ') AS ng
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - {_CONTAM_N} + 1)) AS i
            FROM w)
    ), ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 7),
    tr AS (SELECT doc_id, ng FROM g WHERE doc_id % 10 <> 7),
    tot AS (
      SELECT doc_id, cast(count(*) AS bigint) AS n_ngrams
      FROM tr GROUP BY doc_id
    ), hit AS (
      SELECT doc_id, cast(count(*) AS bigint) AS n_hit_occurrences,
             cast(count(DISTINCT ng) AS bigint) AS n_hit_ngrams
      FROM tr JOIN ev USING (ng) GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 0 THEN 'delta' ELSE 'base' END
             AS ingest_phase,
           n_ngrams, n_hit_ngrams, n_hit_occurrences,
           {mean_micro_6dp("n_hit_ngrams * 1000000", "n_ngrams")}
             AS contamination_frac
    FROM hit JOIN tot USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_contamination_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin of `text_contamination_ngram` (round 16) — the
    decontamination pass gains filemap's make-semantics, matching how
    the check actually runs in production: the BENCHMARK side is fixed
    (its distinct {N}-gram index persists as a content-addressed
    warehouse artifact), the already-screened base crawl's collision
    report persists as a second artifact, and an arriving delta batch
    (doc_id % 10 = 0 here) pays ONLY its own n-gram explode + one probe
    join against the persisted index. Output = base report ∪ delta
    report with the ingest phase tagged.

    Why incremental ≡ full recompute needs no merge argument at all
    (simpler than the NB twin's sufficient-statistic case): the report
    is per-doc INDEPENDENT — a train doc's row depends only on its own
    n-grams and the fixed eval index — so unioning per-batch reports IS
    the full report, row for row. The oracle restates the full
    recompute and the driver hash-checks it.

    Determinism: identical to the batch op (exact string n-grams, exact
    integer counts, mean_micro_6dp fraction); artifacts are re-keyed by
    input-file fingerprint ⊕ producing code (plans/memo.py), so a
    changed corpus or edited kernel rebuilds rather than serving stale
    state.

    Scale: on the steady-state path the eval index is read from the
    warehouse (never re-derived), the base report (≤ contaminated docs,
    tiny) is read from the warehouse, and ONLY the delta is scanned,
    exploded, and probed — decontamination cost tracks the ingest rate,
    not the corpus. In this fixture base/delta/eval share one parquet
    (one scan, checkpointed token frame); with a real partitioned crawl
    the delta probe reads the delta partitions only. The probe join
    stays UNHINTED (benchmark-sized index → AQE broadcast)."""
    global _CONTAM_BASE_RUNS
    from filemap_spark.plans.memo import artifact_key, cached_by_key

    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id", F.split("text", " ").alias("ws")
    ).localCheckpoint()
    ng = _contam_ngrams(ws)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    is_eval = F.col("doc_id") % 10 == 7
    is_delta = F.col("doc_id") % 10 == 0

    def build_eval() -> DataFrame:
        global _CONTAM_BASE_RUNS
        _CONTAM_BASE_RUNS += 1
        return ng.where(is_eval).select("ng").distinct().coalesce(1)

    ev, _hit = cached_by_key(
        spark,
        artifact_key(
            "contam_eval_ngrams", text_contamination_incremental, [doc_path]
        ),
        build_eval,
    )

    def build_base() -> DataFrame:
        global _CONTAM_BASE_RUNS
        _CONTAM_BASE_RUNS += 1
        return _contam_report(
            ng.where(~is_eval & ~is_delta), ev
        ).coalesce(1)

    base, _hit = cached_by_key(
        spark,
        artifact_key(
            "contam_base_report", text_contamination_incremental, [doc_path]
        ),
        build_base,
    )
    delta = _contam_report(ng.where(is_delta), ev)
    return (
        base.withColumn("ingest_phase", F.lit("base"))
        .unionByName(delta.withColumn("ingest_phase", F.lit("delta")))
        .select(
            "doc_id",
            "ingest_phase",
            "n_ngrams",
            "n_hit_ngrams",
            "n_hit_occurrences",
            "contamination_frac",
        )
        .orderBy("doc_id")
    )


text_contamination_incremental.__doc__ = (
    text_contamination_incremental.__doc__.format(N=_CONTAM_N)
)


# --- round 17 debuts -------------------------------------------------------

# DSIR resampling (the paper's back half): Gumbel-top-k sampling without
# replacement with probability ∝ exp(log importance weight). The Gumbel
# key is EXACT int64 end to end: the hashed-bigram log-weight s is
# already an integer in 1e-4 units (_DSIR_Q_SQL), and the per-doc Gumbel
# noise g = −ln(−ln(u)) quantizes at the same 1e-4 scale, so
# key = s + g_q orders identically in both engines (doc_id tiebreak).
# u is an exact rational from an md5 slice: h ∈ [0, 2^32), u = (h+1) /
# (2^32+1) ∈ (0,1) strictly — both ln endpoints are safe.
_DSIR_RESAMPLE_K = 100
_DSIR_RESAMPLE_SALT = "dsir-resample-"
# Engine-identical Gumbel noise in 1e-4 q-units over an exact bigint h.
# ln is libm (1-ulp engine skew possible); the 1e4 quantization makes a
# boundary flip need ~1e-15 luck against a 1e-4 grid — the documented
# davg_lnsafe risk class. The divisor is cast-to-double (a bare decimal
# literal would flip Spark into decimal division).
_DSIR_GUMBEL_Q_SQL = (
    "cast(round(-ln(-ln(cast(h + 1 as double)"
    " / cast(4294967297 as double))) * 10000) as bigint)"
)
# exact 1e-4-unit integer -> double, via the decimal descale path
_DSIR_KEY_SQL = "cast(cast(key as decimal(38,4)) / 10000 as double)"


@query(
    "text_dsir_resample",
    cost=1.1,
    oracle=f"""
    WITH {{GOPHER}}, big AS (
      SELECT doc_id, gopher_verdict, w[i] || ' ' || w[i + 1] AS bg
      FROM (SELECT doc_id, gopher_verdict, w,
                   unnest(generate_series(1, len(w) - 1)) AS i
            FROM lab)
    ), bb AS (
      SELECT doc_id, gopher_verdict,
             CAST(('0x' || substr(md5(bg), 1, 4)) AS INT)
               % {_HASH_FEATURE_BUCKETS} AS bucket
      FROM big
    ), raw AS (
      SELECT bucket, cast(count(*) AS bigint) AS rk,
             cast(sum(CASE WHEN gopher_verdict = 'keep' THEN 1 ELSE 0 END)
                  AS bigint) AS tk
      FROM bb GROUP BY bucket
    ), tot AS (
      SELECT cast(sum(rk) AS bigint) AS tr, cast(sum(tk) AS bigint) AS tt
      FROM raw
    ), lo AS (
      SELECT bucket, {{DSIRQ}} AS q FROM raw CROSS JOIN tot
    ), db AS (
      SELECT doc_id, bucket, count(*) AS n FROM bb GROUP BY doc_id, bucket
    ), sc AS (
      SELECT doc_id, cast(sum(n * q) AS bigint) AS s,
             cast(sum(n) AS bigint) AS n_feats
      FROM db JOIN lo USING (bucket) GROUP BY doc_id
    ), alldocs AS (
      SELECT lab.doc_id,
             cast(coalesce(sc.n_feats, 0) AS bigint) AS n_feats,
             cast(coalesce(sc.s, 0) AS bigint) AS s
      FROM lab LEFT JOIN sc ON lab.doc_id = sc.doc_id
    ), keyed AS (
      SELECT doc_id, n_feats, s,
             s + {_DSIR_GUMBEL_Q_SQL} AS key
      FROM (SELECT *,
                   CAST(('0x' || substr(md5('{_DSIR_RESAMPLE_SALT}'
                        || cast(doc_id AS varchar)), 1, 8)) AS BIGINT) AS h
            FROM alldocs)
    )
    SELECT doc_id, n_feats,
           {_DSIR_SCORE_SQL} AS log_importance,
           {_DSIR_KEY_SQL} AS sample_key
    FROM keyed
    ORDER BY key DESC, doc_id
    LIMIT {_DSIR_RESAMPLE_K}
    """.replace("{GOPHER}", _GOPHER_LABEL_CTES).replace(
        "{DSIRQ}", _DSIR_Q_SQL
    ),
)
def text_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR resampling (round 17) — the back half of Data Selection via
    Importance Resampling (Xie et al. 2023), closing the loop
    `text_dsir_importance` opened: having learned per-doc log importance
    weights log(p_target/p_raw) under hashed-bigram models, SELECT the
    training subset by sampling WITHOUT replacement with probability
    ∝ exp(weight). The selection uses the Gumbel-top-k identity (the
    paper's resampling step made deterministic): key_i = logw_i + g_i
    with g_i ~ Gumbel(0,1), take the top k keys — equivalent in
    distribution to softmax sampling without replacement, and
    reproducible here because the "noise" is a hash of the doc_id.

    Determinism (the grading point): the log-weight s is ALREADY an
    exact int64 in 1e-4 units (the _DSIR_Q_SQL quantization), the
    Gumbel noise quantizes at the same 1e-4 grid from an exact md5
    rational u = (h+1)/(2^32+1), and key = s + g_q is exact integer
    addition — so top-k membership and order are engine-identical by
    construction, not by FP luck (ln's 1-ulp libm skew is absorbed by
    the 1e-4 grid, the davg_lnsafe argument). doc_id breaks ties.

    Scale: identical plan skeleton to text_dsir_importance — ONE
    documents scan (labeled frame checkpointed), map-side zip_with
    bigrams, a {B}-row broadcast model, one (doc, bucket) hash agg —
    plus a hash column and TakeOrdered(k): the selection adds NO new
    shuffle. At 100 TB, k scales to the token budget and the top-k is
    a per-partition heap + driver merge of k rows (TakeOrdered), never
    a global sort. Composes with sample_importance_hashed (the
    unigram-lite ranking twin) and the quality/temperature mixes."""
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        _gopher_columns()["verdict"].alias("gopher_verdict"),
    ).localCheckpoint()
    bg = lab.select(
        "doc_id",
        "gopher_verdict",
        F.explode(
            F.expr(
                "zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)),"
                " slice(ws, 2, greatest(size(ws) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bg"),
    ).withColumn("bucket", _hash_bucket_col("bg"))
    # ONE tokenize pass — same r18 rewrite as text_dsir_importance (the
    # shared-exchange comment there); verdict rides the doc×bucket agg
    # key so the model distribution derives from it.
    dbl = (
        bg.select("doc_id", "gopher_verdict", "bucket")
        .where(F.col("doc_id").isNotNull() & F.col("bucket").isNotNull())
        .groupBy("doc_id", "gopher_verdict", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    raw = dbl.groupBy("bucket").agg(
        F.sum("n").cast("bigint").alias("rk"),
        F.sum(
            F.when(F.col("gopher_verdict") == "keep", F.col("n")).otherwise(0)
        ).cast("bigint").alias("tk"),
    )
    tot = raw.agg(
        F.sum("rk").cast("bigint").alias("tr"),
        F.sum("tk").cast("bigint").alias("tt"),
    )
    lo = raw.crossJoin(F.broadcast(tot)).select(
        "bucket", F.expr(_DSIR_Q_SQL).alias("q")
    )
    sc = (
        dbl.join(F.broadcast(lo), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.col("q")).cast("bigint").alias("s"),
            F.sum("n").cast("bigint").alias("n_feats"),
        )
    )
    keyed = (
        lab.select("doc_id")
        .join(sc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            F.coalesce("s", F.lit(0)).cast("bigint").alias("s"),
        )
        .withColumn(
            "h",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(_DSIR_RESAMPLE_SALT),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
        )
        .withColumn("key", F.col("s") + F.expr(_DSIR_GUMBEL_Q_SQL))
    )
    return (
        keyed.orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(_DSIR_RESAMPLE_K)
        .select(
            "doc_id",
            "n_feats",
            F.expr(_DSIR_SCORE_SQL).alias("log_importance"),
            F.expr(_DSIR_KEY_SQL).alias("sample_key"),
        )
    )


text_dsir_resample.__doc__ = text_dsir_resample.__doc__.format(
    B=_HASH_FEATURE_BUCKETS
)


# ExactSubstr granularity (Lee et al. 2022 §4.1: remove substrings of
# ≥ 50 tokens that appear more than once in the corpus). The exactness
# argument for doing this with FIXED 50-token rolling windows instead
# of a suffix array: a token sits inside some duplicated substring of
# length ≥ L  ⟺  it sits inside some duplicated L-token window (⇒: any
# duplicated substring of length ≥ L contains, around every one of its
# tokens, at least one full L-window, and that window occurs wherever
# the substring does; ⇐: the window itself IS a duplicated substring of
# length exactly L). So coalescing duplicated L-windows reproduces the
# suffix-array pass's per-token removal mask EXACTLY — only the
# reporting granularity (maximal covered intervals) differs from
# enumerating each repeated substring.
_SUBSTR_SPAN_TOKENS = 50


@query(
    "dedup_exact_substring",
    cost=1.4,
    oracle=f"""
    WITH sp AS (
      SELECT doc_id, pos,
             array_to_string(list_slice(w, pos, pos + {_SUBSTR_SPAN_TOKENS - 1}), ' ')
               AS span
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - {_SUBSTR_SPAN_TOKENS - 1})) AS pos
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
    ), dup AS (
      SELECT span FROM sp GROUP BY span HAVING count(*) > 1
    ), hits AS (
      SELECT s.doc_id, s.pos FROM sp s JOIN dup USING (span)
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {_SUBSTR_SPAN_TOKENS}
                  THEN 0 ELSE 1 END AS brk
      FROM hits
    ), grp AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS g
      FROM isl
    )
    SELECT doc_id,
           cast(min(pos) AS bigint) AS span_start,
           cast(max(pos) + {_SUBSTR_SPAN_TOKENS - 1} AS bigint) AS span_end,
           cast(max(pos) + {_SUBSTR_SPAN_TOKENS} - min(pos) AS bigint)
             AS n_span_tokens,
           cast(count(*) AS bigint) AS n_dup_windows
    FROM grp GROUP BY doc_id, g
    ORDER BY doc_id, span_start
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-span EXACT substring dedup (round 17) — the ExactSubstr rule
    of "Deduplicating Training Data Makes Language Models Better" (Lee
    et al. 2022): find, per document, the maximal token intervals covered
    by some substring of ≥ {L} tokens that occurs more than once in the
    corpus (the mask ExactSubstr cuts out of the training text; also the
    "50-token verbatim overlap" rule MMLU-style decontamination uses).
    `dedup_span_exact` reports which fixed 20-token windows are shared,
    corpus-level; this op completes the recipe at the published 50-token
    threshold and COALESCES runs of duplicated windows into maximal
    per-doc spans — the module-header comment proves the fixed-window
    mask equals the suffix-array pass's per-token mask exactly, so this
    is the scalable Spark spelling of the letter of the paper, not an
    approximation of it.

    Determinism: span equality rides a 128-bit key (two independently
    seeded xxhash64 values of the token-slice ARRAY — injective to the
    span string since tokens never contain the separator); a false
    collision needs p ≈ n²/2¹²⁸, the `_keyed_by_text` discipline, and
    the hash never reaches the output. The island split is integer
    position arithmetic over a doc-partitioned, position-ordered
    window; every output column is an exact integer.

    Scale (r18 rewrite, guide §2.1/§2.3): duplicate detection is ONE
    pass — count(*) over a window keyed by the 128-bit span hash — so
    the explode pipeline runs once and the only corpus-sized exchange
    moves 32-byte (hash, doc, pos) rows, never span strings (the
    pre-r18 shape built the ~50-token span string twice — once for the
    span-keyed agg, once for the probe join — and shuffled the strings
    themselves). The islands/coalesce stage runs on the HIT set only
    (duplicated windows — corpus-small), partitioned by doc_id; no
    global sort, no driver state. The token-array frame is checkpointed
    doc-sized (the contamination-op precedent)."""
    n = _SUBSTR_SPAN_TOKENS
    docs = load_table(spark, sf_dir, "documents")
    ws = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= n)
        .localCheckpoint()
    )
    arr = F.expr(f"slice(w, pos, {n})")
    keyed = ws.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("pos"),
        F.col("w"),
    ).select(
        "doc_id",
        "pos",
        F.xxhash64(arr).alias("h1"),
        F.xxhash64(F.lit(1), arr).alias("h2"),
    )
    w_span = Window.partitionBy("h1", "h2")
    hits = (
        keyed.withColumn("cnt", F.count(F.lit(1)).over(w_span))
        .where(F.col("cnt") > 1)
        .select("doc_id", "pos")
    )
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos") - F.lag("pos").over(w_ord) <= n, F.lit(0)
        ).otherwise(F.lit(1)).alias("brk"),
    )
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp = isl.select(
        "doc_id", "pos", F.sum("brk").over(w_cum).alias("g")
    )
    return (
        grp.groupBy("doc_id", "g")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + (n - 1)).cast("bigint").alias("span_end"),
            (F.max("pos") + n - F.min("pos")).cast("bigint").alias(
                "n_span_tokens"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_dup_windows"),
        )
        .select(
            "doc_id", "span_start", "span_end", "n_span_tokens",
            "n_dup_windows",
        )
        .orderBy("doc_id", "span_start")
    )


dedup_exact_substring.__doc__ = dedup_exact_substring.__doc__.format(
    L=_SUBSTR_SPAN_TOKENS
)
