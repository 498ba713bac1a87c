"""Memoization layer semantics (SURVEY §4.3.1): hit/miss behavior, plan
keying, and make-style invalidation on input change."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from filemap_spark.io import load_table
from filemap_spark.plans.memo import cached, plan_key
from filemap_spark.testing import canonical_rows


def _agg(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"))
        .orderBy("n_regionkey")
    )


def test_miss_then_hit_same_result(spark, sf_dir):
    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/nation.parquet"]
    r1, hit1 = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    r2, hit2 = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    assert (hit1, hit2) == (False, True)
    direct = _agg(spark, sf_dir).toPandas()
    assert canonical_rows(r1.toPandas()) == canonical_rows(direct)
    assert canonical_rows(r2.toPandas()) == canonical_rows(direct)


def test_plan_equivalent_queries_share_key(spark, sf_dir):
    inputs = [f"{sf_dir}/nation.parquet"]
    a = _agg(spark, sf_dir)
    # different construction order, same optimized plan modulo aliasing
    b = _agg(spark, sf_dir)
    assert plan_key(a, inputs) == plan_key(b, inputs)


def test_different_plan_different_key(spark, sf_dir):
    inputs = [f"{sf_dir}/nation.parquet"]
    a = _agg(spark, sf_dir)
    b = _agg(spark, sf_dir).where(F.col("n") > 1)
    assert plan_key(a, inputs) != plan_key(b, inputs)


def test_self_join_left_vs_right_projection_distinct_keys(spark, sf_dir):
    """Round-2 regression (ADVICE): erasing exprIds collided a self-join
    projecting the LEFT copy of a column with one projecting the RIGHT copy
    — canonical renumbering must keep those keys distinct while staying
    stable for plan-equivalent queries."""
    inputs = [f"{sf_dir}/nation.parquet"]
    n = load_table(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    joined = a.join(b, F.col("a.n_nationkey") == F.col("b.n_nationkey"))
    left = joined.select(F.col("a.n_name").alias("nm"), F.col("a.n_regionkey").alias("rk"))
    right = joined.select(F.col("b.n_name").alias("nm"), F.col("a.n_regionkey").alias("rk"))
    assert plan_key(left, inputs) != plan_key(right, inputs)
    # and re-deriving the same side still shares a key (fresh exprIds)
    n2 = load_table(spark, sf_dir, "nation")
    a2, b2 = n2.alias("a"), n2.alias("b")
    joined2 = a2.join(b2, F.col("a.n_nationkey") == F.col("b.n_nationkey"))
    left2 = joined2.select(
        F.col("a.n_name").alias("nm"), F.col("a.n_regionkey").alias("rk")
    )
    assert plan_key(left, inputs) == plan_key(left2, inputs)


def test_lambda_plan_key_stable_across_builds(spark, sf_dir):
    """Round-11 regression (VERDICT r11 task 1): NamedLambdaVariable names
    come from a session-global JVM counter (`lambda x_1#4` on one build,
    `lambda x_3#8` on the next), so without lambda-name canonicalization
    every higher-order-function plan got a fresh key per construction and
    the cache never hit. Two FRESH constructions of the same lambda-bearing
    query must share a key."""
    inputs = [f"{sf_dir}/documents.parquet"]

    def build():
        d = load_table(spark, sf_dir, "documents")
        return d.select(
            "doc_id",
            F.array_sort(F.split("text", r"\s+")).alias("toks"),
            F.transform(F.split("text", r"\s+"), lambda w: F.length(w)).alias("lens"),
            F.filter(F.split("text", r"\s+"), lambda w: F.length(w) > 3).alias("big"),
        )

    assert plan_key(build(), inputs) == plan_key(build(), inputs)


def test_lambda_plan_key_distinct_for_different_lambdas(spark, sf_dir):
    """Negative pin: canonicalizing lambda NAMES must not merge plans whose
    lambda BODIES differ, nor confuse two distinct variables in one plan."""
    inputs = [f"{sf_dir}/documents.parquet"]
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", r"\s+")
    a = d.select(F.transform(toks, lambda w: F.length(w)).alias("v"))
    b = d.select(F.transform(toks, lambda w: F.length(w) + 1).alias("v"))
    assert plan_key(a, inputs) != plan_key(b, inputs)
    # nested lambdas: two variables in one plan stay distinct — swapping
    # which variable the inner body references must change the key
    nested_outer = d.select(
        F.transform(toks, lambda w: F.transform(toks, lambda u: F.length(w))).alias("v")
    )
    nested_inner = d.select(
        F.transform(toks, lambda w: F.transform(toks, lambda u: F.length(u))).alias("v")
    )
    assert plan_key(nested_outer, inputs) != plan_key(nested_inner, inputs)


def test_materialization_leaves_no_staging_dirs(spark, sf_dir):
    """The atomic temp-dir + rename path must clean its staging dirs on
    success and leave exactly the keyed dataset behind."""
    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/nation.parquet"]
    _r, hit = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    assert hit is False
    entries = sorted(os.listdir(wh))
    assert len(entries) == 1 and not entries[0].startswith("."), entries
    assert os.path.exists(os.path.join(wh, entries[0], "_SUCCESS"))


def test_input_change_invalidates(spark, sf_dir):
    """make-semantics: touching an input file changes the key."""
    wh = tempfile.mkdtemp(prefix="memo_wh_")
    src = os.path.join(wh, "copy.parquet")
    load_table(spark, sf_dir, "nation").write.parquet(src)
    df = spark.read.parquet(src).groupBy("n_regionkey").agg(F.count("*").alias("n"))
    k1 = plan_key(df, [src])
    time.sleep(0.01)
    part = next(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    os.utime(part)
    k2 = plan_key(df, [src])
    assert k1 != k2


def test_crashed_writer_leftover_is_replaced(spark, sf_dir):
    """A dataset dir WITHOUT the _SUCCESS marker (writer died mid-flight)
    must be treated as garbage and replaced, not block materialization."""
    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/nation.parquet"]
    key = plan_key(_agg(spark, sf_dir), inputs)
    stale = os.path.join(wh, key)
    os.makedirs(stale)
    open(os.path.join(stale, "part-junk.parquet"), "w").write("not parquet")
    r, hit = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    assert hit is False
    assert os.path.exists(os.path.join(stale, "_SUCCESS"))
    assert canonical_rows(r.toPandas()) == canonical_rows(_agg(spark, sf_dir).toPandas())


# ---------------------------------------------------------------------------
# Round 11 (VERDICT r10 tasks 1/8/9): registry-level memoization, LRU
# eviction, concurrent-writer safety, CLI maintenance verb.
# ---------------------------------------------------------------------------


def _fresh_warehouse(monkeypatch):
    wh = tempfile.mkdtemp(prefix="memo_wh_")
    monkeypatch.setenv("FILEMAP_WAREHOUSE", wh)
    return wh


def test_registry_memo_ops_hit_path_row_identity(spark, sf_dir, monkeypatch):
    """VERDICT r10 task 1's grading pin: for EVERY memo-capable registry
    op, the first wrapped run materializes, the second is a warehouse hit,
    and both return exactly the raw (uncached) op's rows — including row
    ORDER, which the single-file write preserves through the cache."""
    from filemap_spark.plans.memo import warehouse_entries
    from filemap_spark.registry import _QUERIES, memo_queries

    wh = _fresh_warehouse(monkeypatch)
    wrapped = memo_queries()
    assert set(wrapped) == {
        "dedup_line_level",
        "dedup_near_jaccard",
        "dedup_paragraph_jaccard",
        "graph_jaccard_neighbors",
        "text_bigram_pmi",
        "text_ndcg_eval",
        "text_ngram_novelty",
        "text_rouge2_recall",
        # round 14: the deterministic documents-sourced debuts
        "sample_shuffle_global",
        "mm_scene_cut_y4m",
        "text_bpe_apply",
        "text_bpe_pack_sequences",
        # round 15: the CDC chunk dedup (documents-sourced, deterministic)
        "dedup_cdc_chunks",
    }
    # Phase-parallel over a thread pool (r18, VERDICT r17 task 3 — the
    # serial 39-execution loop was 42 s of suite wall): all raws, then
    # all misses, then all hits; distinct ops write distinct warehouse
    # keys so concurrent misses are independent, and the no-new-entries
    # hit assertion is checked across the whole hit phase.
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(wrapped)
    with ThreadPoolExecutor(max_workers=8) as pool:
        raws = dict(zip(names, pool.map(
            lambda n: _QUERIES[n](spark, sf_dir).toPandas(), names
        )))
        firsts = dict(zip(names, pool.map(
            lambda n: wrapped[n](spark, sf_dir).toPandas(), names
        )))
        n_after_miss = len(warehouse_entries(wh))
        seconds = dict(zip(names, pool.map(
            lambda n: wrapped[n](spark, sf_dir).toPandas(), names
        )))
    assert len(warehouse_entries(wh)) == n_after_miss  # hits: no new entries

    # ORDER-SENSITIVE identity: stringified row tuples without sorting
    def rows(pdf):
        cols = sorted(pdf.columns)
        return [
            tuple(str(v) for v in r)
            for r in pdf.reindex(cols, axis=1).itertuples(index=False, name=None)
        ]

    for name in names:
        assert rows(firsts[name]) == rows(raws[name]), name
        assert rows(seconds[name]) == rows(raws[name]), name


def test_all_queries_env_gate(spark, sf_dir, monkeypatch):
    """FILEMAP_MEMO unset → all_queries() serves the RAW functions (what
    the driver grades and bench times); =1 → the memo-capable ops come
    wrapped."""
    from filemap_spark.registry import _MEMO, _QUERIES, all_queries

    monkeypatch.delenv("FILEMAP_MEMO", raising=False)
    q = all_queries()
    for name in _MEMO:
        assert q[name] is _QUERIES[name]
    monkeypatch.setenv("FILEMAP_MEMO", "1")
    _fresh_warehouse(monkeypatch)
    q = all_queries()
    for name in _MEMO:
        assert q[name] is not _QUERIES[name]
        assert q[name].__filemap_memo_tables__ == _MEMO[name]


def test_memo_input_edge_only_declared_tables(spark, sf_dir, monkeypatch):
    """make-semantics precision: the memo key covers the DECLARED tables
    only, so touching an unrelated table must NOT invalidate."""
    import shutil

    from filemap_spark.plans.memo import warehouse_entries
    from filemap_spark.registry import memo_queries

    wh = _fresh_warehouse(monkeypatch)
    # private sf copy so the utime below can't dirty shared fixtures.
    # Tables are a single parquet FILE at sf0.001 and a directory at
    # larger SFs (the r11 copytree-only version broke on the file case).
    priv = tempfile.mkdtemp(prefix="memo_sf_")
    for t in ("documents", "nation"):
        src, dst = f"{sf_dir}/{t}.parquet", f"{priv}/{t}.parquet"
        shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy2(src, dst)
    fn = memo_queries()["dedup_near_jaccard"]
    fn(spark, priv).collect()
    assert len(warehouse_entries(wh)) == 1
    os.utime(f"{priv}/nation.parquet")  # unrelated table
    fn(spark, priv).collect()
    assert len(warehouse_entries(wh)) == 1, "unrelated input invalidated"
    docs = f"{priv}/documents.parquet"
    os.utime(
        docs
        if os.path.isfile(docs)
        else next(
            os.path.join(docs, f) for f in os.listdir(docs) if f.endswith(".parquet")
        )
    )  # declared table
    fn(spark, priv).collect()
    assert len(warehouse_entries(wh)) == 2, "declared input did not invalidate"
    shutil.rmtree(priv, ignore_errors=True)


def test_hit_racing_eviction_falls_through_to_recompute(
    spark, sf_dir, monkeypatch
):
    """ADVICE r11: a hit whose entry is deleted by a concurrent evictor
    between the marker check and the LRU utime must RECOMPUTE (miss
    path), not return a scan over the deleted directory. Injected by a
    utime that deletes the entry then raises OSError — the exact race,
    collapsed to one thread."""
    import os as _os
    import shutil

    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/nation.parquet"]
    _r, hit = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    assert hit is False
    entry = next(e for e in os.listdir(wh) if not e.startswith("."))

    real_utime = _os.utime

    def racing_utime(path, *a, **k):
        if path.endswith("_SUCCESS"):
            shutil.rmtree(os.path.join(wh, entry), ignore_errors=True)
            raise OSError("concurrent eviction")
        return real_utime(path, *a, **k)

    monkeypatch.setattr("filemap_spark.plans.memo.os.utime", racing_utime)
    r, hit = cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    monkeypatch.undo()
    assert hit is False  # fell through to the miss path
    assert canonical_rows(r.toPandas()) == canonical_rows(
        _agg(spark, sf_dir).toPandas()
    )


def test_memo_wrapped_op_stays_oracle_green(spark, sf_dir, monkeypatch):
    """Round-12 coverage-growth pin (VERDICT r11 task 9): the newly
    memo-capable ops pass the SAME differential oracle check the driver
    runs — once on the miss path (materializing) and once on the hit path
    (scanning the warehouse). The driver path (wrap off) is covered by
    the regular grading ledger; this pins the wrapped path."""
    from filemap_spark.registry import all_oracle, all_queries
    from filemap_spark.testing import run_one

    _fresh_warehouse(monkeypatch)
    monkeypatch.setenv("FILEMAP_MEMO", "1")
    q = all_queries()
    oracles = all_oracle()
    for name in ("graph_jaccard_neighbors", "text_bigram_pmi", "sample_shuffle_global"):
        miss = run_one(name, q[name], oracles[name], spark, sf_dir)
        assert miss.ok, (name, miss)
        hit = run_one(name, q[name], oracles[name], spark, sf_dir)
        assert hit.ok, (name, hit)


def test_memoized_query_source_rewrite_invalidates(
    spark, sf_dir, monkeypatch, tmp_path
):
    """The 'command changed' make edge (ADVICE r11 medium): the registry
    memo key folds in the op's SOURCE hash, so rewriting an op — same
    module, same qualname — re-keys it even though the plan may be
    hidden behind an opaque checkpointed subplan. Same source twice must
    still share one entry."""
    import importlib.util
    import linecache

    from filemap_spark.plans.memo import memoized_query, warehouse_entries

    wh = _fresh_warehouse(monkeypatch)
    mod_path = tmp_path / "memo_op_mod.py"
    src = (
        "from pyspark.sql import functions as F\n"
        "from filemap_spark.io import load_table\n"
        "def op(spark, sf_dir):\n"
        "    return (load_table(spark, sf_dir, 'nation')\n"
        "        .groupBy('n_regionkey')\n"
        "        .agg(F.count('*').alias('{alias}'))\n"
        "        .orderBy('n_regionkey'))\n"
    )

    def load(alias: str):
        mod_path.write_text(src.format(alias=alias))
        linecache.clearcache()  # getsource caches file lines by path
        spec = importlib.util.spec_from_file_location("memo_op_mod", mod_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.op

    memoized_query(load("n"), ("nation",))(spark, sf_dir).collect()
    assert len(warehouse_entries(wh)) == 1
    memoized_query(load("n"), ("nation",))(spark, sf_dir).collect()
    assert len(warehouse_entries(wh)) == 1, "identical source re-keyed"
    memoized_query(load("n2"), ("nation",))(spark, sf_dir).collect()
    assert len(warehouse_entries(wh)) == 2, "source rewrite did not invalidate"


def test_evict_lru_drops_oldest_keeps_hot_and_newest(spark, sf_dir):
    """LRU discipline: a HIT refreshes an entry's recency (marker utime),
    eviction drops the least-recently-used first, and the newest entry
    survives even when the bound is 0."""
    from pyspark.sql import functions as F

    from filemap_spark.plans.memo import cached, evict_lru, warehouse_entries

    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/nation.parquet"]
    frames = [
        _agg(spark, sf_dir),
        _agg(spark, sf_dir).where(F.col("n") > 0),
        _agg(spark, sf_dir).where(F.col("n") > 1),
    ]
    for df in frames:
        cached(spark, df, inputs, warehouse=wh)
        time.sleep(0.02)
    # touch entry 0 via a hit: it becomes the most recently USED
    cached(spark, frames[0], inputs, warehouse=wh)
    entries = warehouse_entries(wh)
    assert len(entries) == 3
    total = sum(e["bytes"] for e in entries)
    # bound that forces exactly one eviction: the LRU victim is frames[1]
    evicted = evict_lru(wh, total - 1)
    assert len(evicted) == 1
    keys = {e["key"] for e in warehouse_entries(wh)}
    assert len(keys) == 2
    # frames[0] (hot) and frames[2]-or-frames[0]... recompute: remaining
    # must include the hit-refreshed entry
    r0, hit0 = cached(spark, frames[0], inputs, warehouse=wh)
    assert hit0, "hit-refreshed entry was evicted before colder ones"
    # bound 0: everything but the newest goes
    evict_lru(wh, 0)
    assert len(warehouse_entries(wh)) == 1


def test_concurrent_writers_no_torn_reads(spark, sf_dir):
    """Two sessions sharing a warehouse race to materialize the SAME key:
    both must return the full correct rows (loser adopts the winner's
    committed entry), and exactly one committed entry remains."""
    from concurrent.futures import ThreadPoolExecutor

    from filemap_spark.plans.memo import cached, warehouse_entries

    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/lineitem.parquet"]

    def build():
        from filemap_spark.io import load_table

        li = load_table(spark, sf_dir, "lineitem")
        return (
            li.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
            .orderBy("l_returnflag")
        )

    expected = canonical_rows(build().toPandas())

    def run(_i):
        df, _hit = cached(spark, build(), inputs, warehouse=wh)
        return canonical_rows(df.toPandas())

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run, range(4)))
    for got in results:
        assert got == expected
    assert len(warehouse_entries(wh)) == 1
    entries = os.listdir(wh)
    assert all(not e.startswith(".") for e in entries), entries  # no staging left


def test_cli_memo_ls_rm_evict(spark, sf_dir, capsys):
    """The `memo` CLI verb: ls prints key/bytes/mtime/files rows, rm
    drops by key prefix, evict applies the LRU bound."""
    from pyspark.sql import functions as F

    from filemap_spark.cli import main as cli_main
    from filemap_spark.plans.memo import cached, warehouse_entries

    wh = tempfile.mkdtemp(prefix="memo_wh_")
    inputs = [f"{sf_dir}/nation.parquet"]
    cached(spark, _agg(spark, sf_dir), inputs, warehouse=wh)
    cached(spark, _agg(spark, sf_dir).where(F.col("n") > 0), inputs, warehouse=wh)
    rc = cli_main(["memo", "ls", "--warehouse", wh])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2 and all(len(l.split("\t")) == 4 for l in out)
    victim = out[0].split("\t")[0]
    # destructive-default guards: bare rm and unbounded evict must refuse
    rc = cli_main(["memo", "rm", "--warehouse", wh])
    assert rc == 2 and len(warehouse_entries(wh)) == 2
    rc = cli_main(["memo", "evict", "--warehouse", wh])
    assert rc == 2 and len(warehouse_entries(wh)) == 2
    capsys.readouterr()
    rc = cli_main(["memo", "rm", "--warehouse", wh, "--key", victim[:16]])
    assert rc == 0
    assert {e["key"] for e in warehouse_entries(wh)} == {out[1].split("\t")[0]}
    rc = cli_main(["memo", "evict", "--warehouse", wh, "--max-bytes", "0"])
    assert rc == 0
    assert len(warehouse_entries(wh)) == 1  # newest always survives


def test_memoized_query_helper_rewrite_invalidates(
    spark, sf_dir, monkeypatch, tmp_path
):
    """ADVICE r12 medium: the fingerprint covers the op's whole MODULE, so
    rewriting a shared HELPER the op calls — op function source unchanged —
    re-keys the cache entry. Round 12 itself rewrote such a helper
    (_unigram_scored); a persistent warehouse must not serve stale results
    across that edit."""
    import importlib.util
    import linecache

    from filemap_spark.plans.memo import memoized_query, warehouse_entries

    wh = _fresh_warehouse(monkeypatch)
    mod_path = tmp_path / "memo_helper_mod.py"
    src = (
        "from pyspark.sql import functions as F\n"
        "from filemap_spark.io import load_table\n"
        "def helper(df):\n"
        "    return df.groupBy('n_regionkey').agg(F.count('*').alias('{a}'))\n"
        "def op(spark, sf_dir):\n"
        "    return helper(load_table(spark, sf_dir, 'nation'))"
        ".orderBy('n_regionkey')\n"
    )

    def load(alias: str):
        mod_path.write_text(src.format(a=alias))
        linecache.clearcache()
        spec = importlib.util.spec_from_file_location(
            "memo_helper_mod", mod_path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.op

    memoized_query(load("n"), ("nation",))(spark, sf_dir).collect()
    assert len(warehouse_entries(wh)) == 1
    memoized_query(load("n"), ("nation",))(spark, sf_dir).collect()
    assert len(warehouse_entries(wh)) == 1, "identical module re-keyed"
    # rewrite ONLY the helper body: op's own source is byte-identical
    memoized_query(load("m"), ("nation",))(spark, sf_dir).collect()
    assert len(warehouse_entries(wh)) == 2, (
        "helper rewrite did not invalidate the dependent op"
    )


def test_fn_fingerprint_bytecode_fallback_is_stable_and_distinct():
    """ADVICE r12 low: when inspect.getsource fails (zip/frozen installs),
    the fallback hashes compiled bytecode — stable across separate
    compiles of the same source (even with nested lambdas, whose repr
    holds a memory address) and DISTINCT for different code, so two code
    versions never share a warehouse key."""
    from filemap_spark.plans.memo import _fn_fingerprint

    def compile_fn(body: str):
        ns: dict = {}
        exec(body, ns)  # exec'd code has no retrievable source
        return ns["op"]

    src_a = "def op(x):\n    f = lambda v: v * 2\n    return f(x) + 1\n"
    src_b = "def op(x):\n    f = lambda v: v * 3\n    return f(x) + 1\n"
    a1, a2 = _fn_fingerprint(compile_fn(src_a)), _fn_fingerprint(compile_fn(src_a))
    b = _fn_fingerprint(compile_fn(src_b))
    assert a1 == a2, "same exec'd source must fingerprint identically"
    assert a1 != b, "different bytecode must not share a key"


def test_fn_fingerprint_folds_in_shared_helper_sources(monkeypatch):
    """ADVICE r13: helpers in filemap_spark/functions/* are part of every
    memoized command's closure but live outside the op's module — a
    helper edit must re-key the warehouse. _helper_sources must actually
    read the functions package, and its content must flow into the
    fingerprint."""
    from filemap_spark.plans import memo

    srcs = memo._helper_sources()
    assert any("block_pigeonhole_pairs" in s for s in srcs), (
        "functions/blocked.py source missing from the helper closure"
    )
    assert any("decode_gray_fast" in s for s in srcs), (
        "functions/jpeg.py source missing from the helper closure"
    )

    def probe(spark, sf_dir):  # a stand-in memoized op
        return None

    before = memo._fn_fingerprint(probe)
    monkeypatch.setattr(
        memo, "_helper_sources", lambda: srcs + ["# edited helper"]
    )
    after = memo._fn_fingerprint(probe)
    assert before != after, "helper edit did not re-key the fingerprint"


def test_bpe_merge_artifact_trains_once_per_corpus(spark, sf_dir, monkeypatch):
    """VERDICT r14 task 4: the learned BPE merge table is a warehouse
    artifact keyed by (trainer code closure ⊕ documents fingerprint), so
    an apply + pack pair on the same corpus executes the 2·k-job trainer
    exactly ONCE — every later consumer loads ≤20 parquet rows. The
    kernel pins (tests/test_kernels.py) are unchanged: the merges are
    byte-identical either way, asserted here against a direct trainer
    run."""
    _fresh_warehouse(monkeypatch)
    from filemap_spark.operators import text as text_ops

    runs0 = text_ops._BPE_TRAIN_RUNS
    apply_rows = canonical_rows(text_ops.text_bpe_apply(spark, sf_dir).toPandas())
    assert text_ops._BPE_TRAIN_RUNS == runs0 + 1, "first call must train"
    pack_rows = canonical_rows(
        text_ops.text_bpe_pack_sequences(spark, sf_dir).toPandas()
    )
    apply_again = canonical_rows(text_ops.text_bpe_apply(spark, sf_dir).toPandas())
    assert text_ops._BPE_TRAIN_RUNS == runs0 + 1, (
        "pack + second apply must HIT the merge artifact, not retrain"
    )
    assert apply_again == apply_rows
    assert pack_rows[1], "pack produced no windows"

    # artifact content == a direct (uncached) trainer run, row for row
    cached_merges = text_ops._bpe_learned_merges(spark, sf_dir)
    assert text_ops._BPE_TRAIN_RUNS == runs0 + 1
    direct = [
        (r["left"], r["right"])
        for r in text_ops.text_bpe_train(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert text_ops._BPE_TRAIN_RUNS == runs0 + 2
    assert cached_merges == direct


def test_nb_base_count_artifact_ingests_once_per_corpus(
    spark, sf_dir, monkeypatch
):
    """VERDICT r15 task 4's make-semantics pin (the _BPE_TRAIN_RUNS
    precedent): `text_quality_incremental`'s base-corpus count table is
    a warehouse artifact keyed by (producer code closure ⊕ documents
    fingerprint), so back-to-back runs on the same corpus execute the
    base ingest exactly ONCE — the second call pays only the delta agg
    and the scoring pass. Output identity across the hit is asserted
    row for row."""
    _fresh_warehouse(monkeypatch)
    from filemap_spark.operators import text as text_ops

    runs0 = text_ops._NB_INGEST_RUNS
    first = canonical_rows(
        text_ops.text_quality_incremental(spark, sf_dir).toPandas()
    )
    assert text_ops._NB_INGEST_RUNS == runs0 + 1, "first call must ingest"
    second = canonical_rows(
        text_ops.text_quality_incremental(spark, sf_dir).toPandas()
    )
    assert text_ops._NB_INGEST_RUNS == runs0 + 1, (
        "second call must HIT the count-table artifact, not re-ingest"
    )
    assert second == first
