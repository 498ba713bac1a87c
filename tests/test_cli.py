"""fm-style CLI semantics (filemap parity surface, SURVEY §3.1):
map/mapreduce shell pipelines over text datasets, make-like memoization,
and incremental (new-files-only) streaming runs."""

from __future__ import annotations

import os

from filemap_spark.cli import (
    _fingerprint,
    _memo_hit,
    _write_memo,
    main,
    run_map,
    run_map_stream,
    run_pipeline,
)


def _write_lines(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_map_shell_pipeline(spark, tmp_path):
    src = tmp_path / "in"
    _write_lines(str(src / "a.txt"), ["apple pie", "banana split", "apple cake"])
    out = str(tmp_path / "out")
    n = run_map(spark, str(src), out, "grep apple")
    rows = {r["value"] for r in spark.read.text(out).collect()}
    assert n == 2
    assert rows == {"apple pie", "apple cake"}


def test_mapreduce_wordcount_matches_native(spark, tmp_path):
    src = tmp_path / "in"
    _write_lines(str(src / "a.txt"), ["a b a", "b a c"])
    _write_lines(str(src / "b.txt"), ["c a"])
    out = str(tmp_path / "out")
    run_map(
        spark,
        str(src),
        out,
        cmd="tr ' ' '\\n'",
        reduce_cmd="sort | uniq -c | awk '{print $2, $1}'",
        buckets=4,
    )
    got = {}
    for r in spark.read.text(out).collect():
        word, n = r["value"].split(" ")
        got[word] = int(n)
    assert got == {"a": 4, "b": 2, "c": 2}


def test_memo_fingerprint_tracks_inputs_and_commands(tmp_path):
    src = tmp_path / "in"
    _write_lines(str(src / "a.txt"), ["x"])
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    fp1 = _fingerprint(str(src), ["grep x"])
    _write_memo(out, fp1)
    assert _memo_hit(out, fp1)
    # command change -> miss
    assert not _memo_hit(out, _fingerprint(str(src), ["grep y"]))
    # input change -> miss
    _write_lines(str(src / "b.txt"), ["y"])
    assert not _memo_hit(out, _fingerprint(str(src), ["grep x"]))


def test_pipeline_chains_stages_with_per_stage_memo(spark, tmp_path, capsys):
    """3-stage chained pipeline (map → reduce → map) in ONE invocation, each
    stage a memoized dataset dir; a re-run with --memo reuses every stage,
    and editing a mid-pipeline command recomputes only that stage onward."""
    src = tmp_path / "in"
    _write_lines(str(src / "a.txt"), ["a b a", "b a c"])
    _write_lines(str(src / "b.txt"), ["c a"])
    out = str(tmp_path / "out")
    stages = [
        ("map", "tr ' ' '\\n'"),
        ("reduce", "sort | uniq -c | awk '{print $2, $1}'"),
        ("map", "grep -v '^c '"),  # stage-2 filter: drop the word "c"
    ]
    n = run_pipeline(spark, str(src), out, stages, buckets=4, memo=True)
    final = os.path.join(out, "final")
    got = dict(r["value"].split(" ") for r in spark.read.text(final).collect())
    assert got == {"a": "4", "b": "2"}
    assert n == 2
    # stage dirs materialized with memo markers
    assert os.path.exists(os.path.join(out, "stage00", "_filemap_memo.json"))
    assert os.path.exists(os.path.join(out, "stage01", "_filemap_memo.json"))
    assert os.path.exists(os.path.join(final, "_filemap_memo.json"))

    # full re-run: every stage is a memo hit (outputs untouched)
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "_SUCCESS"))
        for d in ("stage00", "stage01", "final")
    }
    n2 = run_pipeline(spark, str(src), out, stages, buckets=4, memo=True)
    assert n2 == 2
    for d, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "_SUCCESS")) == t, d

    # change the LAST stage's command: stages 0-1 reuse, final recomputes
    stages2 = stages[:2] + [("map", "grep -v '^a '")]
    n3 = run_pipeline(spark, str(src), out, stages2, buckets=4, memo=True)
    got3 = dict(r["value"].split(" ") for r in spark.read.text(final).collect())
    assert got3 == {"b": "2", "c": "2"}
    assert n3 == 2
    for d in ("stage00", "stage01"):
        assert os.path.getmtime(os.path.join(out, d, "_SUCCESS")) == mtimes[d], d
    assert os.path.getmtime(os.path.join(final, "_SUCCESS")) != mtimes["final"]


def _dataset_bytes(d: str) -> dict[str, bytes]:
    """Per-partition data-file bytes of a stage dir, keyed by partition
    index (part file names embed a per-job UUID; the index + contents are
    the deterministic artifact)."""
    return {
        f.split("-")[1]: open(os.path.join(d, f), "rb").read()
        for f in sorted(os.listdir(d))
        if f.startswith("part-")
    }


def test_pipeline_middle_stage_edit_recomputes_downstream_only(
    spark, tmp_path
):
    """Filemap's actual make semantics at pipeline depth (VERDICT r12
    task 5): in a 3-stage memoized pipeline, editing the MIDDLE stage's
    command in one run must (a) reuse stage 0 (memo hit, output
    untouched), (b) recompute stages 1..n, and (c) leave artifacts
    byte-identical to a cold run of the edited pipeline — proving the
    cascade recomputes from the right inputs, not from stale state."""
    src = tmp_path / "in"
    _write_lines(str(src / "a.txt"), ["a b a", "b a c"])
    _write_lines(str(src / "b.txt"), ["c a"])
    out = str(tmp_path / "out")
    stages = [
        ("map", "tr ' ' '\\n'"),
        ("reduce", "sort | uniq -c | awk '{print $2, $1}'"),
        ("map", "cat"),
    ]
    run_pipeline(spark, str(src), out, stages, buckets=4, memo=True)
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "_SUCCESS"))
        for d in ("stage00", "stage01", "final")
    }

    # edit the MIDDLE stage: count -> presence flag
    stages2 = [
        stages[0],
        ("reduce", "sort | uniq | awk '{print $1, \"seen\"}'"),
        stages[2],
    ]
    run_pipeline(spark, str(src), out, stages2, buckets=4, memo=True)
    final = os.path.join(out, "final")
    got = dict(
        r["value"].split(" ") for r in spark.read.text(final).collect()
    )
    assert got == {"a": "seen", "b": "seen", "c": "seen"}
    # upstream reuse: stage 0 untouched; downstream invalidation: 1 + final
    assert (
        os.path.getmtime(os.path.join(out, "stage00", "_SUCCESS"))
        == mtimes["stage00"]
    )
    for d in ("stage01", "final"):
        assert os.path.getmtime(os.path.join(out, d, "_SUCCESS")) != mtimes[d], d

    # byte-identity vs a cold run of the edited pipeline into a fresh dir
    cold = str(tmp_path / "cold")
    run_pipeline(spark, str(src), cold, stages2, buckets=4, memo=True)
    for d in ("stage01", "final"):
        assert _dataset_bytes(os.path.join(out, d)) == _dataset_bytes(
            os.path.join(cold, d)
        ), d


def test_pipeline_cli_verb_orders_stages(tmp_path):
    """`pipeline` verb collects --cmd/--reduce in command-line order."""
    src = tmp_path / "in"
    _write_lines(str(src / "a.txt"), ["b a", "a a"])
    out = str(tmp_path / "out")
    rc = main(
        [
            "pipeline",
            str(src),
            out,
            "--cmd",
            "tr ' ' '\\n'",
            "--reduce",
            "sort | uniq -c | awk '{print $2, $1}'",
            "--buckets",
            "2",
        ]
    )
    assert rc == 0
    import glob

    lines = set()
    for f in glob.glob(os.path.join(out, "final", "part-*")):
        lines |= {ln for ln in open(f).read().splitlines() if ln}
    assert lines == {"a 3", "b 1"}


def test_stream_processes_only_new_files(spark, tmp_path):
    src = tmp_path / "in"
    out = str(tmp_path / "out")
    _write_lines(str(src / "a.txt"), ["one", "two"])
    n1 = run_map_stream(spark, str(src), out, "cat")
    assert n1 == 2
    # second run with a new file: only its lines are appended
    _write_lines(str(src / "b.txt"), ["three"])
    n2 = run_map_stream(spark, str(src), out, "cat")
    assert n2 == 3
    vals = sorted(r["value"] for r in spark.read.text(os.path.join(out, "data")).collect())
    assert vals == ["one", "three", "two"]


def test_query_verb_runs_sql_over_views(spark, sf_dir, tmp_path, capsys):
    """`query` registers the contract tables as views and executes SQL
    through the same Catalyst path; --output materializes the result as a
    parquet dataset instead of printing."""
    from filemap_spark.cli import run_query

    n = run_query(
        spark,
        sf_dir,
        "SELECT r_name, count(*) AS n FROM region GROUP BY r_name ORDER BY r_name",
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert n == 5 and len(out) == 6  # header + 5 regions
    assert out[0] == "r_name\tn"

    dest = str(tmp_path / "res")
    n2 = run_query(spark, sf_dir, "SELECT * FROM nation", output=dest)
    assert n2 == 25
    assert spark.read.parquet(dest).count() == 25


def test_dedup_verb_materializes_survivor_corpus(spark, sf_dir, tmp_path):
    """`dedup` writes a survivors-only documents.parquet whose membership
    matches the graded operators' survivor rules, and its output directory
    is itself a readable corpus dir (dataset chaining)."""
    from filemap_spark import all_queries
    from filemap_spark.cli import run_dedup
    from filemap_spark.io import load_table

    out_near = str(tmp_path / "near")
    kept, total = run_dedup(spark, sf_dir, out_near, method="near")
    assert total == load_table(spark, sf_dir, "documents").count()
    expected = {
        r["doc_id"]
        for r in all_queries()["dedup_materialize_clean"](spark, sf_dir).collect()
    }
    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out_near, "documents.parquet")).collect()
    }
    assert got == expected and kept == len(expected)

    # exact: contract texts are all distinct, so exact dedup keeps everything
    out_exact = str(tmp_path / "exact")
    kept_e, total_e = run_dedup(spark, sf_dir, out_exact, method="exact")
    assert kept_e == total_e == total

    # chaining: the output dir is a valid corpus dir for another pass
    kept2, total2 = run_dedup(spark, out_near, str(tmp_path / "near2"), method="exact")
    assert total2 == kept and kept2 == kept


def test_dedup_verb_substring_cuts_masked_spans(spark, tmp_path):
    """`dedup --method substring` (round 17): every doc survives, but the
    tokens inside dedup_exact_substring's maximal duplicated spans are
    CUT from the text — verified against the graded op's own mask on a
    planted corpus (one 60-token cross-doc run, one clean doc, one doc
    that is entirely a duplicated run and must survive EMPTY), with
    n_chars rewritten and the output chainable."""
    from filemap_spark.cli import run_dedup, run_stats
    from filemap_spark.operators.text import (
        _SUBSTR_SPAN_TOKENS as L,
        dedup_exact_substring,
    )

    shared = [f"s{i}" for i in range(60)]
    rep = [f"r{i}" for i in range(L)]
    docs = {
        1: [f"a{i}" for i in range(20)] + shared + [f"a{i}" for i in range(20, 40)],
        2: [f"b{i}" for i in range(5)] + shared + [f"b{i}" for i in range(5, 30)],
        3: [f"c{i}" for i in range(70)],  # clean: untouched
        4: rep,  # duplicated wholesale below...
        5: rep,  # ...so both survive with empty text
    }
    rows = [(i, " ".join(t)) for i, t in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' as lang", "'src0' as source",
        "cast(length(text) as long) as n_chars",
    )
    src = tmp_path / "substr_src"
    src.mkdir()
    df.write.parquet(str(src / "documents.parquet"))

    out = str(tmp_path / "substr_out")
    kept, total = run_dedup(spark, str(src), out, method="substring")
    assert kept == total == 5  # nothing dropped; text is rewritten

    mask = {}
    for r in dedup_exact_substring(spark, str(src)).collect():
        mask.setdefault(r["doc_id"], set()).update(
            range(r["span_start"], r["span_end"] + 1)
        )
    got = {
        r["doc_id"]: r
        for r in spark.read.parquet(
            os.path.join(out, "documents.parquet")
        ).collect()
    }
    for i, toks in docs.items():
        want_text = " ".join(
            w for p, w in enumerate(toks, start=1)
            if p not in mask.get(i, set())
        )
        assert got[i]["text"] == want_text, i
        assert got[i]["n_chars"] == len(want_text)
    assert got[3]["text"] == " ".join(docs[3])  # clean doc untouched
    assert got[4]["text"] == "" and got[5]["text"] == ""
    assert run_stats(spark, out)["n_docs"] == 5  # chainable


def test_dedup_stream_incremental_two_batches(spark, tmp_path):
    """`dedup --stream` end-to-end (round 5, VERDICT r4 task 7): two-batch
    file arrival through the Structured-Streaming file source + persisted
    LSH index. The second run must ingest ONLY the new file's docs (the
    ledger grows by exactly that batch; state shingles for batch-1 docs are
    not recomputed), and the final survivors corpus must equal a
    from-scratch near-dedup of the union."""
    import os

    from filemap_spark.cli import run_dedup, run_dedup_stream

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = {
        1: base + " every single day without fail in the morning",
        2: base + " every single day without fail in the morning",  # dup of 1
        3: "completely different text about spark catalyst optimizer plans "
           "and distributed shuffle exchange strategies at petabyte scale",
        4: base + " every single day without fail in the evening",  # near-dup
    }
    corpus = tmp_path / "corpus"
    corpus.mkdir()

    def write_batch(name, ids):
        rows = [(i, docs[i], "en", "test", len(docs[i])) for i in ids]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("append").parquet(str(corpus))

    out = str(tmp_path / "dedup_out")
    write_batch("b1", [1, 3])
    kept1, total1 = run_dedup_stream(spark, str(corpus), out)
    assert (kept1, total1) == (2, 2)  # no dups inside batch 1
    state = os.path.join(out, "_lsh_state")
    ledger1 = spark.read.parquet(os.path.join(state, "ingested.parquet"))
    assert {r["doc_id"] for r in ledger1.collect()} == {1, 3}
    sh1 = spark.read.parquet(os.path.join(state, "shingles.parquet")).count()

    write_batch("b2", [2, 4])
    kept2, total2 = run_dedup_stream(spark, str(corpus), out)
    assert total2 == 4
    ledger2 = spark.read.parquet(os.path.join(state, "ingested.parquet"))
    assert {r["doc_id"] for r in ledger2.collect()} == {1, 2, 3, 4}
    # only batch-2's NOVEL texts were shingled in run 2 (rep-level index,
    # round 10): doc 2 is an exact dup of indexed doc 1 so it adds nothing;
    # state grew by exactly doc 4's shingles (batch-1 docs never recomputed)
    from filemap_spark.operators.text import _shingle_frame

    b2_novel = spark.createDataFrame(
        [(4, docs[4])], "doc_id long, text string"
    )
    sh2 = spark.read.parquet(os.path.join(state, "shingles.parquet")).count()
    assert sh2 - sh1 == _shingle_frame(b2_novel).count()

    # survivors == from-scratch batch near-dedup over the union corpus
    batch_out = str(tmp_path / "batch_out")
    # run_dedup expects a corpus dir with documents.parquet
    union_dir = tmp_path / "union"
    union_dir.mkdir()
    spark.read.parquet(str(corpus)).write.mode("overwrite").parquet(
        str(union_dir / "documents.parquet")
    )
    run_dedup(spark, str(union_dir), batch_out, method="near")
    want = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(batch_out, "documents.parquet")
        ).collect()
    }
    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "documents.parquet")).collect()
    }
    assert got == want and kept2 == len(got)

    # third run with nothing new: cheap no-op, corpus unchanged
    kept3, total3 = run_dedup_stream(spark, str(corpus), out)
    assert (kept3, total3) == (kept2, 4)

    # crash-recovery (round 10): a _pairs compaction that died between
    # its two swap renames leaves the accumulated pairs stranded in
    # _pairs.compact_old — the next run must HEAL before the stream can
    # append (a fresh append would recreate _pairs and the post-drain
    # recovery would then delete the historical pairs), so the survivor
    # corpus comes out unchanged
    pairs_dir = os.path.join(out, "_pairs")
    os.rename(pairs_dir, pairs_dir + ".compact_old")
    kept4, total4 = run_dedup_stream(spark, str(corpus), out)
    assert (kept4, total4) == (kept2, 4)
    assert os.path.isdir(pairs_dir)
    assert not os.path.exists(pairs_dir + ".compact_old")


def test_compact_verb_rewrites_fragmented_dataset(spark, sf_dir, tmp_path):
    """`compact` rewrites a many-small-files dataset as the requested file
    count with nothing lost (round 5; wraps compact_parquet_dataset)."""
    from filemap_spark.cli import run_compact
    from filemap_spark.io import load_table

    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    nation = load_table(spark, sf_dir, "nation")
    nation.repartition(10).write.mode("overwrite").parquet(frag)
    before, after, rows = run_compact(spark, frag, out, "n_nationkey", target_files=2)
    assert before == 10 and after == 2
    assert rows == nation.count()


def test_stats_verb_reports_corpus_health(spark, sf_dir):
    """`stats` must agree with direct computation and with the graded
    gini operator."""
    from filemap_spark import all_queries
    from filemap_spark.cli import run_stats
    from filemap_spark.io import load_table

    got = run_stats(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert got["n_docs"] == docs.count()
    assert got["n_docs_in_exact_dup_groups"] == 0  # contract corpus: no dups
    gini_op = all_queries()["agg_gini_concentration"](spark, sf_dir).collect()[0]
    assert got["length_gini"] == gini_op["gini"]
    assert got["n_langs"] >= 1 and got["n_tokens"] > got["n_docs"]


def test_quality_verb_gates_corpus(spark, sf_dir, tmp_path):
    """`quality` materializes exactly the gopher-rule keepers, audit counts
    reconcile, and the output is a chainable corpus dir."""
    from filemap_spark.cli import run_quality, run_stats
    from filemap_spark.io import load_table
    from filemap_spark.operators.text import text_gopher_rules

    out = str(tmp_path / "gated")
    audit = run_quality(spark, sf_dir, out)
    verdicts = text_gopher_rules(spark, sf_dir).collect()
    expect_kept = {r["doc_id"] for r in verdicts if r["verdict"] == "keep"}
    kept_docs = spark.read.parquet(f"{out}/documents.parquet")
    assert {r["doc_id"] for r in kept_docs.select("doc_id").collect()} == expect_kept
    assert audit["kept"] == len(expect_kept)
    assert audit["scored"] == audit["n_docs"] == len(verdicts)
    for c in ("r_len", "r_word_len", "r_short", "r_rep", "r_stop"):
        assert audit[f"fail_{c}"] == sum(1 for r in verdicts if not r[c])
    # chainable: stats runs over the gated output
    assert run_stats(spark, out)["n_docs"] == len(expect_kept)


def test_quality_verb_clean_lines_rewrites_text(spark, sf_dir, tmp_path):
    """--clean-lines strips cross-corpus duplicated lines BEFORE gating:
    every surviving text equals dedup_line_level's clean_text and the
    lines_removed audit matches the operator's arithmetic."""
    from filemap_spark.cli import run_quality
    from filemap_spark.operators.text import dedup_line_level

    out = str(tmp_path / "gated_clean")
    audit = run_quality(spark, sf_dir, out, clean_lines=True)
    cleaned = {r["doc_id"]: r for r in dedup_line_level(spark, sf_dir).collect()}
    assert audit["lines_removed"] == sum(
        r["n_paras"] - r["n_kept"] for r in cleaned.values()
    )
    kept_docs = spark.read.parquet(f"{out}/documents.parquet").collect()
    assert 0 < len(kept_docs) <= audit["scored"] <= audit["n_docs"]
    for r in kept_docs:
        assert r["text"] == cleaned[r["doc_id"]]["clean_text"]
        assert r["n_chars"] == len(r["text"])


def test_quality_verb_survives_empty_corpus(spark, tmp_path):
    """Chaining `quality` after a run that kept zero docs must not crash:
    aggregates over an empty corpus are NULL and every audit counter must
    coalesce to 0 (regression: int(None) TypeError)."""
    from filemap_spark.cli import run_quality

    empty_corpus = str(tmp_path / "empty")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{empty_corpus}/documents.parquet")
    audit = run_quality(spark, empty_corpus, out)
    assert audit["n_docs"] == audit["scored"] == audit["kept"] == 0
    assert all(audit[f"fail_{c}"] == 0 for c in ("r_len", "r_word_len", "r_short", "r_rep", "r_stop"))
    assert spark.read.parquet(f"{out}/documents.parquet").count() == 0
    # --clean-lines over the empty corpus must also hold, and leave no
    # _cleaned residue inside OUTPUT
    out2 = str(tmp_path / "out2")
    audit2 = run_quality(spark, empty_corpus, out2, clean_lines=True)
    assert audit2["kept"] == 0 and audit2["lines_removed"] == 0
    import os

    assert not os.path.exists(os.path.join(out2, "_cleaned"))


def test_tpch_verb_runs_selected_queries(spark, sf_dir, tmp_path, capsys):
    """tpch verb: the 22-shape map is complete, a subset runs through
    main(), and --output lands parquet per query (the production sink
    path)."""
    from filemap_spark.cli import TPCH_QUERIES, run_tpch

    assert sorted(TPCH_QUERIES) == sorted(f"q{i}" for i in range(1, 23))
    out = str(tmp_path / "tpch")
    rc = main(["tpch", sf_dir, "--query", "q6", "--query", "q13", "--output", out])
    assert rc == 0
    lines = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("q")
    ]
    assert [l.split("\t")[0] for l in lines] == ["q6", "q13"]
    assert int(lines[0].split("\t")[2]) == 1  # q6 is a scalar row
    got = spark.read.parquet(os.path.join(out, "q13.parquet"))
    direct = run_tpch(spark, sf_dir, which=["q13"])
    assert got.count() == direct[0][2]


def test_ops_catalog_lists_full_registry(capsys):
    """`filemap_spark ops` browses the whole registry without a
    SparkSession; --family filters to one module; every line carries
    (id, family, check-type, first-docstring-line)."""
    rc = main(["ops"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    from filemap_spark.registry import _META

    # registry-SIZE pinning lives in test_registry_order.py; here only
    # completeness matters (ADVICE r9: a literal 297 would make every
    # future registration edit this CLI test for no added coverage)
    assert len(lines) == len(_META)
    ids = [l.split("\t")[0] for l in lines]
    assert ids == sorted(ids)
    assert all(len(l.split("\t")) == 4 for l in lines)

    rc = main(["ops", "--family", "windows"])
    assert rc == 0
    fam_lines = capsys.readouterr().out.strip().splitlines()
    assert fam_lines and all(l.split("\t")[1] == "windows" for l in fam_lines)
    checks = {l.split("\t")[2] for l in lines}
    assert checks == {"oracle", "rows-only"}


def test_dedup_modality_batch_and_stream_chain(spark, tmp_path):
    """`dedup --modality image|audio` (round 15, VERDICT r14 task 7):
    the perceptual fingerprint paths through BOTH the batch verb and the
    incremental --stream verb. Two-batch arrival through the persisted
    fingerprint ledger must (a) ingest delta-only (the ledger grows by
    exactly the arriving batch), (b) surface the exact-duplicate pair
    that spans the two batches, and (c) leave a survivors corpus
    identical to a from-scratch batch `dedup --modality X` of the union
    — the chained-corpus invariant the text test pins."""
    from filemap_spark.cli import run_dedup, run_dedup_stream

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "every single day without fail"
    )
    docs = {
        1: base + " in the morning",
        2: base + " in the morning",  # exact dup of 1, arrives in batch 2
        3: "completely different text about spark catalyst optimizer "
           "plans and distributed shuffle exchange strategies",
        4: base + " in the evening",
    }

    for modality in ("image", "audio"):
        root = tmp_path / modality
        corpus = root / "corpus"
        corpus.mkdir(parents=True)

        def write_batch(ids):
            rows = [(i, docs[i], "en", "test", len(docs[i])) for i in ids]
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, "
                "n_chars long",
            ).coalesce(1).write.mode("append").parquet(str(corpus))

        out = str(root / "stream_out")
        write_batch([1, 3])
        kept1, total1 = run_dedup_stream(
            spark, str(corpus), out, modality=modality
        )
        assert (kept1, total1) == (2, 2)  # no dups inside batch 1
        ledger = os.path.join(out, "_fp_state", "fingerprints.parquet")
        ids1 = {r["doc_id"] for r in spark.read.parquet(ledger).collect()}
        assert ids1 == {1, 3}

        write_batch([2, 4])
        kept2, total2 = run_dedup_stream(
            spark, str(corpus), out, modality=modality
        )
        assert total2 == 4
        ids2 = {r["doc_id"] for r in spark.read.parquet(ledger).collect()}
        assert ids2 == {1, 2, 3, 4}  # grew by exactly batch 2
        # the cross-batch exact duplicate must have been dropped
        stream_kept = {
            r["doc_id"]
            for r in spark.read.parquet(
                os.path.join(out, "documents.parquet")
            ).collect()
        }
        assert 2 not in stream_kept, "cross-batch identical media kept"
        assert 1 in stream_kept and 3 in stream_kept

        # chained invariant: streaming survivors == from-scratch batch
        # dedup of the union corpus through the same modality
        union_dir = root / "union"
        union_dir.mkdir()
        spark.read.parquet(str(corpus)).write.mode("overwrite").parquet(
            str(union_dir / "documents.parquet")
        )
        batch_out = str(root / "batch_out")
        bkept, btotal = run_dedup(
            spark, str(union_dir), batch_out, modality=modality
        )
        assert btotal == 4
        batch_kept = {
            r["doc_id"]
            for r in spark.read.parquet(
                os.path.join(batch_out, "documents.parquet")
            ).collect()
        }
        assert stream_kept == batch_kept, (modality, stream_kept, batch_kept)
        assert kept2 == bkept


def test_quality_verb_learned_gate(spark, sf_dir, tmp_path):
    """`quality --gate learned` (round 15): the verb must gate on the
    trained NB tier's verdict — kept docs == text_quality_classifier's
    nb_verdict='keep' set — report the model/rules agreement in the
    audit, and stay corpus-chainable (output is a valid corpus dir)."""
    from filemap_spark.cli import run_quality, run_stats
    from filemap_spark.operators.text import text_quality_classifier

    out = str(tmp_path / "learned_out")
    audit = run_quality(spark, sf_dir, out, gate="learned")
    clf = text_quality_classifier(spark, sf_dir).collect()
    want_keep = {r["doc_id"] for r in clf if r["nb_verdict"] == "keep"}
    got_keep = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(out, "documents.parquet")
        ).collect()
    }
    assert got_keep == want_keep
    assert audit["kept"] == len(want_keep)
    assert audit["scored"] == len(clf)
    assert audit["agree_with_rules"] == sum(r["agree"] for r in clf)
    # chainable: the output dir is itself a corpus every verb accepts
    stats = run_stats(spark, out)
    assert stats["n_docs"] == len(want_keep)


def test_quality_verb_dsir_and_kn_gates(spark, sf_dir, tmp_path):
    """`quality --gate dsir|kn` (round 17, VERDICT r16 task 6): the verb
    must gate on text_dsir_importance's integer keep flag / on
    text_kneser_ney_logprob's corpus-median −ln p respectively, report
    honest audits (including the unscored too-short docs the KN gate
    cannot see), and stay corpus-chainable."""
    from filemap_spark.cli import run_quality, run_stats
    from filemap_spark.operators.text import (
        text_dsir_importance,
        text_kneser_ney_logprob,
    )

    # --gate dsir: kept set == the graded op's dsir_keep = 1 set
    out_d = str(tmp_path / "dsir_out")
    scores_d = str(tmp_path / "dsir_scores")
    audit_d = run_quality(
        spark, sf_dir, out_d, gate="dsir", scores_out=scores_d
    )
    imp = text_dsir_importance(spark, sf_dir).collect()
    want_d = {r["doc_id"] for r in imp if r["dsir_keep"] == 1}
    got_d = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(out_d, "documents.parquet")
        ).collect()
    }
    assert got_d == want_d
    assert audit_d["kept"] == len(want_d)
    assert audit_d["scored"] == len(imp)
    assert audit_d["zero_feature_docs"] == sum(
        1 for r in imp if r["n_feats"] == 0
    )
    sdf = spark.read.parquet(scores_d)
    assert set(sdf.columns) >= {"doc_id", "log_importance", "dsir_keep"}
    assert audit_d["scores_rows"] == sdf.count()

    # --gate kn: kept set == docs at or under the median avg_neg_logp;
    # bigram-less docs are unscored and dropped, but counted
    out_k = str(tmp_path / "kn_out")
    audit_k = run_quality(spark, sf_dir, out_k, gate="kn")
    kn = text_kneser_ney_logprob(spark, sf_dir).collect()
    vals = sorted(r["avg_neg_logp"] for r in kn)
    m = len(vals)
    med = (
        vals[m // 2]
        if m % 2 == 1
        else (vals[m // 2 - 1] + vals[m // 2]) / 2
    )
    want_k = {r["doc_id"] for r in kn if r["avg_neg_logp"] <= med}
    got_k = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(out_k, "documents.parquet")
        ).collect()
    }
    assert got_k == want_k
    assert audit_k["kept"] == len(want_k)
    assert audit_k["scored"] == len(kn)
    n_docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).count()
    assert audit_k["unscored_short_docs"] == n_docs - len(kn)
    assert abs(audit_k["median_neg_logp"] - med) <= 5e-7
    # chainable both ways
    assert run_stats(spark, out_k)["n_docs"] == len(want_k)


def test_quality_scores_out_exports_per_doc_frame(spark, sf_dir, tmp_path):
    """`quality --scores-out` (round 16, VERDICT r15 task 7): the per-doc
    verdict frame lands as a parquet dataset whose rows reconcile with
    the audit AND with the materialized kept corpus — the score export a
    curation operator audits before trusting the gate."""
    from filemap_spark.cli import run_quality

    scores = str(tmp_path / "scores")
    out = str(tmp_path / "gated")
    audit = run_quality(spark, sf_dir, out, gate="learned", scores_out=scores)
    sdf = spark.read.parquet(scores)
    assert set(sdf.columns) >= {
        "doc_id", "n_tokens", "nb_score", "nb_verdict",
        "gopher_verdict", "agree",
    }
    assert audit["scores_rows"] == sdf.count() == audit["scored"]
    assert audit["agree_with_rules"] == sdf.where("agree = 1").count()
    kept = spark.read.parquet(f"{out}/documents.parquet")
    assert (
        kept.count()
        == audit["kept"]
        == sdf.where("nb_verdict = 'keep'").count()
    )


def test_quality_scores_only_mode_skips_corpus(spark, sf_dir, tmp_path, capsys):
    """OUTPUT='-' is scores-only mode: the verdict frame is exported, the
    kept corpus is NOT materialized — through the real argv entry point
    so the flag wiring is covered too."""
    from filemap_spark.cli import main

    scores = str(tmp_path / "scores_only")
    assert main(["quality", sf_dir, "-", "--scores-out", scores]) == 0
    audit = dict(
        line.split("\t")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    sdf = spark.read.parquet(scores)
    # rules-gate export = the per-rule flag frame
    assert set(sdf.columns) >= {"doc_id", "verdict", "r_len", "r_stop"}
    assert int(audit["scores_rows"]) == sdf.count() == int(audit["scored"])
    assert not os.path.exists("-"), "OUTPUT='-' must not create a corpus dir"


def test_dedup_explicit_method_with_modality_prints_note(
    spark, tmp_path, capsys
):
    """ADVICE r15: an explicit --method combined with a path that ignores
    it (--stream here; non-text --modality is the same branch) must say
    so on stderr instead of silently running the other pair generator."""
    from filemap_spark.cli import main

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(corpus)
    out = str(tmp_path / "deduped")
    assert main(["dedup", corpus, out, "--method", "near", "--stream"]) == 0
    err = capsys.readouterr().err
    assert "--method near is ignored with --stream" in err


def test_decontam_verb_drops_planted_contamination(spark, tmp_path):
    """`decontam` drops exactly the train docs sharing a 13-gram with the
    eval corpus, exports the collision report, and the output chains as
    a corpus dir. A planted 13-token copy from an eval doc is the
    contamination; every other train doc is collision-free by
    construction (distinct token vocabularies)."""
    from filemap_spark.cli import run_decontam, run_stats

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    run13 = " ".join(f"e{i}" for i in range(13))  # the eval 13-gram run
    ev_doc = run13 + " tail0 tail1"
    train = [
        # doc 1 embeds the eval run mid-text -> contaminated
        (1, "pre0 pre1 " + run13 + " post0", "en", "web", 0),
        # docs 2/3: 15 tokens each, vocab disjoint from the eval corpus
        (2, " ".join(f"a{i}" for i in range(15)), "en", "web", 0),
        (3, " ".join(f"b{i}" for i in range(15)), "en", "web", 0),
        # doc 4: shorter than 13 tokens -> no n-grams, never contaminated
        (4, "short doc under thirteen tokens", "en", "web", 0),
    ]
    train = [(d, t, la, s, len(t)) for d, t, la, s, _ in train]
    tr_dir, ev_dir = str(tmp_path / "train"), str(tmp_path / "eval")
    spark.createDataFrame(train, schema).write.parquet(
        f"{tr_dir}/documents.parquet"
    )
    spark.createDataFrame(
        [(100, ev_doc, "en", "bench", len(ev_doc))], schema
    ).write.parquet(f"{ev_dir}/documents.parquet")

    out = str(tmp_path / "clean")
    report_out = str(tmp_path / "report")
    audit = run_decontam(
        spark, tr_dir, out, eval_dir=ev_dir, report_out=report_out
    )
    assert audit == {"n_docs": 4, "contaminated": 1, "dropped": 1, "kept": 3}
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/documents.parquet").collect()
    }
    assert kept == {2, 3, 4}
    rep = spark.read.parquet(report_out).collect()
    assert len(rep) == 1 and rep[0]["doc_id"] == 1
    # doc 1 has 16 tokens -> 4 13-grams, 3 of which lie inside pre+run13
    # ... only windows fully inside the planted run collide: exactly 1
    assert rep[0]["n_ngrams"] == 4 and rep[0]["n_hit_ngrams"] == 1
    # chainable: stats runs over the decontaminated output
    assert run_stats(spark, out)["n_docs"] == 3
