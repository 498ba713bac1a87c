"""§2.1 Scans / sources / sinks.

filemap's dataset = a directory of (optionally compressed) text files
(SURVEY §1.1 [K]); the Spark-native equivalents are parquet/CSV/JSON/text
datasets with schema-on-read. Round-trip ops prove the sink side is lossless
by letting the oracle grade the re-read against the original table.

Scale: writes are executor-parallel (one file per partition); partitioned
writes (`partitionBy`) give partition pruning on read — the 100 TB layout
strategy. Count/projection scans demonstrate column pruning + pushdown
(verified via .explain: ReadSchema carries only projected columns).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemap_spark.io import load_table
from filemap_spark.registry import query


def _tmpdir(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"filemap_{tag}_")


@query("scan_parquet_count", oracle="SELECT count(*) AS n_rows FROM lineitem")
def scan_parquet_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan count — filemap `wc -l` over a dataset. Parquet answers this
    from row-group metadata; no data pages are read."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@query("scan_projection", oracle="SELECT p_partkey, p_size FROM part")
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning — filemap `cut -f`: only 2 of 6 columns leave the scan."""
    return load_table(spark, sf_dir, "part").select("p_partkey", "p_size")


@query("scan_text_lines", oracle="SELECT doc_id, text FROM documents")
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filemap's native record model: one text line per record, keyed."""
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


@query("sink_parquet_roundtrip", oracle="SELECT * FROM nation")
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a dataset directory, re-read it — graded against the original
    (parquet round-trip is lossless)."""
    out = os.path.join(_tmpdir("pq"), "nation")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@query(
    "sink_partitioned_write",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents WHERE lang = 'en'",
)
def sink_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned sink — filemap's one-output-dir-per-key. Reading
    back one partition exercises partition pruning (no other dirs touched)."""
    out = os.path.join(_tmpdir("part"), "documents")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    # explicit read schema: inference needs >=1 data file, and a 0-row
    # corpus writes none — the declared contract covers it either way
    return (
        spark.read.schema(docs.schema)
        .parquet(out)
        .where(F.col("lang") == "en")
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


@query("scan_csv_roundtrip", oracle="SELECT * FROM nation")
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text datasets are filemap's native format; CSV header round-trip with
    explicit schema-on-read preserves types exactly."""
    out = os.path.join(_tmpdir("csv"), "nation")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(out)
    return spark.read.schema(nation.schema).option("header", "true").csv(out)


@query("scan_json_roundtrip", oracle="SELECT * FROM nation")
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL round-trip; explicit schema avoids int32→int64 inference drift."""
    out = os.path.join(_tmpdir("json"), "nation")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").json(out)
    return spark.read.schema(nation.schema).json(out)


@query("scan_orc_roundtrip", oracle="SELECT * FROM nation")
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — the other columnar format Spark ships natively;
    lossless like parquet (typed footer schema, no inference)."""
    out = os.path.join(_tmpdir("orc"), "nation")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@query("scan_text_gzip", oracle="SELECT count(*) AS n_lines FROM documents")
def scan_text_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filemap handles compressed text transparently (`zcat | wc -l`); Spark
    text sink with gzip codec + line-count on re-read."""
    out = os.path.join(_tmpdir("gz"), "docs")
    docs = load_table(spark, sf_dir, "documents")
    docs.select("text").write.mode("overwrite").option("compression", "gzip").text(out)
    return spark.read.text(out).agg(F.count("*").alias("n_lines"))


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT n_nationkey, n_name,
           CAST(NULL AS VARCHAR) AS n_comment_v2
    FROM nation
    UNION ALL
    SELECT n_nationkey, n_name, 'v2:' || n_name AS n_comment_v2
    FROM nation
    ORDER BY n_nationkey, n_comment_v2 NULLS FIRST
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution: two parquet generations of one dataset directory —
    v1 without, v2 with a new column — read as one table via mergeSchema;
    v1 rows surface NULL for the added column. This is how a 100 TB
    append-only dataset gains columns without rewriting history."""
    out = _tmpdir("evolve")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation.write.mode("overwrite").parquet(os.path.join(out, "gen=1"))
    nation.withColumn(
        "n_comment_v2", F.concat(F.lit("v2:"), F.col("n_name"))
    ).write.mode("overwrite").parquet(os.path.join(out, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=1"), os.path.join(out, "gen=2")
    )
    return merged.select("n_nationkey", "n_name", "n_comment_v2").orderBy(
        "n_nationkey", F.col("n_comment_v2").asc_nulls_first()
    )


COMPACT_TARGET_FILES = 4  # compaction target (deployment knob; 4 for the rig)


def compact_parquet_dataset(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    sort_col: str,
    target_files: int,
    max_records_per_file: int = 2_000_000,
) -> None:
    """Rewrite a fragmented parquet dataset as `target_files` range-
    clustered files: one range exchange on `sort_col` (sampling pass +
    shuffle, executor-parallel) + a maxRecordsPerFile cap against skewed
    range slices. Range clustering also buys parquet min/max row-group
    pruning on `sort_col` for every later scan."""
    (
        spark.read.parquet(src_dir)
        .repartitionByRange(target_files, sort_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(dst_dir)
    )


@query(
    "sink_compact_small_files",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
             AS sum_price_cents,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    cost=1.2,
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — THE recurring 100 TB operational op: a
    streaming or per-task ingest leaves a dataset as thousands of tiny
    parquet files (here: orders deliberately fragmented into 64), and every
    later scan pays per-file open/footer/scheduling overhead. Compaction
    rewrites the dataset as `repartitionByRange(target, sort_key)` +
    `maxRecordsPerFile`: a few target-sized files, range-clustered on the
    sort key so re-reads also get parquet min/max row-group pruning on that
    key. Graded by aggregating the compacted RE-READ against the plain
    oracle — a dropped or duplicated row during the rewrite mismatches;
    min/max keys per group pin value fidelity, not just counts.

    Scale: the rewrite is one range exchange (sampling pass + shuffle) —
    executor-parallel, never driver-bound; `target` is sized as
    dataset_bytes / desired_file_bytes (e.g. ~1 GB files);
    maxRecordsPerFile is the safety cap against a skewed range slice.
    tests/test_compaction.py pins the output file count and row fidelity."""
    frag_dir = os.path.join(_tmpdir("fragments"), "orders")
    compact_dir = os.path.join(_tmpdir("compact"), "orders")
    orders = load_table(spark, sf_dir, "orders")
    # simulate the many-small-files ingest state
    orders.repartition(64).write.mode("overwrite").parquet(frag_dir)
    compact_parquet_dataset(
        spark, frag_dir, compact_dir, "o_orderkey", COMPACT_TARGET_FILES
    )
    back = spark.read.parquet(compact_dir)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            # integer CENTS, not a rounded double sum: at sf0.1 the group
            # sums reach ~7.5e9, where a double's ulp (~1.9e-6) exceeds 6dp
            # resolution and the engines' decimal->double casts land on
            # ADJACENT doubles (observed .050000 vs .049999). Price has 2
            # decimals, so scaled-int64 cents are exact at any magnitude.
            F.expr("sum(cast(round(o_totalprice * 100) AS bigint))").alias(
                "sum_price_cents"
            ),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "sink_bucketed_table",
    oracle="""
    SELECT l_orderkey, count(*) AS n_items,
           cast(sum(l_quantity) AS bigint) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING count(*) >= 4 ORDER BY l_orderkey
    """,
    cost=1.5,
)
def sink_bucketed_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table sink + bucket-aware re-read — THE repeated-join/agg
    layout at 100 TB: `bucketBy(8, l_orderkey).sortBy` pays the shuffle
    ONCE at write time; every later join or aggregation on the bucket key
    reads pre-clustered buckets with no exchange
    (tests/test_bucketing.py pins the no-Exchange join plan for two
    bucketed facts). Graded by aggregating the re-read table on the bucket
    key against the plain-table oracle, so bucket routing must place
    every row exactly (a mis-bucketed or dropped row mismatches).

    Scale: bucket count is the deployment knob (buckets ≈ cluster write
    parallelism; 8 here for the test rig); bucket pruning additionally
    skips buckets on point predicates."""
    import shutil

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # A FRESH session (new metastore) can find the old managed-table dir on
    # disk without a catalog entry, and saveAsTable refuses the location —
    # drop both the entry and any stale directory first.
    spark.sql("DROP TABLE IF EXISTS filemap_li_bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh_path = wh.removeprefix("file:")
    shutil.rmtree(os.path.join(wh_path, "filemap_li_bucketed"), ignore_errors=True)
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("filemap_li_bucketed")
    )
    back = spark.table("filemap_li_bucketed")
    return (
        back.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        )
        .where(F.col("n_items") >= 4)
        .orderBy("l_orderkey")
    )


@query(
    "scan_csv_permissive_corrupt",
    oracle="""
    SELECT count(*) AS n_rows,
           cast(sum(CASE WHEN n_nationkey % 5 <= 1 THEN 1 ELSE 0 END) AS bigint)
             AS n_corrupt,
           cast(sum(CASE WHEN n_nationkey % 5 > 1 THEN 1 ELSE 0 END) AS bigint)
             AS n_clean,
           cast(sum(CASE WHEN n_nationkey % 5 = 0 THEN 0 ELSE n_nationkey END)
             AS bigint) AS sum_parsed_ids,
           cast(sum(CASE WHEN n_nationkey % 5 > 1 THEN 15 * n_nationkey ELSE 0 END)
             AS bigint) AS sum_val_x10
    FROM nation
    """,
    cost=0.4,
)
def scan_csv_permissive_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-CSV ingestion under PERMISSIVE mode (round 5) — the dead-letter
    pattern for 100 TB text ingest: malformed rows must become data (a
    populated corrupt-record column) instead of killing the job (FAILFAST)
    or silently vanishing (DROPMALFORMED). Three manufactured row shapes
    from nation: structureless garbage (no delimiters — every field NULL,
    corrupt set), type-corrupt (id+name parse, val does not — PARTIAL
    fields survive, corrupt still set), and clean. The graded summary
    counts both populations and sums only what parsed — the audit a real
    ingest reports per batch.

    Scale: the CSV scan is split-parallel like any text source; the
    corrupt column costs nothing on clean rows."""
    docs_dir = os.path.join(_tmpdir("dirty_csv"), "nation")
    nation = load_table(spark, sf_dir, "nation")
    line = (
        F.when(
            F.col("n_nationkey") % 5 == 0,
            F.concat(F.lit("X"), F.col("n_name")),  # no delimiters at all
        )
        .when(
            F.col("n_nationkey") % 5 == 1,
            F.concat_ws(",", F.col("n_nationkey").cast("string"), F.col("n_name"), F.lit("bad")),
        )
        .otherwise(
            F.concat_ws(
                ",",
                F.col("n_nationkey").cast("string"),
                F.col("n_name"),
                (F.col("n_nationkey") * 1.5).cast("string"),
            )
        )
    )
    nation.select(line.alias("value")).write.mode("overwrite").text(docs_dir)
    parsed = (
        spark.read.schema("id int, name string, val double, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(docs_dir)
    )
    return parsed.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clean"),
        F.sum(F.coalesce(F.col("id"), F.lit(0))).cast("bigint").alias("sum_parsed_ids"),
        F.sum(F.coalesce(F.round(F.col("val") * 10), F.lit(0)))
        .cast("bigint")
        .alias("sum_val_x10"),
    )


@query(
    "sink_partition_overwrite_dynamic",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN lang = 'en' THEN n_chars + 1000000 ELSE n_chars END
             AS n_chars
    FROM documents ORDER BY doc_id
    """,
    cost=1.0,
)
def sink_partition_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (round 5) — the idempotent batch-rewrite
    pattern a 100 TB pipeline uses to REPROCESS one slice without touching
    the rest: with `partitionOverwriteMode=dynamic`, an INSERT OVERWRITE
    replaces ONLY the partitions present in the incoming batch (here: the
    reprocessed `lang=en` slice, its n_chars shifted by 1e6 as a visible
    marker) while every other partition's files stay as written. Static
    mode — the default — would DELETE the whole table first; the graded
    re-read proves the other langs survived byte-for-byte and `en` carries
    exactly the reprocessed values.

    Scale: overwrite cost is proportional to the reprocessed slice, not
    the table; this is how backfills, late-data corrections, and
    quality-gate re-runs stay O(partition) on an append-heavy corpus."""
    base = os.path.join(_tmpdir("dynover"), "documents")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    docs.write.mode("overwrite").partitionBy("lang").parquet(base)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        reprocessed = docs.where(F.col("lang") == "en").withColumn(
            "n_chars", F.col("n_chars") + F.lit(1_000_000)
        )
        # same partitioned layout, dynamic mode: only lang=en is replaced
        reprocessed.write.mode("overwrite").partitionBy("lang").parquet(base)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.read.schema(docs.schema)  # explicit: no files on a 0-row corpus
        .parquet(base)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


def zorder_key(cols: list[tuple[str, int]], bits: int = 10) -> "F.Column":
    """Morton (Z-order) interleave key over `cols` = [(name, value_bits)]:
    each column's TOP `bits` bits (value_bits aligns differing ranges —
    interleaving raw unequal widths degenerates to a single-column sort,
    because every high split bit belongs to the widest column) alternate
    into one integer whose range-sort clusters ALL dimensions at once.
    Pure integer shifts/masks — engine-portable and codegen-friendly."""
    terms = []
    for j, (name, value_bits) in enumerate(cols):
        drop = max(value_bits - bits, 0)
        for i in range(bits):
            terms.append(
                f"shiftleft(shiftright({name}, {i + drop}) & 1, "
                f"{len(cols) * i + j})"
            )
    return F.expr(" + ".join(terms))


@query(
    "sink_zorder_cluster",
    oracle="""
    SELECT l_suppkey, count(*) AS n_items,
           cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty,
           min(l_partkey) AS min_part, max(l_partkey) AS max_part
    FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
    """,
    cost=1.3,
)
def sink_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order multi-column clustering sink (round 5) — the OPTIMIZE
    ZORDER idea on plain parquet: a single-column sort gives perfect
    min/max pruning on ONE column and none on any other; range-sorting on
    a Morton-interleaved key bounds EVERY interleaved dimension's span per
    file. Measured on this corpus (16 files, lineitem): z-order file span
    fractions ≈ 0.53 (partkey) / 0.29 (suppkey) vs 0.06 / 1.00 for a
    partkey-only sort — a suppkey predicate now skips ~70% of files
    instead of reading all of them, at the cost of partkey pruning going
    from near-perfect to half. That trade IS the operator: take it when
    queries filter on several columns.

    Alignment matters: the interleave uses each column's TOP 10 bits
    (zorder_key) — interleaving raw unequal bit-widths degenerates to a
    single-column sort because every high split bit belongs to the widest
    column (measured: suppkey fraction 1.0 without alignment).

    Graded by re-reading the clustered rewrite and aggregating per
    suppkey — a lost/duplicated/mis-clustered row mismatches; the pruning
    spans themselves are pinned in tests/test_compaction.py.

    Scale: one range exchange on the int key, like any sorted rewrite;
    the key is pure integer codegen. At 100 TB, cluster periodically per
    partition (compose with sink_compact_small_files)."""
    out = os.path.join(_tmpdir("zorder"), "lineitem")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zkey = zorder_key([("l_partkey", 15), ("l_suppkey", 10)])
    (
        li.withColumn("__zkey", zkey)
        .repartitionByRange(16, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
        )
        .orderBy("l_suppkey")
    )


@query(
    "scan_binary_files",
    oracle="""
    SELECT 'doc_' || lpad(cast(doc_id AS varchar), 6, '0') || '.bin' AS file_name,
           cast(strlen(text) AS bigint) AS length,
           md5(text) AS content_md5
    FROM documents WHERE doc_id % 20 = 0
    ORDER BY file_name
    """,
    cost=0.8,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` source (round 5) — THE ingestion route for real
    multimodal corpora: a directory of opaque files (images, audio,
    PDFs) becomes (path, modificationTime, length, content) rows, which
    is exactly the binary-column shape the mm_* decode family consumes
    downstream. Files are materialized from document text (one .bin per
    20th doc — the container ships no real media), re-read through the
    binaryFile reader, and graded on name + length + content md5 so a
    truncated or reordered byte stream mismatches.

    Scale: one file = one row = one task input; for millions of SMALL
    files compose with sink_compact_small_files' lesson — pack decoded
    payloads into parquet binary columns early (mm_binary_metadata's
    layout) and never re-scan loose files. Fixture construction is
    itself distributed (round 7): each task writes its own partition's
    files via foreachPartition — the driver holds no document rows, so
    the construction side scales with the corpus exactly like the read
    side (on a cluster the target dir is the shared store)."""
    out = _tmpdir("binfiles")

    def _write_partition(rows) -> None:
        for r in rows:
            name = f"doc_{r['doc_id']:06d}.bin"
            with open(os.path.join(out, name), "wb") as f:
                f.write(r["text"].encode("utf-8"))

    (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 20 == 0)
        .select("doc_id", "text")
        .foreachPartition(_write_partition)
    )
    bf = spark.read.format("binaryFile").load(out)
    return (
        bf.select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.col("length").cast("bigint").alias("length"),
            F.md5(F.col("content")).alias("content_md5"),
        )
        .orderBy("file_name")
    )


@query(
    "scan_jsonl_schema_inference",
    oracle="""
    WITH c AS (
      SELECT count(*) AS n,
             cast(sum(CASE WHEN n_nationkey % 5 = 0 THEN 1 ELSE 0 END) AS bigint)
               AS corrupt,
             cast(sum(CASE WHEN n_nationkey % 5 = 1 THEN 1 ELSE 0 END) AS bigint)
               AS extra
      FROM nation
    )
    SELECT col_name, col_type, n_nonnull FROM (
      SELECT '_corrupt_record' AS col_name, 'string' AS col_type,
             corrupt AS n_nonnull FROM c
      UNION ALL SELECT 'extra', 'boolean', extra FROM c
      UNION ALL SELECT 'id', 'bigint', n - corrupt FROM c
      UNION ALL SELECT 'name', 'string', n - corrupt FROM c
      UNION ALL SELECT 'val', 'double', n - corrupt FROM c
    ) ORDER BY col_name
    """,
    cost=0.4,
)
def scan_jsonl_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-INFERRED JSONL ingestion with the permissive dead-letter
    pattern (round 6, VERDICT r5 task 7) — the dirty sibling of
    scan_json_roundtrip: no schema is supplied, so the reader must (a)
    union ragged shapes (an `extra` field present on 20% of rows widens
    the inferred schema instead of erroring), (b) fold truncated JSON
    lines into the auto-added `_corrupt_record` column rather than
    failing the job, and (c) type integers as bigint / floats as double
    (inference never narrows). Three manufactured line shapes from
    nation: truncated JSON (corrupt), clean+extra-field, and clean.

    The graded result is the inferred-schema AUDIT — one row per inferred
    column with its Spark type and distributed non-null count — which is
    what an ingest pipeline records per batch to catch schema drift.

    Scale: inference samples the files (spark.sql.json.* sampling confs
    bound the cost); the audit itself is one pass of count(col) aggs. At
    100 TB you infer once on a sample, then pin the schema — this op IS
    that bootstrap step. The schema rows come from driver metadata
    (O(columns), not data-sized)."""
    out = os.path.join(_tmpdir("jsonl_infer"), "nation")
    nation = load_table(spark, sf_dir, "nation")
    line = (
        F.when(
            F.col("n_nationkey") % 5 == 0,
            # truncated mid-token: unparseable, lands in _corrupt_record
            F.concat(
                F.lit('{"id": '),
                F.col("n_nationkey").cast("string"),
                F.lit(', "name": "'),
                F.col("n_name"),
            ),
        )
        .when(
            F.col("n_nationkey") % 5 == 1,
            F.concat(
                F.lit('{"id": '),
                F.col("n_nationkey").cast("string"),
                F.lit(', "name": "'),
                F.col("n_name"),
                F.lit('", "val": '),
                (F.col("n_nationkey") * 1.5).cast("string"),
                F.lit(', "extra": true}'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('{"id": '),
                F.col("n_nationkey").cast("string"),
                F.lit(', "name": "'),
                F.col("n_name"),
                F.lit('", "val": '),
                (F.col("n_nationkey") * 1.5).cast("string"),
                F.lit("}"),
            )
        )
    )
    nation.select(line.alias("value")).write.mode("overwrite").text(out)
    parsed = spark.read.option("mode", "PERMISSIVE").json(out)
    fields = parsed.schema.fields
    if not fields:  # 0-line corpus: inference honestly yields no columns
        return spark.createDataFrame(
            [], "col_name string, col_type string, n_nonnull bigint"
        )
    # ONE agg referencing every column (a _corrupt_record-only projection is
    # disallowed on raw JSON scans), then stack the single row out to one
    # audit row per column.
    counts = parsed.agg(
        *[F.count(F.col(f"`{f.name}`")).alias(f"c{i}") for i, f in enumerate(fields)]
    )
    triples = ", ".join(
        f"'{f.name}', '{f.dataType.simpleString()}', c{i}"
        for i, f in enumerate(fields)
    )
    return counts.select(
        F.expr(
            f"stack({len(fields)}, {triples}) AS (col_name, col_type, n_nonnull)"
        )
    ).orderBy("col_name")


@query(
    "scan_partition_pruning",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           cast(sum(n_chars) AS bigint) AS sum_chars
    FROM documents
    WHERE lang IN ('en', 'de')
    GROUP BY lang, source ORDER BY lang, source
    """,
    cost=0.5,
)
def scan_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partition pruning, proven end-to-end (round 6): write
    documents partitioned by lang, read back with a partition-key filter,
    and aggregate. The filter never touches row data — Catalyst prunes
    whole directories at planning time (the physical scan's partitionFilters
    carries `lang IN (en,de)` and its `number of files read` drops to the
    two matching directories; pinned by scripts/plan_audit.py's
    PushedFilters audit and tests/test_plan_shape.py).

    Scale: THE 100 TB layout lever — a date/lang/source-partitioned corpus
    turns a full-corpus scan into a per-slice scan with zero data-dependent
    work. The write side demonstrates the layout (one directory per lang,
    executor-parallel); the read side demonstrates the prune."""
    out = os.path.join(_tmpdir("prune"), "documents")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.schema(docs.schema).parquet(out)  # 0-row corpus: no files
    return (
        back.where(F.col("lang").isin("en", "de"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang", "source")
    )


@query(
    "sink_manifest_checksum",
    oracle="""
    SELECT lang, 1 AS n_files, count(*) AS n_rows,
           bit_xor(cast(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                                        1, 15)) AS BIGINT)) AS content_xor,
           min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
    FROM documents GROUP BY lang ORDER BY lang
    """,
    cost=0.6,
)
def sink_manifest_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit manifest (round 6, staged r7): partition the corpus by
    lang, write it, then RE-READ the written files and emit one manifest
    row per partition — file count, row count, an order-free content
    checksum (bit_xor of per-row md5), and the key envelope. This is the
    data-integrity ledger a 100 TB pipeline keeps per written partition:
    a later re-verification (or a consumer) recomputes the same row from
    the files and any dropped/duplicated/mutated row flips the xor. Graded
    against the SOURCE table's expected manifest, so the sink round-trip
    itself is what's checked; n_files pins the layout invariant — the
    pre-shuffle on the partition column yields exactly ONE file per
    partition directory (the small-files discipline at write time).

    Determinism: bit_xor is commutative/associative (order-free by
    construction — no quantization needed), md5 is engine-identical on the
    identical `id:text` string, and the 15-hex-char prefix keeps the
    parsed int64 positive in both engines.

    Scale: one hash exchange on the partition key + a map-side manifest
    agg on re-read (count/xor/min/max are all partial-agg friendly). At
    100 TB, repartition(N, col) with N sized per partition volume replaces
    the single-file-per-partition layout; n_files then pins N."""
    out_dir = os.path.join(_tmpdir("manifest"), "documents")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    (
        docs.repartition("lang")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out_dir)
    )
    back = spark.read.schema(docs.schema).parquet(out_dir)  # 0-row: no files
    row_hash = F.expr(
        "cast(conv(substr(md5(concat(cast(doc_id as string), ':', text)), 1, 15),"
        " 16, 10) as bigint)"
    )
    return (
        back.select(
            "lang",
            F.input_file_name().alias("fname"),
            "doc_id",
            row_hash.alias("h"),
        )
        .groupBy("lang")
        .agg(
            F.countDistinct("fname").cast("int").alias("n_files"),
            F.count("*").alias("n_rows"),
            F.bit_xor("h").alias("content_xor"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


@query(
    "join_dpp_partitioned_fact",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           cast(cast(sum(cast(round(o_totalprice * 1000000) AS bigint))
                     AS decimal(38,6)) / 1000000 AS double) AS total_price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
    cost=0.6,
)
def join_dpp_partitioned_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning, end-to-end (round 6, staged r7): the
    orders fact is written partitioned by priority (the Hive layout a
    100 TB fact table lives in), then joined against a FILTERED tiny dim
    on the partition column — Spark plants a DynamicPruning subquery in
    the fact scan, so only the dim-surviving partition DIRECTORIES are
    read, at runtime, without the filter appearing on the fact side of
    the query. The graded result proves the pruned scan still returns
    exactly the rows the plain predicate form does (the oracle).

    Scale: THE mechanism for dim-filtered fact scans on partitioned data
    — the scan cost is proportional to surviving partitions, not the
    table; scan_partition_pruning covers the static-literal case, this
    covers the join-driven case AQE cannot constant-fold.

    Determinism: integer counts + exact µ-unit sums."""
    out = os.path.join(_tmpdir("dpp"), "orders_part")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    fact = spark.read.schema(orders.schema).parquet(out)  # 0-row: no files
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .withColumn("urgent", F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .where(F.col("urgent"))
        .select(F.col("o_orderpriority").alias("dim_priority"))
    )
    return (
        fact.join(
            F.broadcast(dim),
            fact.o_orderpriority == F.col("dim_priority"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(
                "cast(cast(sum(cast(round(o_totalprice * 1000000) as bigint))"
                " as decimal(38,6)) / 1000000 as double)"
            ).alias("total_price"),
        )
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_lines,
           cast(cast(sum(cast(round(l_extendedprice * 1000000) AS bigint))
                     AS decimal(38,6)) / 1000000 AS double) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    cost=1.2,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join, GRADED end-to-end (round 6,
    staged r7): both facts are written `bucketBy(8, order key)` +
    `sortBy` into managed tables, then joined as a sort-merge join whose
    required distribution the bucket layout already satisfies — NO
    exchange before the join (the plan-shape twin in
    tests/test_bucketing.py pins that; this op grades the RESULT of the
    layout against the plain-join oracle). The `merge` hint stands in for
    a production broadcast-threshold config so the demonstration is
    conf-free.

    Scale: THE layout for a fact-fact join that repeats every
    run (lineitem⋈orders on the order key here): the shuffle is paid once
    at write time and amortized over every subsequent join; bucket count
    is the deployment knob (≥ cluster parallelism, matched on both
    sides). Write cost at grading scale is a few MB of managed table.

    Determinism: integer counts + exact µ-unit sums through the decimal
    descale."""
    import shutil

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for name in ("fsb_li", "fsb_orders"):
        # DROP only clears THIS session's in-memory catalog; a previous
        # session's table directory survives on disk and blocks the
        # managed-table write (LOCATION_ALREADY_EXISTS) — remove both.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("fsb_li")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("fsb_orders")
    )
    return (
        spark.table("fsb_li")
        .hint("merge")
        .join(
            spark.table("fsb_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.expr(
                "cast(cast(sum(cast(round(l_extendedprice * 1000000) as bigint))"
                " as decimal(38,6)) / 1000000 as double)"
            ).alias("revenue"),
        )
    )
