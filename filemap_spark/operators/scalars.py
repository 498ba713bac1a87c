"""§2.8 Scalar functions — string / regex / date / math / conditional /
JSON / array (incl. higher-order lambdas) / stable hashing.

filemap delegates all of these to awk/sed/date/md5sum in the per-file shell
pipeline (SURVEY §2.8 [K]); here they are Catalyst expressions inside
whole-stage codegen — no Python boundary anywhere in this module.

Engine-divergence traps (FIXTURES.md trap #5) are encoded in the ORACLE SQL,
never in engine behavior: Spark `weekday` ≡ DuckDB `isodow-1`; Spark
`datediff(end,start)` ≡ DuckDB `datediff('day',start,end)`; Spark Java date
patterns ≡ DuckDB C strftime patterns; Spark `split` is regex vs DuckDB
literal `string_split`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filemap_spark.io import load_table
from filemap_spark.registry import query


@query(
    "fn_string_basic",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up_name,
           lower(c_mktsegment) AS low_seg,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           substring(c_name, 1, 8) AS prefix8,
           length(c_name) AS name_len,
           concat(c_name, '|', c_mktsegment) AS joined,
           lpad(cast(c_nationkey AS varchar), 4, '0') AS nk_pad,
           replace(c_name, 'Customer', 'Cust') AS renamed
    FROM customer
    """,
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string kit (substr is 1-based in both engines)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("low_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment")).alias("joined"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nk_pad"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("renamed"),
    )


@query(
    "fn_string_split_explode",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word ORDER BY n DESC, word
    """,
)
def fn_string_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode token counting. Spark split() is regex / DuckDB
    string_split is literal — p_name is single-space delimited so both agree
    (trap documented, data chosen to pin it)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT c_custkey,
           cast(regexp_extract(c_name, '([0-9]+)$', 1) AS bigint) AS name_num,
           regexp_replace(c_name, '0+', '#', 'g') AS squashed,
           regexp_matches(c_name, '00[1-4]') AS has_low_block
    FROM customer
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract/replace/match — group-index arg compatible across
    engines. DIVERGENCE: Spark regexp_replace is global but DuckDB's
    default is first-match-only — the oracle needs the explicit 'g' flag."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("bigint").alias("name_num"),
        F.regexp_replace("c_name", "0+", "#").alias("squashed"),
        F.col("c_name").rlike("00[1-4]").alias("has_low_block"),
    )


@query(
    "fn_date_parts",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           cast(isodow(o_orderdate) - 1 AS int) AS wd,
           cast(dayofyear(o_orderdate) AS int) AS doy
    FROM orders
    """,
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction. DIVERGENCE: Spark dayofweek(Mon)=2 vs DuckDB
    dayofweek(Mon)=1 — bridged as Spark weekday ≡ DuckDB isodow-1 (0=Monday),
    encoded in the oracle."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.quarter(d).alias("q"),
        F.weekday(d).alias("wd"),
        F.dayofyear(d).alias("doy"),
    )


@query(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           cast(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS int) AS days_to_2002,
           cast(datediff('month', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS int) AS months_to_2002
    FROM orders
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic. DIVERGENCE: Spark datediff(end, start) vs DuckDB
    datediff('day', start, end) — argument order flips; Spark months_between
    (fractional) is floored to match DuckDB month-boundary counting."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    end = F.lit("2002-01-01").cast("timestamp_ntz")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("month_start"),
        (d + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(end.cast("date"), d.cast("date")).alias("days_to_2002"),
        # o_orderdate is midnight-only: month delta = whole-month difference
        ((F.year(end) - F.year(d)) * 12 + (F.month(end) - F.month(d))).alias("months_to_2002"),
    )


@query(
    "fn_date_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS ym,
           strftime(o_orderdate, '%d/%m/%Y') AS dmy,
           strftime(o_orderdate, '%Y-%j') AS yday
    FROM orders
    """,
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formatting. DIVERGENCE: Spark uses Java patterns (yyyy-MM, DDD) vs
    DuckDB C strftime (%Y-%m, %j) — equivalent pattern pairs in the oracle."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.date_format(d, "dd/MM/yyyy").alias("dmy"),
        F.date_format(d, "yyyy-DDD").alias("yday"),
    )


@query(
    "fn_math",
    cost=3.0,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS r1,
           abs(l_extendedprice - 30000) AS dist,
           cast(ceil(l_quantity) AS bigint) AS qc, cast(floor(l_quantity) AS bigint) AS qf,
           round(sqrt(l_extendedprice), 6) AS sq,
           round(ln(l_extendedprice), 6) AS lg,
           round(exp(l_discount), 6) AS ex,
           round(pow(l_quantity, 2), 6) AS p2,
           cast(l_orderkey % 7 AS bigint) AS m7,
           cast(sign(l_extendedprice - 30000) AS double) AS sgn
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kit — per-row IEEE ops are bit-identical across engines; pmod on
    positive operands sidesteps the %-sign divergence."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price, 1).alias("r1"),
        F.abs(price - 30000).alias("dist"),
        F.ceil("l_quantity").alias("qc"),
        F.floor("l_quantity").alias("qf"),
        F.round(F.sqrt(price), 6).alias("sq"),
        F.round(F.log(price), 6).alias("lg"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("p2"),
        F.pmod("l_orderkey", F.lit(7)).cast("bigint").alias("m7"),
        F.signum(price - 30000).alias("sgn"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN s_acctbal < 0 THEN 'debt'
                WHEN s_acctbal < 5000 THEN 'ok'
                ELSE 'rich' END AS tier,
           coalesce(nullif(s_nationkey, 0), -1) AS nk_or_neg,
           greatest(s_acctbal, 1000.0) AS at_least_1k,
           least(cast(s_suppkey AS double), s_acctbal) AS smaller,
           if(s_acctbal > 0, 'pos', 'neg') AS sign_word
    FROM supplier
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif / greatest / least / if."""
    s = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.when(bal < 0, "debt").when(bal < 5000, "ok").otherwise("rich").alias("tier"),
        F.coalesce(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias("nk_or_neg"),
        F.greatest(bal, F.lit(1000.0)).alias("at_least_1k"),
        F.least(F.col("s_suppkey").cast("double"), bal).alias("smaller"),
        F.when(bal > 0, "pos").otherwise("neg").alias("sign_word"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_type,
           cast(sum(cast(json_extract_string(props, '$.k') AS int)) AS bigint) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (events.props = '{"k": <int>}') summed per
    type — filemap would shell out to jq."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).cast("bigint").alias("sum_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "fn_array_basic",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(cast(embedding[1] AS double), 6) AS first_elem,
           round(cast(embedding[64] AS double), 6) AS last_elem,
           round(cast(list_sort(embedding)[1] AS double), 6) AS min_elem,
           list_contains(list_transform(embedding, x -> x > 0), true) AS any_pos
    FROM embeddings
    """,
)
def fn_array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array basics on the embedding column (element_at is 1-based in both).
    float32 elements are cast to double AFTER selection, never before —
    keeping the value identical to what DuckDB reads."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_elem"),
        F.round(F.element_at(emb, 64).cast("double"), 6).alias("last_elem"),
        F.round(F.element_at(F.sort_array(emb), 1).cast("double"), 6).alias("min_elem"),
        F.array_contains(F.expr("transform(embedding, x -> x > 0)"), True).alias("any_pos"),
    )


@query(
    "fn_array_higher_order",
    oracle="""
    SELECT vec_id,
           cast(len(list_filter(embedding, x -> x > 0)) AS int) AS n_pos,
           round(list_aggregate(list_transform(embedding, x -> cast(x AS double)), 'sum'), 6)
             AS vec_sum,
           round(list_aggregate(list_transform(embedding, x -> cast(x AS double) * cast(x AS double)), 'sum'), 6)
             AS vec_sq_sum
    FROM embeddings
    """,
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas (transform/filter/aggregate). Elements cast
    float→double before summing (FIXTURES trap #3); 64-element sums carry no
    meaningful accumulation error at 6dp."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr("size(filter(embedding, x -> x > 0))").alias("n_pos"),
        F.round(
            F.expr("aggregate(embedding, cast(0.0 as double), (acc, x) -> acc + cast(x as double))"),
            6,
        ).alias("vec_sum"),
        F.round(
            F.expr(
                "aggregate(embedding, cast(0.0 as double),"
                " (acc, x) -> acc + cast(x as double) * cast(x as double))"
            ),
            6,
        ).alias("vec_sq_sum"),
    )


@query(
    "fn_hash_stable",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256,
           substring(md5(concat(lang, ':', source)), 1, 8) AS bucket_hash
    FROM documents
    """,
)
def fn_hash_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable content hashing (md5/sha2 hex, lowercase in both engines) —
    the foundation for exact dedup and memoization keys."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.substring(F.md5(F.concat_ws(":", "lang", "source")), 1, 8).alias("bucket_hash"),
    )


@query(
    "fn_struct_map",
    oracle="""
    SELECT o_orderkey,
           struct_pack(prio := o_orderpriority, price := round(cast(o_totalprice AS double), 6)).prio AS prio,
           round(struct_pack(prio := o_orderpriority, price := round(cast(o_totalprice AS double), 6)).price, 6) AS price,
           (map(['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'],
                [1,2,3,4,5])[o_orderpriority])[1] AS prio_rank
    FROM orders ORDER BY o_orderkey
    """,
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type scalar surface: pack a struct, read its fields back, and
    look a key up in a map literal (DuckDB map access yields a 1-element
    list, unwrapped with [1] in the oracle; Spark element_at returns the
    scalar directly). The contract parquet has no struct/map columns
    (SURVEY §1.3), so this op exercises construction + access."""
    orders = load_table(spark, sf_dir, "orders")
    info = F.struct(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice").cast("double"), 6).alias("price"),
    )
    rank_map = F.create_map(
        *[
            x
            for pair in [
                (F.lit(p), F.lit(i + 1))
                for i, p in enumerate(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
                )
            ]
            for x in pair
        ]
    )
    return (
        orders.select(
            "o_orderkey",
            info.getField("prio").alias("prio"),
            F.round(info.getField("price"), 6).alias("price"),
            F.element_at(rank_map, F.col("o_orderpriority")).alias("prio_rank"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_try_arith",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice / nullif(o_custkey % 10, 0), 6) AS safe_div,
           try_cast(o_orderpriority AS INT) AS bad_cast,
           try_cast(substr(o_orderpriority, 1, 1) AS INT) AS good_cast
    FROM orders ORDER BY o_orderkey
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface: try_divide (NULL on /0, matching the
    oracle's nullif form) and try_cast (NULL on malformed input instead of
    an ANSI error) — the fault-tolerant posture a pipeline over dirty
    100 TB data needs, with failures surfacing as NULLs that flow through
    aggregation instead of killing the job."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.round(F.try_divide("o_totalprice", F.col("o_custkey") % 10), 6).alias(
                "safe_div"
            ),
            F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
            F.substring("o_orderpriority", 1, 1).try_cast("int").alias("good_cast"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_base64",
    oracle="""
    SELECT doc_id,
           base64(cast(substr(text, 1, 24) AS BLOB)) AS b64,
           cast(from_base64(base64(cast(substr(text, 1, 24) AS BLOB))) AS VARCHAR) AS roundtrip
    FROM documents ORDER BY doc_id
    """,
)
def fn_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64 encode/decode round-trip over a text prefix — the binary
    transport encoding for opaque payloads (multimodal columns travel
    through JSON/CSV sinks this way)."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, 24)
    b64 = F.base64(prefix.cast("binary"))
    return (
        docs.select(
            "doc_id",
            b64.alias("b64"),
            F.unbase64(b64).cast("string").alias("roundtrip"),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
             || cast(doc_id AS varchar) || '?lang=' || lang || '&v=2' AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, 'https://([^/]+)', 1) AS host,
           regexp_extract(url, 'https://[^/]+([^?]+)', 1) AS path,
           regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param
    FROM u ORDER BY doc_id
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structural parsing — host / path / query-parameter extraction,
    the first step of web-corpus domain analysis (sample_domain_mix's
    upstream in a real CommonCrawl-style pipeline). URLs are manufactured
    deterministically from (source, doc_id, lang) since the contract
    corpus has no URL column. Spark side uses the native `parse_url`
    (java.net.URI-backed, JVM codegen); the oracle spells the same
    extraction as anchored regexes — both total on this URL shape.

    Scale: per-row JVM expressions, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v=2"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@query(
    "fn_try_datetime_parse",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 4
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
               WHEN 1 THEN 'garbage-' || cast(o_orderkey AS varchar)
               WHEN 2 THEN strftime(o_orderdate, '%d/%m/%Y')
               ELSE '2024-13-0' || cast(1 + o_orderkey % 9 AS varchar)
                    || ' 00:00:00'
             END AS s
      FROM orders
    )
    SELECT o_orderkey, s,
           try_strptime(s, '%Y-%m-%d %H:%M:%S') AS ts_iso,
           try_strptime(s, '%d/%m/%Y') AS ts_dmy,
           coalesce(try_strptime(s, '%Y-%m-%d %H:%M:%S'),
                    try_strptime(s, '%d/%m/%Y')) AS ts_any,
           (try_strptime(s, '%Y-%m-%d %H:%M:%S') IS NULL
            AND try_strptime(s, '%d/%m/%Y') IS NULL) AS unparseable
    FROM raw ORDER BY o_orderkey
    """,
    cost=0.5,
)
def fn_try_datetime_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-timestamp ingestion (round 5): real log/CSV corpora mix
    timestamp formats and garbage, and a 100 TB ingest must turn every
    malformed value into a NULL that flows onward — never an ANSI abort on
    row 3 billion. Four manufactured shapes per orders row: ISO datetime,
    pure garbage, day-first dates, and calendar-invalid month-13 strings
    that LOOK ISO but must still parse to NULL (both engines reject
    out-of-range fields: Spark's java.time strict resolver, DuckDB's
    strptime validation — probed identical this round). The coalesce
    cascade is the standard multi-format fallback chain; `unparseable` is
    the per-row dead-letter flag a pipeline routes to quarantine.

    Scale: per-row JVM expressions in whole-stage codegen, zero shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    s = (
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        )
        .when(
            F.col("o_orderkey") % 4 == 1,
            F.concat(F.lit("garbage-"), F.col("o_orderkey").cast("string")),
        )
        .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .otherwise(
            F.concat(
                F.lit("2024-13-0"),
                (F.col("o_orderkey") % 9 + 1).cast("string"),
                F.lit(" 00:00:00"),
            )
        )
    )
    raw = orders.select("o_orderkey", s.alias("s"))
    iso = F.try_to_timestamp("s", F.lit("yyyy-MM-dd HH:mm:ss"))
    dmy = F.try_to_timestamp("s", F.lit("dd/MM/yyyy"))
    return raw.select(
        "o_orderkey",
        "s",
        iso.alias("ts_iso"),
        dmy.alias("ts_dmy"),
        F.coalesce(iso, dmy).alias("ts_any"),
        (iso.isNull() & dmy.isNull()).alias("unparseable"),
    ).orderBy("o_orderkey")
