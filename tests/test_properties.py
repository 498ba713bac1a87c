"""Property-based differential testing (SURVEY §5.2): hypothesis generates
random filter/group/agg combinations over lineitem; the SAME SQL text runs on
Spark (via registered views) and DuckDB, and canonical results must match.

The generated SQL is restricted to the dialect intersection (plain
comparisons, IN lists, count / exact scaled sums), which is exactly the
surface the engine's determinism rules guarantee."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from filemap_spark.functions.numeric import davg, dsum
from filemap_spark.io import register_views
from filemap_spark.testing import canonical_rows, duck_connect

GROUP_KEYS = st.lists(
    st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]),
    min_size=1,
    max_size=2,
    unique=True,
)
AGGS = st.sampled_from(
    [
        "count(*) AS n",
        dsum("l_extendedprice", "s"),
        davg("l_quantity", "a"),
        "cast(min(l_orderkey) AS bigint) AS mn",
        "cast(max(l_linenumber) AS int) AS mx",
    ]
)


@st.composite
def random_query(draw) -> str:
    keys = draw(GROUP_KEYS)
    agg = draw(AGGS)
    qty_lo = draw(st.integers(min_value=1, max_value=25))
    qty_hi = qty_lo + draw(st.integers(min_value=0, max_value=25))
    flags = draw(
        st.lists(st.sampled_from(["A", "N", "R"]), min_size=1, max_size=3, unique=True)
    )
    flag_list = ", ".join(f"'{f}'" for f in flags)
    year = draw(st.integers(min_value=1995, max_value=2001))
    keylist = ", ".join(keys)
    return (
        f"SELECT {keylist}, {agg} FROM lineitem "
        f"WHERE l_quantity BETWEEN {qty_lo} AND {qty_hi} "
        f"AND l_returnflag IN ({flag_list}) "
        f"AND l_shipdate < TIMESTAMP '{year}-07-01 00:00:00' "
        f"GROUP BY {keylist} ORDER BY {keylist}"
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=random_query())
def test_random_agg_matches_duckdb(spark, sf_dir, sql):
    register_views(spark, sf_dir)
    got = spark.sql(sql).toPandas()
    con = duck_connect(sf_dir)
    try:
        expect = con.execute(sql).df()
    finally:
        con.close()
    assert canonical_rows(got) == canonical_rows(expect), sql


@st.composite
def random_join_query(draw) -> str:
    agg = draw(
        st.sampled_from(
            ["count(*) AS n", dsum("o_totalprice", "s"), davg("c_acctbal", "a")]
        )
    )
    bal_lo = draw(st.integers(min_value=-999, max_value=5000))
    bal_hi = bal_lo + draw(st.integers(min_value=100, max_value=9000))
    prios = draw(
        st.lists(
            st.sampled_from(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
            ),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    prio_list = ", ".join(f"'{p}'" for p in prios)
    return (
        f"SELECT c_mktsegment, {agg} "
        f"FROM orders JOIN customer ON o_custkey = c_custkey "
        f"WHERE c_acctbal BETWEEN {bal_lo} AND {bal_hi} "
        f"AND o_orderpriority IN ({prio_list}) "
        f"GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=random_join_query())
def test_random_join_agg_matches_duckdb(spark, sf_dir, sql):
    register_views(spark, sf_dir)
    got = spark.sql(sql).toPandas()
    con = duck_connect(sf_dir)
    try:
        expect = con.execute(sql).df()
    finally:
        con.close()
    assert canonical_rows(got) == canonical_rows(expect), sql


@st.composite
def random_window_query(draw) -> str:
    fn = draw(st.sampled_from(["row_number()", "rank()", "dense_rank()"]))
    k = draw(st.integers(min_value=1, max_value=5))
    price = draw(st.integers(min_value=0, max_value=300000))
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    return (
        f"SELECT o_custkey, o_orderkey, rn FROM ("
        f"  SELECT o_custkey, o_orderkey, {fn} OVER ("
        f"    PARTITION BY o_custkey ORDER BY o_totalprice {direction}, o_orderkey"
        f"  ) AS rn FROM orders WHERE o_totalprice > {price}"
        f") t WHERE rn <= {k} ORDER BY o_custkey, rn, o_orderkey"
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=random_window_query())
def test_random_window_matches_duckdb(spark, sf_dir, sql):
    register_views(spark, sf_dir)
    got = spark.sql(sql).toPandas()
    con = duck_connect(sf_dir)
    try:
        expect = con.execute(sql).df()
    finally:
        con.close()
    assert canonical_rows(got) == canonical_rows(expect), sql


@st.composite
def random_setop_query(draw) -> str:
    op = draw(st.sampled_from(["UNION", "INTERSECT", "EXCEPT", "UNION ALL"]))
    t1, t2 = draw(
        st.lists(
            st.sampled_from(["click", "view", "purchase", "signup", "error"]),
            min_size=2,
            max_size=2,
            unique=True,
        )
    )
    lo = draw(st.integers(min_value=0, max_value=500))
    return (
        f"SELECT user_id FROM ("
        f"SELECT user_id FROM events WHERE event_type = '{t1}' AND user_id >= {lo} "
        f"{op} "
        f"SELECT user_id FROM events WHERE event_type = '{t2}' AND user_id >= {lo}"
        f") t ORDER BY user_id"
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=random_setop_query())
def test_random_setop_matches_duckdb(spark, sf_dir, sql):
    register_views(spark, sf_dir)
    got = spark.sql(sql).toPandas()
    con = duck_connect(sf_dir)
    try:
        expect = con.execute(sql).df()
    finally:
        con.close()
    assert canonical_rows(got) == canonical_rows(expect), sql


# --- ground-truth check of the exact-sum descale (functions/numeric) ------
# The random-agg properties above prove ENGINE AGREEMENT; this one proves
# both engines agree with an INDEPENDENT exact-rational oracle, on inputs
# that land exactly on 6-decimal boundaries — the class where the old
# double-division descale was observed to diverge by 1 ulp (see
# numeric.dsum's docstring: 4373995120.140000 vs .140001 at sf0.1).
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ks=st.lists(
        st.integers(min_value=-(10**11), max_value=10**11),
        min_size=1,
        max_size=200,
    ),
    nparts=st.integers(min_value=1, max_value=8),
)
def test_dsum_descale_matches_exact_rational(spark, ks, nparts):
    from fractions import Fraction

    vals = [k * 1e-6 for k in ks]  # exactly-6dp doubles: round(x*1e6) == k
    expected = float(Fraction(sum(ks), 10**6))

    sdf = spark.createDataFrame([(v,) for v in vals], "x double").repartition(nparts)
    sdf.createOrReplaceTempView("dsum_prop")
    got_spark = spark.sql(f"SELECT {dsum('x', 's')} FROM dsum_prop").collect()[0]["s"]

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got_duck = con.execute(f"SELECT {dsum('x', 's')} FROM t").fetchone()[0]
    con.close()

    assert got_spark == expected, (got_spark, expected)
    assert got_duck == expected, (got_duck, expected)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    parts=st.lists(
        st.tuples(
            st.sampled_from(["http", "https"]),
            st.text(alphabet="abcDEF", min_size=1, max_size=8),  # host stem
            st.text(alphabet="abXY9", min_size=0, max_size=6),  # path seg
            st.sampled_from(["", "?utm_source=a", "?page=2", "?page=2&utm_x=y",
                             "?utm_a=1&ref=r", "?ref=r&page=2"]),
            st.sampled_from(["", "#frag"]),
            st.sampled_from(["", "/"]),
        ),
        min_size=1,
        max_size=20,
    ),
)
def test_url_canonicalization_idempotent_and_clean(spark, parts):
    """canonicalize_url must be IDEMPOTENT (canon(canon(u)) == canon(u))
    and its output must never retain a fragment, a tracking param, an
    http scheme, an upper-case host char, or a trailing slash — over
    arbitrary messy URL shapes, not just the op's 4 manufactured ones."""
    from pyspark.sql import functions as F

    from filemap_spark.operators.text import canonicalize_url

    urls = [
        f"{scheme}://{host}.Example.COM/{seg}{q}{frag}{slash}"
        for scheme, host, seg, q, frag, slash in parts
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonicalize_url(F.col("url")).alias("c1"),
    ).select("c1", canonicalize_url(F.col("c1")).alias("c2"))
    for r in out.collect():
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])
        assert r["c1"].startswith("https://")
        host_part = r["c1"][len("https://"):].split("/", 1)[0]
        assert host_part == host_part.lower()
        assert "#" not in r["c1"]
        assert "utm_" not in r["c1"] and "ref=" not in r["c1"]
        assert not r["c1"].endswith("/")


@given(
    h=st.integers(min_value=0, max_value=65535),
    n=st.integers(min_value=1, max_value=2_000_000_000),
    min_n=st.integers(min_value=1, max_value=2_000_000_000),
)
def test_temperature_keep_rule_matches_sqrt_semantics(h, n, min_n):
    """sample_temperature_mix's integer rule h²·n < min_n·2³² must agree
    with the real-valued rule h/2¹⁶ < sqrt(min_n/n) EXACTLY (squaring both
    sides of a non-negative inequality is an equivalence) — for any domain
    size up to 2e9 without int64 overflow."""
    from fractions import Fraction

    if min_n > n:
        min_n = n  # the op's min_n is by construction <= every n
    int_rule = h * h * n < min_n * (1 << 32)
    real_rule = Fraction(h * h, 1 << 32) < Fraction(min_n, n)
    assert int_rule == real_rule
    assert h * h * n < 2**63 and min_n * (1 << 32) < 2**63  # no overflow


def test_multiset_setops_partition_the_bag(spark, sf_dir):
    """Multiset identity: per user, m_view = |EXCEPT ALL| + |INTERSECT ALL|
    copies, and INTERSECT ALL copies = min(m_view, m_purchase) — pins that
    exceptAll/intersectAll are bag operators, not distinct-set shortcuts."""
    from filemap_spark.operators.setops import _users_of

    view = _users_of(spark, sf_dir, "view")
    purch = _users_of(spark, sf_dir, "purchase")

    def counts(df):
        return {r["user_id"]: r["n"] for r in df.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}

    m_v, m_p = counts(view), counts(purch)
    exc = counts(view.exceptAll(purch))
    inter = counts(view.intersectAll(purch))
    for u, n in m_v.items():
        assert inter.get(u, 0) == min(n, m_p.get(u, 0))
        assert exc.get(u, 0) + inter.get(u, 0) == n
    # multiplicities only exist at sf >= 0.01 in the contract data; when the
    # input bag has them, the outputs must preserve them (not distinct-ify)
    if any(n > 1 for n in m_v.values()):
        assert any(n > 1 for n in inter.values()) or any(n > 1 for n in exc.values())


def test_upsample_replication_matches_pure_python_rule(spark, sf_dir):
    """sample_upsample_replicate: per-doc copy counts recomputed with
    hashlib md5 + the pure rate rule must match the engine exactly, and
    every doc emits copy_idx 1..n_copies densely."""
    import hashlib

    from filemap_spark.io import load_table
    from filemap_spark.operators.relational import sample_upsample_replicate

    out = sample_upsample_replicate(spark, sf_dir).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault((r["doc_id"], r["source"]), []).append(r["copy_idx"])
        assert r["n_copies"] == max(1, r["n_copies"])
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    base_by_bucket = {0: 2, 1: 1, 2: 1, 3: 0}
    frac_buckets = {0, 1, 3}
    for d in docs:
        bucket = int(d["source"][3:]) % 4
        h = int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:8], 16)
        expect = base_by_bucket[bucket] + (
            1 if bucket in frac_buckets and h < 2**31 else 0
        )
        got = sorted(by_doc.get((d["doc_id"], d["source"]), []))
        assert got == list(range(1, expect + 1)), (d["doc_id"], bucket, expect, got)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(min_value=1, max_value=5000),      # qty in centi-units
            st.integers(min_value=1, max_value=10_500_000),  # price in cents
        ),
        min_size=1,
        max_size=120,
    ),
)
def test_corr_cov_kernel_matches_duckdb_on_random_data(spark, rows):
    """The shared _CORR_COV_SQL text over RANDOM 2-decimal data must produce
    identical results in Spark and DuckDB — beyond the contract tables.
    Two fixed distinct anchor rows per flag keep every group's variance
    strictly positive (corr's denominator)."""
    import duckdb

    from filemap_spark.operators.aggregates import _CORR_COV_SQL

    data = [(f, q / 100.0, p / 100.0) for f, q, p in rows]
    for f in ("A", "N", "R"):
        data += [(f, 1.0, 900.0), (f, 50.0, 104999.0)]  # variance anchors

    sdf = spark.createDataFrame(
        data, "l_returnflag string, l_quantity double, l_extendedprice double"
    )
    # the session fixture is shared: drop the shadow view in finally so a
    # later test issuing SQL against 'lineitem' can never silently read
    # this test's random data
    sdf.createOrReplaceTempView("lineitem")
    try:
        got = spark.sql(_CORR_COV_SQL).toPandas()
    finally:
        spark.catalog.dropTempView("lineitem")

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE lineitem (l_returnflag VARCHAR, l_quantity DOUBLE,"
            " l_extendedprice DOUBLE)"
        )
        con.executemany("INSERT INTO lineitem VALUES (?, ?, ?)", data)
        expect = con.execute(_CORR_COV_SQL).df()
    finally:
        con.close()
    assert canonical_rows(got) == canonical_rows(expect)


def test_davg_tie_rounds_identically_both_engines(spark):
    """Round 6 regression: the hypothesis-found half-micro tie
    (s=396230130000, n=96 → mean 4127397187.5 µ-units). The old
    round(double/count, 6) spelling split the engines (Spark BigDecimal
    shortest-string HALF_UP → ...188, DuckDB binary-value round →
    ...187); mean_micro_6dp decides the tie in exact integer arithmetic,
    identically, for both signs."""
    import duckdb

    from filemap_spark.functions.numeric import mean_micro_6dp

    frag = mean_micro_6dp("s", "n")
    for s in (396230130000, -396230130000):
        sql = f"SELECT {frag} AS v FROM (SELECT cast({s} as bigint) AS s, cast(96 as bigint) AS n) t"
        got_spark = spark.sql(sql).collect()[0]["v"]
        con = duckdb.connect()
        try:
            got_duck = con.execute(sql).fetchone()[0]
        finally:
            con.close()
        expect = 4127.397188 if s > 0 else -4127.397188
        assert got_spark == got_duck == expect, (s, got_spark, got_duck)


def test_mean_micro_6dp_batch_cross_engine(spark):
    """Round 6 sweep: mean_micro_6dp must agree between Spark and DuckDB
    (and with exact Fraction arithmetic, half-away-from-zero) over a batch
    of random (s, n) pairs PLUS constructed exact half-micro ties — the
    family the old round(double/count, 6) spelling diverged on. One VALUES
    relation per engine keeps this a 2-query test."""
    import random
    from fractions import Fraction

    import duckdb

    from filemap_spark.functions.numeric import mean_micro_6dp

    rng = random.Random(20260814)
    pairs = []
    for _ in range(120):
        n = rng.randint(1, 10**6)
        s = rng.randint(-(4 * 10**15), 4 * 10**15)
        pairs.append((s, n))
    # constructed exact .5-micro ties, both signs: s = n*k + n/2 (n even)
    for _ in range(60):
        n = 2 * rng.randint(1, 10**6)
        k = rng.randint(-(10**9), 10**9)
        s = n * k + n // 2
        if abs(s) <= 4 * 10**15:
            pairs.append((s, n))
            pairs.append((-s, n))

    def exact(s, n):
        # round-half-AWAY-from-zero of the micro-unit mean s/n, in exact
        # integer arithmetic, then descale: |s|//n plus a bump when the
        # remainder reaches half of n, sign restored last.
        t = abs(s) // n
        if 2 * (abs(s) % n) >= n:
            t += 1
        r = t if s >= 0 else -t
        return float(Fraction(r, 10**6))

    values = ", ".join(
        f"(cast({s} as bigint), cast({n} as bigint))" for s, n in pairs
    )
    frag = mean_micro_6dp("s", "n")
    sql = (
        f"SELECT {frag} AS v FROM (VALUES {values}) AS t(s, n)"
    )
    got_spark = [r["v"] for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    try:
        got_duck = [r[0] for r in con.execute(sql).fetchall()]
    finally:
        con.close()
    expect = [exact(s, n) for s, n in pairs]
    assert got_spark == got_duck == expect


def test_dsir_gumbel_fragment_batch_cross_engine(spark):
    """Round-17 resampler determinism, fragment-level: the shared
    _DSIR_GUMBEL_Q_SQL text (md5-rational u → −ln(−ln u) quantized at
    1e-4 into int64) must produce IDENTICAL integers in Spark and DuckDB
    over the full h range — the endpoints (0 and 2^32−1, the extreme
    Gumbel values ≈ −3.1/+22.2), a dense random batch, and near-boundary
    values. One VALUES relation per engine (the mean_micro_6dp batch
    pattern). This is the exact expression the sampling key adds to the
    importance weight, so integer identity here IS top-k portability."""
    import random

    import duckdb

    from filemap_spark.operators.text import _DSIR_GUMBEL_Q_SQL

    rng = random.Random(20260817)
    hs = [0, 1, 2**31, 2**32 - 2, 2**32 - 1]
    hs += [rng.randrange(0, 2**32) for _ in range(400)]
    values = ", ".join(f"(cast({h} as bigint))" for h in hs)
    sql = f"SELECT {_DSIR_GUMBEL_Q_SQL} AS g FROM (VALUES {values}) AS t(h)"
    got_spark = [r["g"] for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    try:
        got_duck = [r[0] for r in con.execute(sql).fetchall()]
    finally:
        con.close()
    assert got_spark == got_duck
    # magnitude envelope: |g_q| stays far inside int64 when added to any
    # realistic importance sum (the docstring's capacity argument)
    assert all(-40_000 <= g <= 230_000 for g in got_spark)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["click", "signup", "view"]),
            st.integers(min_value=-10_000_00, max_value=10_000_00),  # cents
        ),
        min_size=1,
        max_size=150,
    ),
)
def test_welch_kernel_matches_duckdb_on_random_data(spark, rows):
    """Round-17 extension of the corr_cov property (VERDICT r16 task 1):
    the shared _WELCH_STATS/_WELCH_FINAL text over RANDOM 2-decimal
    values must produce identical results in Spark and DuckDB — the
    mean_diff quotient moved from round(x, 6) to round6_half_away
    because a difference of exact-rational quotients is precisely the
    class where the engines' round() can split on a shortest-repr '.5'
    double. Two distinct anchor rows per group keep both sample
    variances strictly positive (t_stat's denominator)."""
    import duckdb

    from filemap_spark.operators.aggregates import _WELCH_FINAL, _WELCH_STATS

    data = [(t, c / 100.0) for t, c in rows]
    for t in ("click", "signup"):
        data += [(t, -355.25), (t, 7043.75)]  # variance anchors

    sql = (
        "WITH q AS (SELECT event_type,"
        " cast(round(value * 1000) AS bigint) AS q FROM welch_ev"
        " WHERE event_type IN ('click', 'signup')),"
        f" s AS (SELECT {_WELCH_STATS} FROM q)"
        f" SELECT {_WELCH_FINAL} FROM s"
    )
    sdf = spark.createDataFrame(data, "event_type string, value double")
    sdf.createOrReplaceTempView("welch_ev")
    try:
        got = spark.sql(sql).toPandas()
    finally:
        spark.catalog.dropTempView("welch_ev")

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE welch_ev (event_type VARCHAR, value DOUBLE)")
        con.executemany("INSERT INTO welch_ev VALUES (?, ?)", data)
        expect = con.execute(sql).df()
    finally:
        con.close()
    assert canonical_rows(got) == canonical_rows(expect)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**7),   # c / promo_micro
            st.integers(min_value=1, max_value=10**12),  # n_total / total_micro
        ),
        min_size=1,
        max_size=60,
    ),
)
def test_share_fragments_match_duckdb_on_random_ratios(spark, pairs):
    """Round-17 migrations, fragment-level: the shared share_pct and
    promo_pct expressions (_HH_SHARE_PCT / _Q14_PROMO_PCT) must produce
    identical doubles in Spark and DuckDB over random exact-integer
    numerator/denominator pairs — including regimes where c·100/n_total
    lands near 6dp ties. One VALUES relation per engine, both fragments
    evaluated per row."""
    import duckdb

    from filemap_spark.operators.aggregates import (
        _HH_SHARE_PCT,
        _Q14_PROMO_PCT,
    )

    pairs = [(min(a, b), b) for a, b in pairs]  # shares <= 100%
    values = ", ".join(
        f"(cast({a} as bigint), cast({b} as bigint))" for a, b in pairs
    )
    sql = (
        f"SELECT {_HH_SHARE_PCT} AS hh, "
        f"{_Q14_PROMO_PCT.replace('promo_micro', 'c').replace('total_micro', 'n_total')} AS q14 "
        f"FROM (VALUES {values}) AS t(c, n_total)"
    )
    got_spark = [(r["hh"], r["q14"]) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    try:
        got_duck = con.execute(sql).fetchall()
    finally:
        con.close()
    assert got_spark == [tuple(r) for r in got_duck]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]),
            min_size=1,
            max_size=130,
        ),
        min_size=1,
        max_size=6,
    ),
)
def test_exact_substring_matches_reference_on_random_corpora(
    spark, tmp_path_factory, docs
):
    """Round-17 substring-dedup property: on random tiny-vocabulary
    corpora (3 tokens, doc lengths straddling the 50-token threshold —
    maximal window collision pressure, within-doc AND cross-doc), the
    op's maximal spans must equal the pure-Python ExactSubstr reference
    (duplicated fixed-L windows → interval union). Random data reaches
    island shapes the constructed mechanism test cannot enumerate:
    nested overlaps, runs of identical windows, docs entirely below L."""
    from collections import Counter, defaultdict

    from filemap_spark.operators.text import (
        _SUBSTR_SPAN_TOKENS as L,
        dedup_exact_substring,
    )

    rows = [(i + 1, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' as lang", "'src0' as source",
        "cast(length(text) as long) as n_chars",
    )
    src = tmp_path_factory.mktemp("substr_prop")
    df.write.mode("overwrite").parquet(str(src / "documents.parquet"))

    counts = Counter()
    wins = defaultdict(list)
    for i, toks in enumerate(docs):
        for p in range(len(toks) - L + 1):
            span = " ".join(toks[p : p + L])
            counts[span] += 1
            wins[i + 1].append((p + 1, span))
    want = []
    for i in sorted(wins):
        dup_pos = [p for p, s in wins[i] if counts[s] > 1]
        run = []
        for p in dup_pos:
            if run and p - run[-1] <= L:
                run.append(p)
            else:
                if run:
                    want.append(
                        (i, run[0], run[-1] + L - 1,
                         run[-1] + L - run[0], len(run))
                    )
                run = [p]
        if run:
            want.append(
                (i, run[0], run[-1] + L - 1, run[-1] + L - run[0], len(run))
            )

    got = [
        (r["doc_id"], r["span_start"], r["span_end"],
         r["n_span_tokens"], r["n_dup_windows"])
        for r in dedup_exact_substring(spark, str(src)).collect()
    ]
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("ab ")), min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
def test_mapside_shingles_match_pure_python_on_adversarial_texts(spark, texts):
    """Round-9 shingle-rewrite property: on arbitrary texts — empty
    strings, runs of spaces (empty tokens), docs shorter than the 5-gram
    width, heavy repetition — the map-side _shingle_frame must equal the
    pure-python definition: distinct space-joined 5-token windows of
    split(text, ' ')."""
    from filemap_spark.operators.text import _shingle_frame

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {(r["doc_id"], r["shingle"]) for r in _shingle_frame(docs).collect()}

    want = set()
    for i, t in enumerate(texts):
        w = t.split(" ")
        for p in range(len(w) - 4):
            want.add((i, " ".join(w[p : p + 5])))
    assert got == want


# ---------------------------------------------------------------------------
# Codec round-trip properties (round 13): arbitrary images, not fixed seeds
# ---------------------------------------------------------------------------

_img_dims = st.tuples(
    st.integers(min_value=1, max_value=5),  # height / 8
    st.integers(min_value=1, max_value=5),  # width / 8
)


@given(dims=_img_dims, data=st.data())
@settings(max_examples=30, deadline=None)
def test_jpeg_entropy_layer_roundtrip_property(dims, data):
    """For ANY 8-bit grayscale image with dims multiple of 8, the decoder
    recovers the encoder's quantized coefficient blocks bit-exactly —
    the lossless-layer contract of mm_decode_jpeg, hypothesis-wide."""
    import numpy as np

    from filemap_spark.functions.jpeg import decode_gray, encode_gray

    h, w = dims[0] * 8, dims[1] * 8
    seed = data.draw(st.integers(min_value=0, max_value=2**31 - 1))
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8
    )
    payload, enc = encode_gray(img, quality=90)
    rw, rh, _pix, dec = decode_gray(payload)
    assert (rw, rh) == (w, h)
    assert (enc == dec).all()


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_png_decode_inverts_arbitrary_filter_sequences(w, h, seed, data):
    """For ANY RGB image and ANY per-row filter-type sequence (0-4),
    _parse_png recovers the exact pixel bytes — the full-filter-set
    contract of mm_decode_png, hypothesis-wide (the graded builder only
    emits 0-2; this covers the decoder surface real-world PNGs use)."""
    import numpy as np

    from filemap_spark.operators.multimodal import _parse_png
    from tests.test_kernels import _encode_png_reference

    filters = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=4), min_size=h, max_size=h
        )
    )
    pixels = np.random.default_rng(seed).integers(
        0, 256, size=(h, w * 3), dtype=np.uint8
    )
    png = _encode_png_reference(pixels, filters)
    rw, rh, depth, ctype, raw = _parse_png(png)
    assert (rw, rh, depth, ctype) == (w, h, 8, 2)
    assert raw == pixels.tobytes()


@given(
    n_sigs=st.integers(min_value=2, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    params=st.sampled_from([(8, 8, 7), (16, 4, 15)]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_block_pigeonhole_pairs_property(spark, n_sigs, seed, params):
    """The shared candidate-join helper (functions/blocked.py) at BOTH
    deployed parameterizations: for arbitrary 64-bit signatures, the
    returned pair set equals brute-force all-pairs hamming <= threshold —
    perfect recall (pigeonhole) AND perfect precision (exact verify),
    property-wide."""
    import itertools

    import numpy as np

    from filemap_spark.functions.blocked import block_pigeonhole_pairs

    n_blocks, block_bits, threshold = params
    rng = np.random.default_rng(seed)
    # mixed population: random sigs + mutated near-neighbors so pairs
    # under the threshold actually occur
    sigs = list(rng.integers(0, 2**63 - 1, size=n_sigs, dtype=np.int64))
    base = int(sigs[0])
    for _ in range(min(4, n_sigs - 1)):
        flips = rng.integers(0, 64, size=int(rng.integers(1, threshold + 3)))
        m = base
        for f in flips:
            m ^= 1 << int(f)
        m = m - (1 << 64) if m >= 1 << 63 else m
        sigs.append(np.int64(m))
    sigs = sorted({int(s) for s in sigs})
    frame = spark.createDataFrame([(s,) for s in sigs], "sig long")

    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in block_pigeonhole_pairs(
            frame, id_col="sig", sig_col="sig",
            n_blocks=n_blocks, block_bits=block_bits, threshold=threshold,
        ).collect()
    }
    expected = set()
    for a, b in itertools.combinations(sigs, 2):
        d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        if d <= threshold:
            expected.add((min(a, b), max(a, b), d))
    assert got == expected


@given(
    weights=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=120),
    splits=st.lists(st.integers(min_value=0, max_value=119), max_size=6),
    q=st.sampled_from([(1, 2), (9, 10), (1, 4), (99, 100), (1, 1)]),
)
@settings(max_examples=200, deadline=None)
def test_weighted_threshold_bin_matches_naive_percentile(weights, splits, q):
    """agg_weighted_percentile's driver half (weighted_threshold_bin) +
    the in-bin scan must equal the naive sorted-list weighted percentile
    for ANY value multiset, ANY monotone binning (including empty and
    singleton bins), and any num/den threshold — the property that makes
    the two-pass bin search safe to trust at corpus sizes the naive form
    can't run at. Values are the sorted distinct ints 0..n-1 (value
    identity is irrelevant to the search; only weights and bin
    boundaries matter)."""
    from filemap_spark.operators.aggregates import weighted_threshold_bin

    num, den = q
    n = len(weights)
    # monotone binning: bin id = number of split points <= value index
    cuts = sorted(set(s for s in splits if s < n))
    bins = [sum(1 for c in cuts if c <= i) for i in range(n)]
    hist: dict[int, int] = {}
    for b, w in zip(bins, weights):
        hist[b] = hist.get(b, 0) + w
    tw = sum(weights)

    target_bin, cum_before = weighted_threshold_bin(hist, num, den, tw)
    cum = cum_before
    got = None
    for i in range(n):
        if bins[i] != target_bin:
            continue
        cum += weights[i]
        if den * cum >= num * tw:
            got = i
            break

    cum, expected = 0, None
    for i in range(n):
        cum += weights[i]
        if den * cum >= num * tw:
            expected = i
            break

    assert got == expected


@given(
    rows=st.integers(min_value=1, max_value=8),
    dim=st.integers(min_value=1, max_value=16),
    cut=st.integers(min_value=1, max_value=16),
    scale=st.floats(min_value=0.1, max_value=100.0),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=150, deadline=None)
def test_prefix_renormalize_is_order_invariant_with_scaling(
    rows, dim, cut, scale, seed
):
    """The identity emb_matryoshka_eval rests on: truncating RAW vectors
    then normalizing equals truncating NORMALIZED vectors then
    re-normalizing (the full-vector scale cancels), for any width, any
    cut (including cut >= dim = identity), and any positive per-vector
    scaling. Also pins the zero-prefix guard (a vector whose first `cut`
    components are all zero must not produce NaNs)."""
    import numpy as np

    from filemap_spark.operators.similarity import _prefix_renormalize

    rng = np.random.default_rng(seed)
    raw = rng.standard_normal((rows, dim)) * scale
    raw[0, : min(cut, dim)] = 0.0  # exercise the zero-norm guard

    full_norms = np.linalg.norm(raw, axis=1, keepdims=True)
    full_norms[full_norms == 0] = 1.0
    normalized = raw / full_norms

    via_op = _prefix_renormalize(normalized, cut)

    pre = raw[:, : min(cut, dim)]
    norms = np.linalg.norm(pre, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    direct = pre / norms

    assert via_op.shape == direct.shape
    assert np.allclose(via_op, direct, atol=1e-12)
    assert np.isfinite(via_op).all()
