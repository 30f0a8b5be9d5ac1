"""URL/domain blocklist filtering + hashed linear classifier tests."""

import pyspark.sql.functions as F
import pytest

from demv_spark.operators import quality_clf as qc, web

URLS = [
    (1, "https://cdn.example.com/a"),
    (2, "https://example.com/"),
    (3, "https://notexample.com/x"),          # NOT blocked by example.com
    (4, "http://a.b.blocked.org:8080/q?x=1"), # port + query stripped
    (5, "https://safe.org/path#frag"),
    (6, "ftp://EXAMPLE.COM/UP"),              # case-folded
    (7, "no-scheme-here"),                    # no host → empty domain
]


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(URLS, ["doc_id", "url"])


def test_extract_domain(urls):
    got = {
        r["doc_id"]: r["d"]
        for r in urls.select("doc_id", web.extract_domain("url", "d")).collect()
    }
    assert got[1] == "cdn.example.com"
    assert got[4] == "a.b.blocked.org"
    assert got[5] == "safe.org"
    assert got[6] == "example.com"
    assert got[7] == ""


def test_domain_suffixes(spark):
    row = spark.range(1).select(
        web.domain_suffixes(F.lit("cdn.a.com")).alias("s")
    ).collect()[0]
    assert row["s"] == ["cdn.a.com", "a.com", "com"]


def test_flag_blocked_dot_boundary(urls):
    out = web.flag_blocked_domains(urls, ["example.com", "blocked.org"])
    got = {r["doc_id"]: r["blocked"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 0, 4: 1, 5: 0, 6: 1, 7: 0}


def test_join_form_matches_flag_form(spark, urls):
    blocked = ["example.com", "blocked.org"]
    flagged = web.flag_blocked_domains(urls, blocked)
    keep_flag = {r["doc_id"] for r in flagged.filter("blocked = 0").collect()}
    bl = spark.createDataFrame([(b,) for b in blocked], ["domain"])
    keep_join = {
        r["doc_id"] for r in web.block_by_domain_join(urls, bl).collect()
    }
    assert keep_join == keep_flag


def test_flag_blocked_is_map_only(urls):
    from demv_spark.plans.introspect import plan_stats

    s = plan_stats(web.flag_blocked_domains(urls, ["example.com"]))
    assert s["n_exchanges"] == 0
    assert s["n_broadcasts"] == 0
    assert not s["has_python_udf"]


DOCS = [
    (1, "spark scales out"),
    (2, "spark scales out"),       # identical text → identical score
    (3, "SPARK   Scales\tout"),    # normalization-equivalent
    (4, ""),                       # empty → 0 features, score 0
    (5, None),                     # null → treated as empty
    (6, "one"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_hashed_linear_score_deterministic(docs):
    out = {
        r["doc_id"]: (r["n_feats"], r["score"], r["label"])
        for r in qc.hashed_linear_score(docs).collect()
    }
    assert out[1] == out[2] == out[3]
    assert out[1][0] == 3
    assert out[4] == (0, 0, 1)  # empty doc: score 0 ≥ bias 0
    assert out[5] == (0, 0, 1)
    # single-token score equals the token's own weight
    w = qc.hashed_token_weight
    docs_df = docs.sparkSession.range(1).select(
        w(F.lit("one")).alias("w")
    ).collect()
    assert out[6][1] == docs_df[0]["w"]
    assert -1000 <= out[6][1] <= 1000


def test_hashed_linear_python_reference(docs):
    # independent Python recomputation of the md5 weight chain
    import hashlib

    def weight(tok):
        h = int(hashlib.md5(f"qclf1:{tok}".encode()).hexdigest()[:15], 16)
        return h % 2001 - 1000

    expected = sum(weight(t) for t in "spark scales out".split())
    got = {
        r["doc_id"]: r["score"] for r in qc.hashed_linear_score(docs).collect()
    }
    assert got[1] == expected


def test_hashed_linear_is_map_only(docs):
    from demv_spark.plans.introspect import plan_stats

    s = plan_stats(qc.hashed_linear_score(docs))
    assert s["n_exchanges"] == 0
    assert not s["has_python_udf"]


def test_table_form_matches_hashed_weights(spark, docs):
    # weight table holding the SAME hash-derived weights the map-only
    # form computes ⇒ identical scores through the join path
    import hashlib

    n_buckets = 1 << 16
    toks = {
        t
        for _, txt in DOCS
        if txt
        for t in txt.lower().split()
    }
    rows = []
    for t in toks:
        h = int(hashlib.md5(f"qclf1:{t}".encode()).hexdigest()[:15], 16)
        rows.append((h % n_buckets, h % 2001 - 1000))
    # distinct buckets only (no collisions among these 4 tokens)
    wt = spark.createDataFrame(sorted(set(rows)), ["bucket", "weight"])
    out = qc.linear_score_with_table(docs, wt, n_buckets=n_buckets)
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    ref = {
        r["doc_id"]: r["score"]
        for r in qc.hashed_linear_score(docs).collect()
        if r["n_feats"] > 0
    }
    assert got == ref  # empty/null docs absent from the join form


def test_table_form_broadcasts(spark, docs):
    from demv_spark.plans.introspect import plan_stats

    wt = spark.createDataFrame([(0, 5)], ["bucket", "weight"])
    s = plan_stats(qc.linear_score_with_table(docs, wt))
    assert s["n_broadcasts"] >= 1
    assert s["n_sort_merge_joins"] == 0


def test_hashed_linear_score_streams(spark, tmp_path):
    """The classifier is pure column arithmetic, so the SAME call
    works on a readStream DataFrame — streaming corpus scoring with
    zero operator changes (batch/stream symmetry contract)."""
    import pyspark.sql.functions as F  # noqa: F811 (local clarity)

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"doc number {i} spark scale") for i in range(20)],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(src)
    batch = {
        (r["doc_id"], r["score"], r["label"])
        for r in qc.hashed_linear_score(spark.read.parquet(src))
        .select("doc_id", "score", "label")
        .collect()
    }
    schema = spark.read.parquet(src).schema
    stream = qc.hashed_linear_score(
        spark.readStream.schema(schema).parquet(src)
    ).select("doc_id", "score", "label")
    q = (
        stream.writeStream.format("memory")
        .queryName("qclf_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM qclf_sink").collect()}
    assert got == batch


# ---- canonicalize_url ----

CANON_CASES = [
    # scheme + host case-fold, path case preserved
    ("HTTPS://WWW.Example.COM/Path", "https://www.example.com/Path"),
    # default ports dropped, non-default kept
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:8080/x", "https://a.com:8080/x"),
    ("http://a.com:443/x", "http://a.com:443/x"),  # 443 is not http's default
    # tracking params stripped, survivor order preserved
    ("https://a.com/p?utm_source=x&q=1&fbclid=z", "https://a.com/p?q=1"),
    ("https://a.com/p?utm_campaign=x&gclid=1", "https://a.com/p"),
    ("https://a.com/p?b=2&a=1", "https://a.com/p?b=2&a=1"),
    # trailing slashes collapse; bare host → '/'
    ("https://a.com", "https://a.com/"),
    ("https://a.com/", "https://a.com/"),
    ("https://a.com/x///", "https://a.com/x"),
    # fragment dropped
    ("https://a.com/x#frag", "https://a.com/x"),
    ("https://a.com/x?q=1#frag", "https://a.com/x?q=1"),
    # no scheme → lower-trimmed passthrough
    ("  Not A Url  ", "not a url"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], ["i", "url"]
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", web.canonicalize_url("url", "c")).collect()
    }
    for i, (u, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_canonicalize_url_is_idempotent(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], ["i", "url"]
    )
    once = df.select("i", web.canonicalize_url("url", "c"))
    twice = once.select("i", web.canonicalize_url("c", "c2"))
    for r in twice.join(once, "i").collect():
        assert r["c2"] == r["c"]


# ---- cap_per_key / split_by_hash ----


def test_cap_per_key_flags_at_most_cap(spark):
    from demv_spark.operators.corpus import cap_per_key

    df = spark.createDataFrame(
        [(i, f"d{i % 5}") for i in range(200)], ["doc_id", "domain"]
    )
    out = cap_per_key(df, ["domain"], cap=7, id_cols=["doc_id"])
    per = (
        out.groupBy("domain")
        .agg(F.sum("admitted").alias("adm"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["adm"] == 7 for r in per)  # every domain has 40 > 7 rows
    assert all(r["n"] == 40 for r in per)   # flags, never filters


def test_cap_per_key_salted_equals_unsalted(spark):
    from demv_spark.operators.corpus import cap_per_key

    df = spark.createDataFrame(
        [(i, f"d{i % 3}") for i in range(300)], ["doc_id", "domain"]
    )
    plain = {
        r["doc_id"]: r["admitted"]
        for r in cap_per_key(df, ["domain"], 11, ["doc_id"]).collect()
    }
    salted = {
        r["doc_id"]: r["admitted"]
        for r in cap_per_key(
            df.repartition(7), ["domain"], 11, ["doc_id"], skew_salt=4
        ).collect()
    }
    assert plain == salted


def test_split_by_hash_leakage_free_and_deterministic(spark):
    from demv_spark.operators.corpus import split_by_hash

    df = spark.createDataFrame(
        [(i, f"d{i % 40}") for i in range(400)], ["doc_id", "domain"]
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_by_hash(df, ["domain"], fr).collect()
    by_domain = {}
    for r in out:
        by_domain.setdefault(r["domain"], set()).add(r["split"])
    # every key maps to exactly one split
    assert all(len(s) == 1 for s in by_domain.values())
    # deterministic under repartition
    again = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(df.repartition(13), ["domain"], fr).collect()
    }
    assert again == {r["doc_id"]: r["split"] for r in out}
    # all three splits present at 40 keys
    assert {r["split"] for r in out} == {"train", "val", "test"}


def test_split_by_hash_rejects_bad_fractions(spark):
    from demv_spark.operators.corpus import split_by_hash

    df = spark.createDataFrame([(1, "a")], ["doc_id", "domain"])
    with pytest.raises(ValueError, match="sum to 1"):
        split_by_hash(df, ["domain"], {"train": 0.5, "test": 0.1})


def test_canonicalize_url_fuzz_idempotent(spark):
    import random

    rng = random.Random(99)
    schemes = ["http", "HTTPS", "ftp", ""]
    hosts = ["A.b.COM", "x.org", "LOCALHOST", "a-b.c", ""]
    ports = ["", ":80", ":443", ":8080", ":0"]
    paths = ["", "/", "/P/q", "/x//", "/%7Euser", "/a b"]
    queries = ["", "?", "?utm_source=1", "?a=1&utm_x=2&b=3", "?fbclid=9", "?=&&"]
    frags = ["", "#f", "#a#b"]
    urls = []
    for i in range(300):
        s = rng.choice(schemes)
        u = (
            (s + "://" if s else "") + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        )
        urls.append((i, u))
    df = spark.createDataFrame(urls, ["i", "url"])
    once = df.select("i", "url", web.canonicalize_url("url", "c"))
    rows = once.select(
        "i", "url", "c", web.canonicalize_url("c", "c2")
    ).collect()
    import re

    has_host = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+")
    for r in rows:
        assert r["c2"] == r["c"], f"not idempotent: {r['url']!r} -> {r['c']!r} -> {r['c2']!r}"
        if has_host.match(r["url"]):  # hostless rows pass through verbatim
            assert "#" not in r["c"]
            assert "utm_" not in r["c"] and "fbclid" not in r["c"]


def test_split_by_hash_thresholds_are_exact_integers(spark):
    """0.7+0.1 accumulates to 0.7999999999999999 in float; the
    threshold must still be the exact 800000 an oracle writes down
    (reported by review: int() truncation shifted it to 799999)."""
    from demv_spark.functions.compat import portable_hash
    from demv_spark.operators.corpus import split_by_hash

    df = spark.createDataFrame([(i,) for i in range(3000)], ["k"])
    out = split_by_hash(df, ["k"], {"a": 0.7, "b": 0.1, "c": 0.2})
    buckets = df.select(
        "k",
        (portable_hash(F.concat_ws(":", F.lit("split42"), F.col("k").cast("string")))
         % 1_000_000).alias("bucket"),
    )
    joined = {r["k"]: (r["bucket"], r["split"]) for r in out.join(buckets, "k").collect()}
    for k, (bucket, split) in joined.items():
        want = "a" if bucket < 700000 else ("b" if bucket < 800000 else "c")
        assert split == want, f"k={k} bucket={bucket}: {split} != {want}"


def test_cap_per_key_salted_keeps_null_keys(spark):
    """ADVICE r4: the salted path's offset join must be NULL-safe —
    NULL-keyed rows form their own group, identical to the unsalted
    path (flags, not filters; no rows vanish)."""
    from demv_spark.operators.corpus import cap_per_key

    rows = [(i, None if i < 10 else f"d{i % 3}") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    plain = cap_per_key(df, ["domain"], 3, ["doc_id"]).collect()
    salted = cap_per_key(df, ["domain"], 3, ["doc_id"], skew_salt=4).collect()
    assert len(plain) == 20 and len(salted) == 20
    p = {r["doc_id"]: r["admitted"] for r in plain}
    s = {r["doc_id"]: r["admitted"] for r in salted}
    assert p == s
    null_admitted = sum(r["admitted"] for r in salted if r["domain"] is None)
    assert null_admitted == 3  # NULL key gets its own quota


def test_html_to_text_semantics(spark):
    from demv_spark.operators.web import html_to_text

    cases = {
        1: ("<p>Hello <b>world</b></p>", "Hello world"),
        2: ("<script>var x='<p>';</script>after", "after"),
        3: ("<style>p{color:red}</style>text", "text"),
        4: ("<!-- hidden -->shown", "shown"),
        5: ("A&amp;B &lt;tag&gt; &amp;lt;esc", "A&B <tag> &lt;esc"),
        6: ("a<br/>b<BR>c", "a b c"),
        7: ("no markup", "no markup"),
        8: ("", ""),
        9: (None, None),
        10: ("<SCRIPT>UPPER()</SCRIPT>x<STYLE>y</STYLE>z", "x z"),
        11: ("word<div>glue</div>check", "word glue check"),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "i long, html string"
    )
    got = {r["i"]: r["t"] for r in df.select("i", html_to_text("html", "t")).collect()}
    assert got == {k: v[1] for k, v in cases.items()}


def test_html_to_text_matches_duckdb_on_fuzz(spark):
    """Cross-engine parity of the strip chain under deterministic
    fuzz: tag fragments, nested/unclosed markup, entity near-misses,
    unicode — the same pattern strings must transform identically in
    Java regex and RE2."""
    import random

    import duckdb

    from demv_spark.operators.web import (
        HTML_ENTITIES,
        HTML_STRIP_PATTERNS,
        html_to_text,
    )

    rng = random.Random(13)
    pieces = ["<p>", "</p>", "<script>", "</script >", "<style>", "</style>",
              "<!--", "-->", "&amp;", "&lt;", "&nbsp;", "<div class='x'>",
              "word", " é京 ", "a<b", ">", "<", "text\n", "<BR/>", "&#39;"]
    rows = [(i, "".join(rng.choice(pieces) for _ in range(rng.randint(0, 25))))
            for i in range(60)]
    df = spark.createDataFrame(rows, ["i", "html"])
    got = {r["i"]: r["t"] for r in df.select("i", html_to_text("html", "t")).collect()}

    con = duckdb.connect()
    for i, html in rows:
        v = html
        for pat, rep in HTML_STRIP_PATTERNS:
            (v,) = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [v, pat, rep]
            ).fetchone()
        for ent, rep in HTML_ENTITIES:
            v = v.replace(ent, rep)
        (v,) = con.execute(
            r"SELECT trim(regexp_replace(?, '\s+', ' ', 'g'))", [v]
        ).fetchone()
        assert got[i] == v, (i, html)


# ---- crawl frontier (round 9) ----

def test_crawl_frontier_cap_determinism_and_authority(spark):
    import pyspark.sql.functions as F

    from demv_spark.operators.graph import pagerank_integer
    from demv_spark.operators.web import crawl_frontier

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cands = d.select(
        F.lower("source").alias("domain"),
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
    )
    edges = d.select(
        F.lower("source").alias("src"),
        F.concat(F.lit("hub"), (F.col("doc_id") % 3).cast("string")).alias("dst"),
    )
    auth = pagerank_integer(edges, iterations=2)
    out = crawl_frontier(cands, auth, per_domain=3)
    per = {r["domain"]: r["n"] for r in
           out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per and all(n <= 3 for n in per.values())
    # slots are 1..k dense per domain
    assert out.filter((F.col("slot") < 1) | (F.col("slot") > 3)).count() == 0
    # deterministic under partitioning
    again = crawl_frontier(cands.repartition(9), auth, per_domain=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # authority matches the pagerank table per domain; unseen domain -> 0
    a = {r["node"]: r["rank_int"] for r in auth.collect()}
    for r in out.collect():
        assert r["authority"] == a.get(r["domain"], 0)
    lone = spark.createDataFrame(
        [("brand-new.example", "u1")], ["domain", "url"])
    scored = crawl_frontier(lone, auth, per_domain=3).collect()
    assert scored[0]["authority"] == 0 and scored[0]["slot"] == 1


# ---- robots.txt politeness (round 9, sixth wave) ----

@pytest.fixture(scope="module")
def robots_tables(spark):
    from demv_spark.operators.web import robots_rules

    txt_a = (
        "# banner comment\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/pub*\n"
        "\n"
        "USER-AGENT: DemvBot   # trailing comment\n"
        "Disallow: /search$\n"
        "ALLOW: /\n"
        "Disallow:\n"          # empty pattern -> ignored per RFC
    )
    txt_b = (
        "User-agent: a\n"
        "User-agent: demvbot\n"
        "Disallow: /*.pdf$\n"
        "Allow: /docs/\n"
    )
    robots = spark.createDataFrame(
        [("a.com", txt_a), ("b.com", txt_b)], ["domain", "robots_txt"]
    )
    return robots_rules(robots).persist()


def test_robots_rules_groups_agents_and_strips_noise(robots_tables):
    rows = {
        (r["domain"], r["agent"], r["rule"], r["pattern"])
        for r in robots_tables.collect()
    }
    # keys/agents case-folded, comments stripped, empty Disallow gone
    assert rows == {
        ("a.com", "*", "disallow", "/private/"),
        ("a.com", "*", "allow", "/private/pub*"),
        ("a.com", "demvbot", "disallow", "/search$"),
        ("a.com", "demvbot", "allow", "/"),
        # the multi-UA group fans its rules out to BOTH agents
        ("b.com", "a", "disallow", "/*.pdf$"),
        ("b.com", "a", "allow", "/docs/"),
        ("b.com", "demvbot", "disallow", "/*.pdf$"),
        ("b.com", "demvbot", "allow", "/docs/"),
    }
    # group ids: a.com has two groups, b.com one
    gids = {
        (r["domain"], r["agent"]): r["group_id"]
        for r in robots_tables.collect()
    }
    assert gids[("a.com", "*")] != gids[("a.com", "demvbot")]
    assert gids[("b.com", "a")] == gids[("b.com", "demvbot")]


def test_robots_allowed_precedence_and_shadowing(spark, robots_tables):
    from demv_spark.operators.web import robots_allowed

    urls = spark.createDataFrame(
        [(f"https://{d}{p}",)
         for d in ("a.com", "b.com", "nobots.org")
         for p in ("/", "/private/x", "/private/pub1", "/search",
                   "/search/x", "/docs/a.pdf", "/a.pdf")],
        ["url"],
    )
    got = {
        r["url"]: (r["allowed"], r["matched_len"])
        for r in robots_allowed(urls, robots_tables, "DemvBot").collect()
    }
    # a.com: the exact-agent group SHADOWS *, so /private/* is fine,
    # /search blocked only exactly (trailing $)
    assert got["https://a.com/search"] == (0, 8)
    assert got["https://a.com/search/x"] == (1, 1)
    assert got["https://a.com/private/x"] == (1, 1)
    # b.com: longest pattern wins — /*.pdf$ (7) beats /docs/ (6)
    assert got["https://b.com/docs/a.pdf"] == (0, 7)
    assert got["https://b.com/a.pdf"] == (0, 7)
    assert got["https://b.com/docs/a.pdf"][0] == 0
    assert got["https://b.com/"] == (1, 0)
    # unknown domain: default allow, nothing matched
    assert all(got[f"https://nobots.org{p}"] == (1, 0)
               for p in ("/", "/a.pdf", "/search"))


def test_robots_allow_beats_disallow_on_equal_length(spark):
    from demv_spark.operators.web import robots_allowed, robots_rules

    txt = "User-agent: *\nDisallow: /abc\nAllow: /ab*\n"
    rules = robots_rules(
        spark.createDataFrame([("t.com", txt)], ["domain", "robots_txt"])
    )
    urls = spark.createDataFrame([("https://t.com/abc",)], ["url"])
    # /abc matches both at length 4: allow wins the tie
    r = robots_allowed(urls, rules, "x").collect()[0]
    assert (r["allowed"], r["matched_len"]) == (1, 4)


def test_robots_like_escapes_metacharacters(spark):
    from demv_spark.operators.web import robots_allowed, robots_rules

    txt = "User-agent: *\nDisallow: /a_b%c\n"
    rules = robots_rules(
        spark.createDataFrame([("t.com", txt)], ["domain", "robots_txt"])
    )
    urls = spark.createDataFrame(
        [("https://t.com/a_b%c/d",), ("https://t.com/aXb%c/d",)], ["url"]
    )
    got = {r["url"]: r["allowed"]
           for r in robots_allowed(urls, rules, "x").collect()}
    # '_' and '%' are literals, not LIKE wildcards
    assert got["https://t.com/a_b%c/d"] == 0
    assert got["https://t.com/aXb%c/d"] == 1


def test_robots_no_python_udf(spark, robots_tables):
    from demv_spark.operators.web import robots_allowed
    from demv_spark.plans.introspect import plan_stats

    urls = spark.createDataFrame([("https://a.com/x",)], ["url"])
    stats = plan_stats(robots_allowed(urls, robots_tables, "demvbot"))
    assert not stats["has_python_udf"] and not stats["has_arrow_eval"]
