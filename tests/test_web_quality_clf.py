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
