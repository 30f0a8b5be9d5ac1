"""JSONL source: round-trip fidelity and the malformed-line contract."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from demv_spark.sources.readers import read_jsonl, write_jsonl

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".sink_scratch")


@pytest.fixture()
def scratch():
    os.makedirs(SCRATCH, exist_ok=True)
    d = os.path.join(SCRATCH, "jsonl")
    shutil.rmtree(d, ignore_errors=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_jsonl_roundtrip_preserves_text(spark, scratch):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    write_jsonl(docs.select("doc_id", "text", "source", "n_chars"), scratch)
    back = read_jsonl(spark, scratch, schema=docs.select(
        "doc_id", "text", "source", "n_chars").schema)
    a = {r["doc_id"]: (r["text"], r["n_chars"]) for r in back.collect()}
    b = {r["doc_id"]: (r["text"], r["n_chars"]) for r in
         docs.select("doc_id", "text", "n_chars").collect()}
    assert a == b  # unicode/escaping survive the JSON hop exactly


def test_jsonl_corrupt_lines_are_quarantined_not_fatal(spark, scratch):
    os.makedirs(scratch, exist_ok=True)
    with open(os.path.join(scratch, "part-0.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write('{"doc_id": 2, "text": "also ok"}\n')
        f.write('{"doc_id": 3, "text": BROKEN SYNTAX\n')
        f.write('not json at all\n')
    schema = "doc_id long, text string"
    back = read_jsonl(spark, scratch, schema=schema)
    rows = back.collect()
    assert len(rows) == 4
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["doc_id"] for r in good} == {1, 2}
    # broken lines arrive as raw text for quarantine, not job death
    assert len(bad) == 2
    assert all(r["doc_id"] is None for r in bad)
