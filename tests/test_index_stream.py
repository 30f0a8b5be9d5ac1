"""Streaming inverted-index maintenance: stream ≡ batch, re-fetch
replacement, crash-replay idempotence."""

import shutil
import tempfile
import time

import pyspark.sql.functions as F
import pytest

from demv_spark.operators.text import inverted_index, phrase_search
from demv_spark.streaming.index_stream import (
    index_state,
    streaming_index_maintainer,
)

PREFIX = "t_idxstream"


@pytest.fixture()
def idx(spark):
    from tests.conftest import drop_table_and_dir

    for s in ("_postings", "__meta"):
        drop_table_and_dir(spark, f"{PREFIX}{s}")
    yield PREFIX
    for s in ("_postings", "__meta"):
        drop_table_and_dir(spark, f"{PREFIX}{s}")


def _run(spark, d, prefix):
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = streaming_index_maintainer(stream, prefix)
    q.awaitTermination(120)


def test_stream_index_equals_batch_and_refetch_replaces(spark, idx):
    d = tempfile.mkdtemp(prefix="demv_idxstream_")
    try:
        b1 = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "slow red fox")],
            "doc_id long, text string",
        )
        b1.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)
        # batch 2: new doc 3 + RE-FETCH of doc 2 with different text
        b2 = spark.createDataFrame(
            [(3, "quick brown fox again"), (2, "quick brown fox refetched")],
            "doc_id long, text string",
        )
        b2.coalesce(1).write.mode("append").parquet(d)
        _run(spark, d, idx)

        state = index_state(spark, idx)
        # doc 2's OLD terms (slow, red) are gone; new terms present
        terms2 = {r["term"] for r in state.filter("doc_id = 2").collect()}
        assert terms2 == {"quick", "brown", "fox", "refetched"}
        # equals the batch index over the LATEST version of each doc
        latest = spark.createDataFrame(
            [(1, "the quick brown fox"),
             (2, "quick brown fox refetched"),
             (3, "quick brown fox again")],
            "doc_id long, text string",
        )
        want = sorted(map(tuple, inverted_index(latest).collect()))
        got = sorted(map(tuple, state.collect()))
        assert got == want
        # and phrase search runs on the derived state
        hits = {r["doc_id"] for r in
                phrase_search(state, "quick brown fox").collect()}
        assert hits == {1, 2, 3}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_index_crash_replay_harmless(spark, idx):
    d = tempfile.mkdtemp(prefix="demv_idxstream_")
    try:
        b1 = spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
        )
        b1.coalesce(1).write.mode("append").parquet(d)
        _run(spark, d, idx)
        before = sorted(map(tuple, index_state(spark, idx).collect()))
        n_log = spark.table(f"{PREFIX}_postings").count()

        spark.sql(f"DROP TABLE {PREFIX}__meta")          # the crash
        _run(spark, d, idx)
        spark.catalog.refreshTable(f"{PREFIX}_postings")
        assert spark.table(f"{PREFIX}_postings").count() == 2 * n_log
        assert sorted(map(tuple, index_state(spark, idx).collect())) == before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_index_log_replay_matches_maintainer(spark, idx):
    """The batch replay IS the maintainer's per-batch step: the same
    two micro-batches through index_log_replay + resolve_index_log
    equal the streamed index_state row-for-row."""
    import shutil as _sh
    import tempfile as _tmp

    from demv_spark.streaming.index_stream import (
        index_log_replay,
        resolve_index_log,
    )

    b1 = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "slow red fox")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "quick brown fox again"), (2, "quick brown fox refetched")],
        "doc_id long, text string",
    )
    replayed = resolve_index_log(index_log_replay([b1, b2]))

    d = _tmp.mkdtemp(prefix="demv_idxreplay_")
    try:
        b1.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)
        b2.coalesce(1).write.mode("append").parquet(d)
        _run(spark, d, idx)
        streamed = index_state(spark, idx)
        assert sorted(map(tuple, replayed.collect())) == sorted(
            map(tuple, streamed.collect()))
    finally:
        _sh.rmtree(d, ignore_errors=True)


def test_index_log_replay_refetch_and_empty(spark):
    """Replay-only semantics: a later batch's re-fetch fully replaces
    the doc's terms; an empty batch list raises."""
    from demv_spark.streaming.index_stream import (
        index_log_replay,
        resolve_index_log,
    )

    b1 = spark.createDataFrame([(7, "alpha beta")], "doc_id long, text string")
    b2 = spark.createDataFrame([(7, "gamma")], "doc_id long, text string")
    got = resolve_index_log(index_log_replay([b1, b2])).collect()
    assert {r["term"] for r in got} == {"gamma"}
    assert all(r["doc_id"] == 7 for r in got)
    with pytest.raises(ValueError, match="empty batch list"):
        index_log_replay([])
