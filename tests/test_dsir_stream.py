"""Streaming DSIR census maintenance: stream ≡ batch ≡ replay,
crash-replay idempotence via the (batch_id, bucket)-MAX resolve, and
weights-from-maintained-censuses ≡ one-shot dsir_weights."""

import shutil
import tempfile
import time

import pyspark.sql.functions as F
import pytest

from demv_spark.operators.corpus import dsir_bucket_census, dsir_weights
from demv_spark.streaming.dsir_stream import (
    dsir_log_replay,
    dsir_state_weights,
    resolve_dsir_log,
    streaming_dsir_maintainer,
)

RAW = "t_dsir_raw"
TGT = "t_dsir_tgt"


@pytest.fixture()
def didx(spark):
    from tests.conftest import drop_table_and_dir

    for p in (RAW, TGT):
        for s in ("_census", "__meta"):
            drop_table_and_dir(spark, f"{p}{s}")
    yield (RAW, TGT)
    for p in (RAW, TGT):
        for s in ("_census", "__meta"):
            drop_table_and_dir(spark, f"{p}{s}")


def test_dsir_replay_equals_one_shot_census(spark):
    """Summed per-batch censuses equal the one-shot corpus census for
    any partitioning of the corpus into batches."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = sorted(map(tuple, dsir_bucket_census(
        docs, n_buckets=256, seed=7).collect()))
    batches = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]
    got = resolve_dsir_log(
        dsir_log_replay(batches, n_buckets=256, seed=7))
    assert sorted(map(tuple, got.collect())) == want


def test_dsir_replay_crash_duplicates_harmless(spark):
    """Re-appending a batch's census rows (the crash-window replay)
    cannot change the derived census: duplicates within a
    (batch_id, bucket) cell are byte-identical singletons collapsed
    by MAX before the cross-batch SUM."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batches = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    log = dsir_log_replay(batches, n_buckets=256, seed=7)
    crashed = log.unionByName(log.filter(F.col("batch_id") == 1))
    a = sorted(map(tuple, resolve_dsir_log(log).collect()))
    b = sorted(map(tuple, resolve_dsir_log(crashed).collect()))
    assert a == b


def test_dsir_stream_weights_equal_one_shot(spark, didx):
    """Weights scored against MAINTAINED censuses (two live streams:
    raw + target) equal one-shot dsir_weights over the same data."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.lower("source").isin("src1", "src3"))
    want = sorted(map(tuple, dsir_weights(
        docs, target, n_buckets=256, seed=7).collect()))

    d1 = tempfile.mkdtemp(prefix="demv_dsir_raw_")
    d2 = tempfile.mkdtemp(prefix="demv_dsir_tgt_")
    try:
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append").parquet(d1)
            target.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append").parquet(d2)
            time.sleep(1.1)
        for path, prefix in ((d1, RAW), (d2, TGT)):
            schema = spark.read.parquet(path).schema
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(path)
            )
            q = streaming_dsir_maintainer(
                stream, prefix, n_buckets=256, seed=7)
            q.awaitTermination(120)
        got = dsir_state_weights(
            spark, RAW, TGT, docs, n_buckets=256, seed=7)
        assert sorted(map(tuple, got.collect())) == want
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_dsir_log_resolve_reads_bucketed_without_exchange(spark, didx):
    """VERDICT r11 item 7: the census log is bucketed on `bucket`, so
    BOTH resolve groupBys — (batch_id, bucket), a superset of the
    spec, then (bucket) exactly — read the whole stream-lifetime log
    with no exchange."""
    import re

    from demv_spark.plans.introspect import explain_str
    from demv_spark.streaming.dsir_stream import resolve_dsir_log

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = tempfile.mkdtemp(prefix="demv_dsirbuck_")
    try:
        for i in range(2):
            docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
                "append").parquet(d)
            time.sleep(1.1)
        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = streaming_dsir_maintainer(stream, RAW, n_buckets=256, seed=7)
        q.awaitTermination(120)
        spark.catalog.refreshTable(f"{RAW}_census")
        resolved = resolve_dsir_log(spark.table(f"{RAW}_census"))
        plan = explain_str(resolved, "simple")
        assert "Bucketed: true" in plan, plan
        assert not re.search(r"Exchange hashpartitioning", plan), plan
    finally:
        shutil.rmtree(d, ignore_errors=True)
