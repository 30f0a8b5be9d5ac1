"""applyInPandasWithState drift monitor: state must accumulate across
micro-batches (maxFilesPerTrigger=1 forces multiple batches)."""

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from demv_spark.sources.readers import read_table
from demv_spark.streaming.stateful import running_drift_monitor

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def multi_file_events(spark):
    d = tempfile.mkdtemp(prefix="demv_stateful_")
    ev = read_table(spark, SF, "events").select("event_type", "value")
    ev.repartition(4).write.mode("overwrite").parquet(d)  # ≥4 files → ≥4 micro-batches
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_state_accumulates_across_batches(spark, multi_file_events):
    schema = spark.read.parquet(multi_file_events).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_file_events)
    )
    out = running_drift_monitor(stream, "event_type", "value", target_mean=100.0)
    q = (
        out.writeStream.format("memory")
        .queryName("drift_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM drift_sink").collect()
    assert len(rows) > 5  # one row per key per micro-batch

    # final cumulative n per key == total rows per key in the input
    batch = spark.read.parquet(multi_file_events)
    expected = {r["event_type"]: r["count"] for r in batch.groupBy("event_type").count().collect()}
    final = {}
    for r in rows:  # last emitted row per key carries the final state
        final[r["key"]] = max(final.get(r["key"], 0), r["n"])
    assert final == expected

    # cumulative mean matches the batch mean
    means = {r["event_type"]: r["m"] for r in batch.groupBy("event_type").agg(F.avg("value").alias("m")).collect()}
    last = {r["key"]: r["mean"] for r in sorted(rows, key=lambda x: x["n"])}
    for k, m in means.items():
        assert last[k] == pytest.approx(m, rel=1e-9)


def test_batch_twin_same_schema(spark, multi_file_events):
    batch = spark.read.parquet(multi_file_events)
    out = running_drift_monitor(batch, "event_type", "value", target_mean=100.0)
    rows = out.collect()
    assert {r["key"] for r in rows} == {
        r["event_type"] for r in batch.select("event_type").distinct().collect()
    }
    total = sum(r["n"] for r in rows)
    assert total == batch.count()


def test_drift_flag_fires(spark):
    df = spark.createDataFrame([("a", 500.0)] * 10 + [("b", 100.0)] * 10, ["k", "v"])
    out = running_drift_monitor(df, "k", "v", target_mean=100.0, slack=1.0, threshold=10.0)
    got = {r["key"]: r["drift"] for r in out.collect()}
    assert got["a"] == 1 and got["b"] == 0


# ---- streaming_quota_admission ----


@pytest.fixture(scope="module")
def multi_file_docs(spark):
    d = tempfile.mkdtemp(prefix="demv_quota_")
    docs = read_table(spark, SF, "documents").select(
        "doc_id", F.col("source").alias("key_src")
    )
    docs.repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_quota_admits_cap_per_key(spark, multi_file_docs):
    from demv_spark.streaming.stateful import streaming_quota_admission

    schema = spark.read.parquet(multi_file_docs).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_file_docs)
    )
    out = streaming_quota_admission(stream, "key_src", "doc_id", cap=7)
    q = (
        out.writeStream.format("memory")
        .queryName("quota_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM quota_sink").collect()

    batch = spark.read.parquet(multi_file_docs)
    n_per_key = {r["key_src"]: r["count"] for r in batch.groupBy("key_src").count().collect()}
    # every input row got a verdict
    assert len(rows) == sum(n_per_key.values())
    adm = {}
    for r in rows:
        adm[r["key"]] = adm.get(r["key"], 0) + r["admitted"]
    # exactly min(cap, n) admitted per key, cumulative across batches
    assert adm == {k: min(7, n) for k, n in n_per_key.items()}


def test_quota_batch_twin_matches_single_batch_stream_semantics(spark, multi_file_docs):
    from demv_spark.streaming.stateful import streaming_quota_admission

    batch = spark.read.parquet(multi_file_docs)
    out = streaming_quota_admission(batch, "key_src", "doc_id", cap=7)
    got = {(r["key"], r["id"]): r["admitted"] for r in out.collect()}
    # pure-id order: the 7 smallest doc_ids of each key admit
    import collections
    ids = collections.defaultdict(list)
    for r in batch.collect():
        ids[r["key_src"]].append(r["doc_id"])
    for k, v in ids.items():
        keep = set(sorted(v)[:7])
        for i in v:
            assert got[(k, i)] == (1 if i in keep else 0)


def test_map_only_curation_ops_work_on_streams(spark, multi_file_docs):
    """split_by_hash + canonicalize_url are stateless column algebra,
    so the SAME call works under readStream — stream output must equal
    the batch run row-for-row."""
    from demv_spark.operators import web
    from demv_spark.operators.corpus import split_by_hash

    schema = spark.read.parquet(multi_file_docs).schema

    def curate(df):
        d = df.withColumn(
            "url",
            F.concat(F.lit("HTTP://"), F.col("key_src"), F.lit(".X.com:80/p/"),
                     F.col("doc_id").cast("string"), F.lit("?utm_source=s")),
        )
        return split_by_hash(d, ["key_src"], {"train": 0.9, "test": 0.1}).select(
            "doc_id", web.canonicalize_url("url", "canon"), "split"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_file_docs)
    )
    q = (
        curate(stream).writeStream.format("memory")
        .queryName("curate_sink").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        r["doc_id"]: (r["canon"], r["split"])
        for r in spark.sql("SELECT * FROM curate_sink").collect()
    }
    want = {
        r["doc_id"]: (r["canon"], r["split"])
        for r in curate(spark.read.parquet(multi_file_docs)).collect()
    }
    assert got == want


# ---- composed streaming curation (ingest.streaming_curate) ----


def test_streaming_curate_e2e_equals_batch(spark, multi_file_docs):
    """The COMPOSED curation DAG (blocklist -> quality -> quota) must
    emit identical verdicts under incremental streaming (one file per
    micro-batch) and as one batch: the map-only steps are pure row
    functions and the quota is append-only cumulative."""
    from demv_spark.streaming.ingest import streaming_curate

    schema = spark.read.parquet(multi_file_docs).schema

    def curate(df):
        d = df.withColumn(
            "url",
            F.concat(F.lit("https://"), F.col("key_src"), F.lit(".site"),
                     (F.col("doc_id") % 5).cast("string"), F.lit(".com/d/"),
                     F.col("doc_id").cast("string")),
        ).withColumn(
            "text",
            F.concat(F.lit("sample document text body number "),
                     F.col("doc_id").cast("string")),
        )
        return streaming_curate(
            d, "url", "text", "doc_id", cap_per_domain=5,
            blocklist=["site0.com"], min_quality=0.1,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi_file_docs)
    )
    q = (
        curate(stream).writeStream.format("memory")
        .queryName("curate_e2e_sink").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["key"], r["id"]): r["admitted"]
        for r in spark.sql("SELECT * FROM curate_e2e_sink").collect()
    }
    batch_rows = curate(spark.read.parquet(multi_file_docs)).collect()
    want_keys = {(r["key"], r["id"]) for r in batch_rows}

    # identical survivor set (blocked domains and low-quality rows
    # never reach the quota on either side)
    assert set(got) == want_keys and len(got) > 0
    assert all("site0.com" not in k for k, _ in got)
    # identical per-key admission TOTALS (streaming admits in arrival
    # order, batch in pure-id order — the quota semantics guarantee
    # the same count per key even when the admitted ids differ)
    import collections
    g_tot, b_tot = collections.Counter(), collections.Counter()
    for (k, _), a in got.items():
        g_tot[k] += a
    for r in batch_rows:
        b_tot[r["key"]] += r["admitted"]
    assert g_tot == b_tot
