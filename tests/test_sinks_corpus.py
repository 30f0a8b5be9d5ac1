"""Corpus writer / compaction / manifest: small-file control, lossless
round-trip, and layout census."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from demv_spark.sources import sinks

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".sink_scratch")


@pytest.fixture()
def scratch():
    os.makedirs(SCRATCH, exist_ok=True)
    d = os.path.join(SCRATCH, "t")
    shutil.rmtree(d, ignore_errors=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_write_corpus_controls_file_count(spark, docs, scratch):
    n = docs.count()
    target = 2000
    sinks.write_corpus(
        docs, scratch, ["source"], target_rows_per_file=target,
        sort_cols=["doc_id"],
    )
    stats = sinks.dataset_file_stats(spark, scratch)
    n_parts = docs.select("source").distinct().count()
    # file count tracks data volume: at least ceil(n/target), and not
    # the tasks×partitions explosion (bounded by tasks + partitions)
    import math
    n_tasks = math.ceil(n / target)
    assert stats["n_files"] >= n_tasks
    assert stats["n_files"] <= n_tasks + n_parts + 2
    assert stats["total_bytes"] > 0


def test_write_corpus_roundtrip_lossless(spark, docs, scratch):
    sinks.write_corpus(
        docs, scratch, ["source"], target_rows_per_file=3000,
        sort_cols=["doc_id"],
    )
    back = spark.read.parquet(scratch)
    assert sorted(back.columns) == sorted(docs.columns)
    a = {r["doc_id"]: r["n_chars"] for r in back.select("doc_id", "n_chars").collect()}
    b = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    assert a == b


def test_manifest_matches_source_aggregate(spark, docs, scratch):
    sinks.write_corpus(docs, scratch, ["source"], target_rows_per_file=5000)
    man = {
        r["source"]: (r["n_rows"], r["units"])
        for r in sinks.corpus_manifest(
            spark, scratch, ["source"], unit_col="n_chars"
        ).collect()
    }
    src = {
        r["source"]: (r["n"], r["u"])
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("u"))
        .collect()
    }
    assert man == src


def test_compact_dataset_shrinks_file_count(spark, docs, scratch):
    frag = scratch + "_frag"
    try:
        # fragment: tiny target produces many small files (documents
        # at sf0.01 is 500 rows → 25 range tasks)
        sinks.write_corpus(docs, frag, ["source"], target_rows_per_file=20)
        before = sinks.dataset_file_stats(spark, frag)
        assert before["n_files"] > 20
        r = sinks.compact_dataset(
            spark, frag, scratch, ["source"], target_rows_per_file=100_000
        )
        # floor = one file per partition value (hive layout cannot go
        # below that); compaction must reach it
        n_parts = docs.select("source").distinct().count()
        assert r["after"]["n_files"] == n_parts
        assert r["after"]["n_files"] < before["n_files"]
        # content preserved
        assert spark.read.parquet(scratch).count() == docs.count()
    finally:
        shutil.rmtree(frag, ignore_errors=True)


def test_write_corpus_plan_single_range_exchange(spark, docs):
    """The pre-write DataFrame must be exactly one range exchange +
    in-partition sort over the scan — no second shuffle, no Python."""
    from demv_spark.plans.introspect import plan_stats

    shaped = docs.repartitionByRange(4, "source", "doc_id").sortWithinPartitions(
        "source", "doc_id"
    )
    s = plan_stats(shaped)
    assert s["n_exchanges"] == 1
    assert not s["has_python_udf"] and not s["has_arrow_eval"]


def test_write_corpus_known_count_skips_count_pass(spark, docs, scratch):
    """total_rows short-circuits the count() scan; layout matches the
    counted path."""
    n = docs.count()
    sinks.write_corpus(
        docs, scratch, ["source"], target_rows_per_file=3000,
        sort_cols=["doc_id"], total_rows=n,
    )
    back = spark.read.parquet(scratch)
    assert back.count() == n


def test_write_corpus_empty_input_contract(spark, docs, scratch):
    """Empty write succeeds (marker only); manifest on it raises the
    documented schema error."""
    empty = docs.filter(F.lit(False))
    sinks.write_corpus(empty, scratch, ["source"], target_rows_per_file=100)
    stats = sinks.dataset_file_stats(spark, scratch)
    assert stats["n_files"] == 0
    with pytest.raises(Exception):
        sinks.corpus_manifest(spark, scratch, ["source"]).collect()


def test_write_corpus_rejects_null_or_empty_partition_values(spark, docs, scratch):
    """Review r5: NULL and '' both land in __HIVE_DEFAULT_PARTITION__
    and conflate on readback — reject them up front."""
    bad = docs.withColumn(
        "source", F.when(F.col("doc_id") % 50 == 0, None).otherwise(F.col("source"))
    )
    with pytest.raises(ValueError, match="HIVE_DEFAULT_PARTITION"):
        sinks.write_corpus(bad, scratch, ["source"], target_rows_per_file=1000)
    empt = docs.withColumn(
        "source", F.when(F.col("doc_id") % 50 == 0, "").otherwise(F.col("source"))
    )
    with pytest.raises(ValueError, match="HIVE_DEFAULT_PARTITION"):
        sinks.write_corpus(empt, scratch, ["source"], target_rows_per_file=1000)
    # opting out of validation (pre-cleaned pipeline) skips the scan
    sinks.write_corpus(
        docs, scratch, ["source"], target_rows_per_file=5000,
        total_rows=500, validate_partitions=False,
    )


def test_compact_dataset_rejects_nested_or_equal_paths(spark, scratch):
    with pytest.raises(ValueError, match="disjoint"):
        sinks.compact_dataset(spark, scratch, scratch)
    with pytest.raises(ValueError, match="disjoint"):
        sinks.compact_dataset(spark, scratch, os.path.join(scratch, "sub"))
    with pytest.raises(ValueError, match="disjoint"):
        sinks.compact_dataset(spark, os.path.join(scratch, "sub"), scratch)


def test_compact_dataset_guard_handles_uri_schemes(spark, scratch):
    """ADVICE r5: the disjointness guard must not mangle Hadoop URIs
    with os.path.abspath (which prepends cwd to 's3a://...') and must
    catch scheme-alias spellings (s3 vs s3a vs s3n) of one bucket."""
    with pytest.raises(ValueError, match="disjoint"):
        sinks.compact_dataset(spark, "s3a://bucket/corpus", "s3://bucket/corpus/v2")
    with pytest.raises(ValueError, match="disjoint"):
        sinks.compact_dataset(spark, "s3n://bucket/corpus/", "s3a://bucket/corpus")
    # qualified local path == its file:// spelling
    with pytest.raises(ValueError, match="disjoint"):
        sinks.compact_dataset(spark, scratch, "file://" + scratch)
    # genuinely different buckets pass the guard (and then fail on the
    # read, which is fine — we only assert the guard doesn't misfire)
    assert sinks._qualified_uri(spark, "s3a://bkt-a/x") != sinks._qualified_uri(
        spark, "s3a://bkt-b/x"
    )


def test_bucket_index_backtick_column(spark):
    """ADVICE r5: a backtick in the timestamp column name must not
    break (or escape) the bucket expression."""
    from demv_spark.operators.temporal import bucket_index

    df = spark.createDataFrame(
        [("2020-01-01 00:30:00",), ("1969-12-31 23:00:00",)], ["ts`x"]
    )
    got = [r["b"] for r in df.select(bucket_index("ts`x", "1 hour").alias("b")).collect()]
    assert got == [438288, -1]


def test_null_safe_broadcast_join_rejects_empty_keys(spark):
    """ADVICE r5: empty keys+eq_cols would silently cross-join."""
    from demv_spark.functions.compat import null_safe_broadcast_join

    df = spark.range(3)
    with pytest.raises(ValueError, match="cross join"):
        null_safe_broadcast_join(df, df, [], ())
