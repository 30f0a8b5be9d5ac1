"""Bucketed-layout contract: the co-located join of two tables
bucketed on the same key plans with ZERO Exchange — asserted on the
physical plan, not just output equality."""

import pyspark.sql.functions as F
import pytest

from demv_spark.plans.introspect import plan_stats
from demv_spark.sources.bucketing import bucket_spec, colocated_join, write_bucketed

T_DOCS = "t_bkt_docs"
T_SCORES = "t_bkt_scores"


@pytest.fixture()
def bucketed(spark):
    from tests.conftest import drop_table_and_dir

    for t in (T_DOCS, T_SCORES):
        drop_table_and_dir(spark, t)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scores = docs.select("doc_id", (F.col("n_chars") % 97).alias("score"))
    write_bucketed(docs, T_DOCS, ["doc_id"], 8, sort_cols=["doc_id"])
    write_bucketed(scores, T_SCORES, ["doc_id"], 8, sort_cols=["doc_id"])
    yield
    for t in (T_DOCS, T_SCORES):
        drop_table_and_dir(spark, t)


def test_bucket_spec_roundtrip(spark, bucketed):
    spec = bucket_spec(spark, T_DOCS)
    assert spec == {
        "num_buckets": 8,
        "bucket_cols": ["doc_id"],
        "sort_cols": ["doc_id"],
    }
    # an unbucketed table reports None
    plain = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    plain.write.mode("overwrite").saveAsTable("t_bkt_plain")
    try:
        assert bucket_spec(spark, "t_bkt_plain") is None
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_plain")


def test_colocated_join_has_no_exchange(spark, bucketed):
    # force the sort-merge path (a broadcast would also skip the
    # shuffle and mask what we're asserting)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, T_DOCS, T_SCORES, ["doc_id"])
        stats = plan_stats(joined)
        assert stats["n_exchanges"] == 0, stats
        assert stats["n_sort_merge_joins"] == 1, stats
        # correctness alongside the plan shape
        n_docs = spark.table(T_DOCS).count()
        assert joined.count() == n_docs
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_colocated_groupby_has_no_exchange(spark, bucketed):
    agg = spark.table(T_DOCS).groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
    assert plan_stats(agg)["n_exchanges"] == 0


def test_mismatched_layout_rejected(spark, bucketed):
    other = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang"
    )
    write_bucketed(other, "t_bkt_mismatch", ["doc_id"], 4)
    try:
        with pytest.raises(ValueError, match="bucket counts differ"):
            colocated_join(spark, T_DOCS, "t_bkt_mismatch", ["doc_id"])
        with pytest.raises(ValueError, match="not bucketed|bucketed by"):
            colocated_join(spark, T_DOCS, T_SCORES, ["lang"])
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_mismatch")
