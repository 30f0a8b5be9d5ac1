"""Streaming semantic admission: first-wins whitened-cosine verdicts
across micro-batches, stream ≡ replay symmetry, and replay
idempotence (the dedup_stream test model applied to the SemDeDup
online twin)."""

import shutil
import tempfile
import time

import numpy as np
import pyspark.sql.functions as F
import pytest

from demv_spark.operators.similarity import (
    centroid_refs,
    semantic_admission,
    whitening_inverse,
)
from demv_spark.streaming.semantic_stream import (
    semantic_accepted,
    semantic_log_replay,
    streaming_semantic_maintainer,
)

PREFIX = "t_semstream"


def _drop_index(spark, prefix=PREFIX):
    from tests.conftest import drop_table_and_dir

    for suffix in ("_verdicts", "__meta"):
        drop_table_and_dir(spark, f"{prefix}{suffix}")


@pytest.fixture()
def index(spark):
    _drop_index(spark)
    yield PREFIX
    _drop_index(spark)


def _vec_rows(n=90, d=8, seed=13):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d)) * rng.uniform(0.5, 2.0, size=d)
    return [(int(i), [float(x) for x in base[i]]) for i in range(n)]


def _geometry(spark, rows, d=8, k=3):
    ref = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mu, minv, _ = whitening_inverse(ref, dim=d)
    cents = centroid_refs(ref, mu, minv, n_clusters=k, dim=d)
    return mu, minv, cents


def _copy(rows, src_id, new_id, scale=1.001):
    (vec,) = [v for i, v in rows if i == src_id]
    f32 = np.array(vec, dtype=np.float32)
    return (new_id, [float(np.float32(float(x) * scale)) for x in f32])


def test_replay_first_wins_across_and_within_batches(spark):
    rows = _vec_rows()
    mu, minv, cents = _geometry(spark, rows)
    b0 = spark.createDataFrame(rows[:30], "vec_id long, embedding array<float>")
    # batch 1: fresh rows + a copy of an ACCEPTED b0 row (dup_store) +
    # two copies of the same b1 row (chain: second is dup_batch)
    extra = [
        _copy(rows, 5, 1005),
        _copy(rows, 40, 1040),
        _copy(rows, 40, 1041),
    ]
    b1 = spark.createDataFrame(
        rows[30:60] + extra, "vec_id long, embedding array<float>"
    )
    log = semantic_log_replay([b0, b1], mu, minv, cents, tau=0.99, dim=8)
    v = {r.vec_id: r for r in log.collect()}
    assert v[1005].verdict == "dup_store" and v[1005].dup_of == 5
    assert v[1040].verdict == "dup_batch" and v[1040].dup_of == 40
    assert v[1041].verdict == "dup_batch" and v[1041].dup_of == 40
    assert v[40].verdict == "admitted"
    # every original is admitted exactly once
    admitted = [r for r in v.values() if r.verdict == "admitted"]
    assert len(admitted) == 60


def test_copy_before_original_first_wins(spark):
    rows = _vec_rows(seed=29)
    mu, minv, cents = _geometry(spark, rows)
    # the COPY arrives in batch 0; the original in batch 1 loses
    b0 = spark.createDataFrame(
        rows[:20] + [_copy(rows, 50, 2050)],
        "vec_id long, embedding array<float>",
    )
    b1 = spark.createDataFrame(rows[40:60], "vec_id long, embedding array<float>")
    log = semantic_log_replay([b0, b1], mu, minv, cents, tau=0.99, dim=8)
    v = {r.vec_id: r for r in log.collect()}
    assert v[2050].verdict == "admitted"
    assert v[50].verdict == "dup_store" and v[50].dup_of == 2050


def test_single_batch_equals_batch_rule(spark):
    """A one-batch replay must equal the pure batch rule: reject every
    vector pairing (>= tau, same cluster) with a smaller id."""
    rows = _vec_rows(seed=7)
    mu, minv, cents = _geometry(spark, rows)
    dup = [_copy(rows, i, 3000 + i) for i in (2, 9, 17)]
    b = spark.createDataFrame(rows + dup, "vec_id long, embedding array<float>")
    log = semantic_log_replay([b], mu, minv, cents, tau=0.99, dim=8)
    v = {r.vec_id: r for r in log.collect()}
    for i in (2, 9, 17):
        assert v[3000 + i].verdict == "dup_batch" and v[3000 + i].dup_of == i
    assert all(r.verdict == "admitted" for k, r in v.items() if k < 3000)


def test_stream_equals_replay_and_replay_is_idempotent(spark, index):
    rows = _vec_rows(seed=3)
    mu, minv, cents = _geometry(spark, rows)
    d = tempfile.mkdtemp(prefix="demv_semstream_")
    try:
        b0 = spark.createDataFrame(
            rows[:45] + [_copy(rows, 3, 4003)],
            "vec_id long, embedding array<float>",
        )
        b0.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)  # distinct mtimes → deterministic file order
        b1 = spark.createDataFrame(
            rows[45:] + [_copy(rows, 10, 4010), _copy(rows, 60, 4060)],
            "vec_id long, embedding array<float>",
        )
        b1.coalesce(1).write.mode("append").parquet(d)

        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        q = streaming_semantic_maintainer(
            stream, index, mu, minv, cents, tau=0.99, dim=8
        )
        q.awaitTermination(120)

        got = sorted(
            map(
                tuple,
                spark.table(f"{index}_verdicts")
                .select("vec_id", "batch_id", "cluster", "verdict", "dup_of")
                .collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                semantic_log_replay([b0, b1], mu, minv, cents, tau=0.99, dim=8)
                .select("vec_id", "batch_id", "cluster", "verdict", "dup_of")
                .collect(),
            )
        )
        assert got == want
        # accepted store matches the replay's admitted set
        acc = {r.vec_id for r in semantic_accepted(spark, index).collect()}
        assert acc == {t[0] for t in want if t[3] == "admitted"}

        # replaying the same files appends nothing (high-water mark)
        n_before = spark.table(f"{index}_verdicts").count()
        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        q2 = streaming_semantic_maintainer(
            stream2, index, mu, minv, cents, tau=0.99, dim=8
        )
        q2.awaitTermination(120)
        assert spark.table(f"{index}_verdicts").count() == n_before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_store_read_prunes_to_batch_clusters(spark, index):
    """The verdicts table is cluster-partitioned and a batch's store
    read carries the cluster IN-list, so the scan's PartitionFilters
    prune to exactly the batch's clusters — the 100 TB contract that
    a micro-batch reads only the history it can match (round-10
    VERDICT item 5)."""
    import re

    from demv_spark.plans.introspect import explain_str

    rows = _vec_rows(seed=3)
    mu, minv, cents = _geometry(spark, rows)
    d = tempfile.mkdtemp(prefix="demv_semprune_")
    try:
        b0 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        b0.coalesce(1).write.mode("append").parquet(d)
        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        q = streaming_semantic_maintainer(
            stream, index, mu, minv, cents, tau=0.99, dim=8
        )
        q.awaitTermination(120)
        tbl = spark.table(f"{index}_verdicts")
        # partitioned by cluster on disk
        assert [
            f.name
            for f in spark.catalog.listColumns(f"{index}_verdicts")
            if f.isPartition
        ] == ["cluster"]
        # the maintainer's store-read shape: the IN-list lands in the
        # scan's PartitionFilters, not a post-scan Filter
        pruned = tbl.filter(
            (F.col("verdict") == "admitted")
            & (F.col("batch_id") < F.lit(1))
            & F.col("cluster").isin([1])
        ).select("vec_id", "cluster", "u", "qaa")
        plan = explain_str(pruned, "formatted")
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "cluster" in m.group(1), plan
        # and it actually returns only that cluster's rows
        assert {r.cluster for r in pruned.collect()} <= {1}
    finally:
        shutil.rmtree(d, ignore_errors=True)
