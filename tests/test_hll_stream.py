"""Streaming HLL maintenance: stream ≡ batch ≡ replay, crash-replay
idempotence by register algebra."""

import shutil
import tempfile
import time

import pyspark.sql.functions as F
import pytest

from demv_spark.functions.sketches import hll_estimate, hll_registers
from demv_spark.streaming.hll_stream import (
    hll_log_replay,
    hll_state,
    resolve_hll_log,
    streaming_hll_maintainer,
)

PREFIX = "t_hllstream"


@pytest.fixture()
def hidx(spark):
    from tests.conftest import drop_table_and_dir

    for s in ("_registers", "__meta"):
        drop_table_and_dir(spark, f"{PREFIX}{s}")
    yield PREFIX
    for s in ("_registers", "__meta"):
        drop_table_and_dir(spark, f"{PREFIX}{s}")


def test_hll_stream_equals_batch_and_replay(spark, hidx):
    """Registers derived from the streamed log equal the one-shot
    batch sketch AND the batch replay, for any micro-batch split —
    the MAX merge is associative/idempotent, so batch boundaries and
    replays are invisible by algebra."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = sorted(map(tuple, hll_registers(
        ev, "user_id", group_cols=["event_type"], p=6).collect()))

    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    replay = resolve_hll_log(
        hll_log_replay(batches, "user_id", group_cols=["event_type"], p=6),
        group_cols=["event_type"],
    )
    assert sorted(map(tuple, replay.collect())) == want

    d = tempfile.mkdtemp(prefix="demv_hllstream_")
    try:
        for i in range(3):
            batches[i].coalesce(1).write.mode("append").parquet(d)
            time.sleep(1.1)
        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = streaming_hll_maintainer(
            stream, hidx, "user_id", group_cols=["event_type"], p=6)
        q.awaitTermination(120)
        got = hll_state(spark, hidx, group_cols=["event_type"], p=6)
        want_est = sorted(map(tuple, hll_estimate(
            hll_registers(ev, "user_id", group_cols=["event_type"], p=6),
            group_cols=["event_type"], p=6).collect()))
        assert sorted(map(tuple, got.collect())) == want_est
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hll_replay_crash_duplicates_harmless(spark):
    """Re-appending a batch's registers (the crash-window replay)
    cannot change the derived state: MAX is idempotent."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batches = [ev.filter(F.col("event_id") % 2 == i) for i in range(2)]
    log = hll_log_replay(batches, "user_id", group_cols=["event_type"], p=6)
    crashed = log.unionByName(log.filter(F.col("batch_id") == 1))
    a = sorted(map(tuple, resolve_hll_log(log, ["event_type"]).collect()))
    b = sorted(map(tuple, resolve_hll_log(crashed, ["event_type"]).collect()))
    assert a == b
    with pytest.raises(ValueError, match="empty batch list"):
        hll_log_replay([], "user_id")


def test_hll_log_resolve_reads_bucketed_without_exchange(spark, hidx):
    """VERDICT r11 item 7: the register log is bucketed on the group
    keys, so resolve_hll_log's re-max (grouping on a SUPERSET of the
    bucket spec) reads the whole stream-lifetime log with no
    exchange — merge-on-read never re-shuffles history."""
    import re

    from demv_spark.plans.introspect import explain_str

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = tempfile.mkdtemp(prefix="demv_hllbuck_")
    try:
        for i in range(2):
            ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
                "append").parquet(d)
            time.sleep(1.1)
        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = streaming_hll_maintainer(
            stream, hidx, "user_id", group_cols=["event_type"], p=6)
        q.awaitTermination(120)
        spark.catalog.refreshTable(f"{hidx}_registers")
        resolved = resolve_hll_log(
            spark.table(f"{hidx}_registers"), group_cols=["event_type"]
        )
        plan = explain_str(resolved, "simple")
        assert "Bucketed: true" in plan, plan
        assert not re.search(r"Exchange hashpartitioning", plan), plan
    finally:
        shutil.rmtree(d, ignore_errors=True)
