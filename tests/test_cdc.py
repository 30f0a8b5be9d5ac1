"""CDC changelog compaction: latest-wins snapshot + SCD2 history."""

import pyspark.sql.functions as F
import pytest

from demv_spark.operators.cdc import cdc_snapshot, scd2_history
from demv_spark.plans.introspect import plan_stats


@pytest.fixture(scope="module")
def log(spark):
    # key 1: insert -> update -> update       (live, v3 wins)
    # key 2: insert -> delete                 (gone)
    # key 3: insert -> delete -> insert       (resurrected, v3 wins)
    # key 4: insert only                      (live)
    rows = [
        (1, 10, "insert", "a1"), (1, 20, "update", "a2"), (1, 30, "update", "a3"),
        (2, 10, "insert", "b1"), (2, 25, "delete", "b1"),
        (3, 10, "insert", "c1"), (3, 20, "delete", "c1"), (3, 30, "insert", "c2"),
        (4, 15, "insert", "d1"),
    ]
    return spark.createDataFrame(rows, "k long, ts long, op string, v string")


def test_snapshot_latest_wins_and_delete_drops(log):
    got = {r["k"]: (r["v"], r["ts"]) for r in
           cdc_snapshot(log, ["k"], "ts").collect()}
    assert got == {1: ("a3", 30), 3: ("c2", 30), 4: ("d1", 15)}


def test_snapshot_seq_breaks_ts_ties(spark):
    rows = [(1, 10, 1, "insert", "x"), (1, 10, 2, "update", "y")]
    log = spark.createDataFrame(rows, "k long, ts long, seq long, op string, v string")
    got = cdc_snapshot(log, ["k"], "ts", seq_col="seq").collect()
    assert len(got) == 1 and got[0]["v"] == "y"


def test_scd2_intervals(log):
    got = {
        (r["k"], r["valid_from"]): (r["valid_to"], r["is_current"], r["v"])
        for r in scd2_history(log, ["k"], "ts").collect()
    }
    assert got[(1, 10)] == (20, False, "a1")
    assert got[(1, 20)] == (30, False, "a2")
    assert got[(1, 30)] == (None, True, "a3")
    # delete closes key 2's interval but emits no row itself
    assert got[(2, 10)] == (25, False, "b1")
    assert (2, 25) not in got
    # resurrection: c1 closed by the delete, c2 open
    assert got[(3, 10)] == (20, False, "c1")
    assert got[(3, 30)] == (None, True, "c2")
    assert got[(4, 15)] == (None, True, "d1")


def test_scd2_current_equals_snapshot(log):
    snap = {(r["k"], r["v"]) for r in cdc_snapshot(log, ["k"], "ts").collect()}
    cur = {(r["k"], r["v"]) for r in
           scd2_history(log, ["k"], "ts").filter("is_current").collect()}
    assert snap == cur


def test_one_shuffle_no_python_udf(log):
    s = plan_stats(cdc_snapshot(log, ["k"], "ts"))
    assert not s["has_python_udf"]
    s2 = plan_stats(scd2_history(log, ["k"], "ts"))
    assert not s2["has_python_udf"]


def test_deterministic_under_repartition(log):
    a = sorted(map(tuple, cdc_snapshot(log, ["k"], "ts").collect()))
    b = sorted(map(tuple, cdc_snapshot(log.repartition(7), ["k"], "ts").collect()))
    assert a == b


CDC_PREFIX = "t_cdcstream"


@pytest.fixture()
def cdc_index(spark):
    from tests.conftest import drop_table_and_dir

    for s in ("_log", "__meta"):
        drop_table_and_dir(spark, f"{CDC_PREFIX}{s}")
    yield CDC_PREFIX
    for s in ("_log", "__meta"):
        drop_table_and_dir(spark, f"{CDC_PREFIX}{s}")


def test_streaming_cdc_state_equals_batch_snapshot(spark, cdc_index):
    import shutil
    import tempfile
    import time

    from demv_spark.streaming.cdc_stream import cdc_state, streaming_cdc_maintainer

    d = tempfile.mkdtemp(prefix="demv_cdcstream_")
    try:
        b1 = spark.createDataFrame(
            [(1, 10, "insert", "a1"), (2, 10, "insert", "b1"), (1, 20, "update", "a2")],
            "k long, ts long, op string, v string",
        )
        b1.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)
        b2 = spark.createDataFrame(
            [(2, 25, "delete", "b1"), (3, 30, "insert", "c1"), (1, 30, "update", "a3")],
            "k long, ts long, op string, v string",
        )
        b2.coalesce(1).write.mode("append").parquet(d)

        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = streaming_cdc_maintainer(stream, cdc_index)
        q.awaitTermination(120)

        got = {r["k"]: r["v"] for r in cdc_state(spark, cdc_index, ["k"], "ts").collect()}
        assert got == {1: "a3", 3: "c1"}          # 2 deleted

        whole = b1.unionByName(b2)
        want = {r["k"]: r["v"] for r in cdc_snapshot(whole, ["k"], "ts").collect()}
        assert got == want

        # crash replay: drop the mark, rerun the whole feed — log rows
        # duplicate exactly, derived state unchanged
        n_log = spark.table(f"{cdc_index}_log").count()
        spark.sql(f"DROP TABLE {cdc_index}__meta")
        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q2 = streaming_cdc_maintainer(stream2, cdc_index)
        q2.awaitTermination(120)
        spark.catalog.refreshTable(f"{cdc_index}_log")
        assert spark.table(f"{cdc_index}_log").count() == 2 * n_log
        got2 = {r["k"]: r["v"] for r in cdc_state(spark, cdc_index, ["k"], "ts").collect()}
        assert got2 == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cdc_log_replay_batch_boundaries_invisible(spark):
    """cdc_snapshot over the replayed tagged log equals the snapshot
    over the raw changelog for ANY batch split, and each surviving
    row carries the batch_id it arrived in."""
    from demv_spark.operators.cdc import cdc_snapshot
    from demv_spark.streaming.cdc_stream import cdc_log_replay

    rows = [
        ("a", 1, 10, "insert", 1.0),
        ("a", 2, 11, "update", 2.0),
        ("b", 1, 12, "insert", 3.0),
        ("b", 3, 13, "delete", 0.0),
        ("c", 1, 14, "insert", 4.0),
        ("c", 2, 15, "update", 5.0),
        ("c", 2, 16, "update", 6.0),   # seq tie-break on event_id
    ]
    log = spark.createDataFrame(
        rows, "k string, ts long, event_id long, op string, v double"
    )
    want = sorted(
        map(tuple, cdc_snapshot(log, ["k"], "ts", seq_col="event_id").collect())
    )
    for split in (2, 3):
        batches = [log.filter(F.col("event_id") % split == i) for i in range(split)]
        replayed = cdc_log_replay(batches)
        snap = cdc_snapshot(replayed, ["k"], "ts", seq_col="event_id")
        got = sorted(map(tuple, snap.drop("batch_id").collect()))
        assert got == want
        # provenance: the surviving row's tag is its arrival batch
        for r in snap.collect():
            assert r["batch_id"] == r["event_id"] % split
    import pytest as _pytest
    with _pytest.raises(ValueError, match="empty batch list"):
        cdc_log_replay([])
