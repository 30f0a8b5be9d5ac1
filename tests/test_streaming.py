"""Streaming monitor tests: run the SAME plan on a file stream
(availableNow trigger) and as a batch query; results must agree —
the batch/stream symmetry contract."""

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from demv_spark.sources.readers import read_table
from demv_spark.streaming import monitor

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    """events table re-written as a streamable parquet dir (ns
    timestamps already normalized to micros by read_table)."""
    d = tempfile.mkdtemp(prefix="demv_stream_")
    read_table(spark, SF, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def test_windowed_census_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir).withColumn(
        "s", (F.col("user_id") % 2).cast("int")
    ).withColumn("y", (F.col("value") > 50).cast("int"))
    expected = {
        tuple(r)
        for r in monitor.windowed_group_census(batch, ["s"], "y", window="6 hours")
        .collect()
    }

    stream = _stream(spark, events_dir).withColumn(
        "s", (F.col("user_id") % 2).cast("int")
    ).withColumn("y", (F.col("value") > 50).cast("int"))
    census = monitor.windowed_group_census(stream, ["s"], "y", window="6 hours")
    q = (
        census.writeStream.format("memory")
        .queryName("census_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM census_sink").collect()}
    # append mode only emits windows CLOSED by the watermark; windows
    # still open at end-of-stream are held back (correct streaming
    # semantics) — everything emitted must match batch, and all
    # watermark-closed windows must have been emitted
    assert got <= expected
    import datetime
    max_end = max(r[1] for r in expected)
    closed = {r for r in expected if r[1] <= max_end - datetime.timedelta(hours=2)}
    assert closed <= got
    assert len(got) > 0


def test_disparity_monitor_end_to_end(spark, events_dir):
    stream = _stream(spark, events_dir).withColumn(
        "s", (F.col("user_id") % 2).cast("int")
    ).withColumn("y", (F.col("value") > 50).cast("int"))
    spark.sql("DROP TABLE IF EXISTS disp_sink")
    # a stale warehouse dir from a previous session also blocks CREATE
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/disp_sink", ignore_errors=True)
    q = monitor.disparity_monitor(stream, ["s"], "y", sink_table="disp_sink", window="12 hours")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM disp_sink").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["w_obs"] > 0
        assert r["disparity"] == pytest.approx(r["w_exp"] / r["w_obs"], rel=1e-12)


def test_event_rate_monitor_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    out = monitor.event_rate_monitor(batch, window="6 hours")
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == batch.count()


def test_session_window_rollup_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    out = monitor.session_window_rollup(batch, gap="30 minutes")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == batch.count()
    assert all(r["session_end"] > r["session_start"] for r in rows)


def test_census_maintainer_incremental_refit(spark, events_dir):
    from demv_spark.functions.counting import group_census
    from demv_spark.operators.balancer import DEMV

    stream = _stream(spark, events_dir).withColumn(
        "s", (F.col("user_id") % 2).cast("int")
    ).withColumn("y", (F.col("value") > 50).cast("int"))
    spark.sql("DROP TABLE IF EXISTS census_sink")
    spark.sql("DROP TABLE IF EXISTS census_sink__meta")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/census_sink", ignore_errors=True)
    shutil.rmtree(f"{warehouse}/census_sink__meta", ignore_errors=True)
    q = monitor.census_maintainer(stream, ["s"], "y", sink_table="census_sink")
    q.awaitTermination(120)

    batch = spark.read.parquet(events_dir).withColumn(
        "s", (F.col("user_id") % 2).cast("int")
    ).withColumn("y", (F.col("value") > 50).cast("int"))
    expected = {(r["s"], r["y"]): r["n"] for r in group_census(batch, ["s", "y"]).collect()}
    got = {(r["s"], r["y"]): r["n"] for r in spark.table("census_sink").collect()}
    assert got == expected

    # the maintained census drives the same fit as a full scan
    direct = DEMV(["s"], label="y").fit(batch)
    incr = DEMV(["s"], label="y").fit_from_census(spark.table("census_sink"))
    key = lambda t: (t["s"], t["y"])
    assert sorted(direct._targets, key=key) == sorted(incr._targets, key=key)


def test_asof_join_backward_semantics(spark):
    from demv_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 10), (3, 2, 3)], ["event_id", "u", "ts"]
    )
    right = spark.createDataFrame(
        [(1, 4, "a"), (1, 9, "b"), (3, 1, "c")], ["u", "ts", "v"]
    )
    out = asof_join(left, right, ts_col="ts", by=["u"], value_cols=["v"])
    got = {r["event_id"]: r["v_asof"] for r in out.collect()}
    # latest right at-or-before each left ts; no prior row -> NULL
    assert got == {1: "a", 2: "b", 3: None}
    # inclusive boundary: right at ts == left ts matches
    left2 = spark.createDataFrame([(9, 1, 4)], ["event_id", "u", "ts"])
    got2 = asof_join(left2, right, "ts", ["u"], ["v"]).collect()[0]["v_asof"]
    assert got2 == "a"


def test_asof_join_forward_direction(spark):
    from demv_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 10), (3, 2, 3)], ["event_id", "u", "ts"]
    )
    right = spark.createDataFrame(
        [(1, 4, "a"), (1, 9, "b"), (3, 1, "c")], ["u", "ts", "v"]
    )
    out = asof_join(left, right, "ts", ["u"], ["v"], direction="forward")
    got = {r["event_id"]: r["v_asof"] for r in out.collect()}
    # earliest right at-or-after each left ts
    assert got == {1: "b", 2: None, 3: None}
    # inclusive boundary at equal ts
    left2 = spark.createDataFrame([(9, 1, 9)], ["event_id", "u", "ts"])
    got2 = asof_join(left2, right, "ts", ["u"], ["v"], direction="forward").collect()[0]["v_asof"]
    assert got2 == "b"


def test_asof_join_null_semantics(spark):
    from demv_spark.operators.temporal import asof_join

    # matched right row with a NULL value must stay NULL (no skipping
    # to an older row), and NULL by-keys must never match (ASOF
    # equality semantics)
    left = spark.createDataFrame(
        [(1, 1, 10), (2, None, 5)], "event_id int, u int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 4, "a"), (1, 9, None), (None, 3, "x")], "u int, ts int, v string"
    )
    for direction, expect1 in (("backward", None), ("forward", None)):
        out = asof_join(left, right, "ts", ["u"], ["v"], direction=direction)
        got = {r["event_id"]: r["v_asof"] for r in out.collect()}
        if direction == "backward":
            assert got[1] is None, "matched ts=9 row's NULL must not be skipped"
        assert got[2] is None, "NULL by-key must not match"


def test_asof_join_right_null_ts_never_matches(spark):
    from demv_spark.operators.temporal import asof_join

    # a RIGHT row with NULL ts sorts first under ASC and would
    # otherwise carry its non-null payload into every left row that
    # precedes any real right row (DuckDB ASOF 'l.ts >= r.ts' never
    # matches NULL) — mirrors the left-NULL guard above
    left = spark.createDataFrame([(1, 1, 5), (2, 1, 12)], "event_id int, u int, ts int")
    right = spark.createDataFrame(
        [(1, None, 99), (1, 10, 7)], "u int, ts int, v int"
    )
    for direction, expect in (("backward", {1: None, 2: 7}), ("forward", {1: 7, 2: None})):
        out = asof_join(left, right, "ts", ["u"], ["v"], direction=direction)
        got = {r["event_id"]: r["v_asof"] for r in out.collect()}
        assert got == expect, f"{direction}: NULL-ts right row must never match"


def _ts(s):
    import datetime
    return datetime.datetime.fromisoformat(s)


def test_interval_join_matches_between_semantics(spark):
    from demv_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00")),
         (2, "u", _ts("2024-01-01 10:29:59")),
         (3, "u", _ts("2024-01-01 10:30:00")),   # closed end: still in
         (4, "u", _ts("2024-01-01 10:30:01")),   # just out
         (5, "v", _ts("2024-01-01 10:10:00")),   # other key
         (6, None, _ts("2024-01-01 10:10:00")),  # NULL key never matches
         (7, "u", None)],                        # NULL ts never matches
        "event_id long, user_id string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [("u", 100, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00")),
         ("u", 101, _ts("2024-01-01 10:29:00"), _ts("2024-01-01 10:29:00")),  # 1-sec
         ("u", 102, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 10:00:00"))],  # inverted
        "user_id string, iv_id long, s timestamp, e timestamp",
    )
    out = interval_join(pts, iv, "ts", "s", "e", by=["user_id"], bucket="5 minutes")
    got = sorted((r["event_id"], r["iv_id"]) for r in out.collect())
    assert got == [(1, 100), (2, 100), (3, 100)]


def test_interval_join_spanning_many_buckets(spark):
    from demv_spark.operators.temporal import interval_join

    # one long interval over many tiny buckets: every point matches once
    pts = spark.createDataFrame(
        [(i, _ts(f"2024-01-01 0{h}:{m:02d}:00"))
         for i, (h, m) in enumerate([(0, 5), (1, 30), (2, 59), (3, 0)])],
        "event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(9, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 03:00:00"))],
        "iv_id long, s timestamp, e timestamp",
    )
    out = interval_join(pts, iv, "ts", "s", "e", bucket="1 minute")
    rows = out.collect()
    assert sorted(r["event_id"] for r in rows) == [0, 1, 2, 3]
    assert len(rows) == 4  # exactly-once despite 181 exploded buckets


def test_interval_join_bad_bucket_unit(spark):
    from demv_spark.operators.temporal import interval_join

    pts = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"))],
                                "event_id long, ts timestamp")
    with pytest.raises(ValueError, match="unsupported bucket unit"):
        interval_join(pts, pts.select("event_id", F.col("ts").alias("s"),
                                      F.col("ts").alias("e")),
                      "ts", "s", "e", bucket="2 months")


def test_funnel_counts_ordered_semantics(spark):
    from datetime import datetime

    from demv_spark.streaming.monitor import funnel_counts

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # u1 completes the funnel in order
        (1, "click", t(0)), (1, "signup", t(5)), (1, "purchase", t(9)),
        # u2 signs up BEFORE clicking -> stops at stage 1
        (2, "signup", t(1)), (2, "click", t(2)),
        # u3 clicks then purchases (no signup) -> stage 1 only
        (3, "click", t(0)), (3, "purchase", t(4)),
        # u4 never clicks -> not even stage 1
        (4, "signup", t(0)), (4, "purchase", t(1)),
        # u5: click, signup, but purchase BEFORE signup -> stage 2
        (5, "click", t(0)), (5, "purchase", t(1)), (5, "signup", t(2)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r["stage"]: (r["step"], r["n_users"])
           for r in funnel_counts(df, ["click", "signup", "purchase"]).collect()}
    assert got == {1: ("click", 4), 2: ("signup", 2), 3: ("purchase", 1)}


# ---- categorical census drift ----


def test_census_shift_exact_and_null_safe(spark):
    from demv_spark.streaming.monitor import census_shift_report

    ref = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 1, ["k"]
    )
    cur = spark.createDataFrame(
        [("a",)] * 2 + [("c",)] * 6 + [(None,)] * 2, ["k"]
    )
    rows = {r["k"]: r for r in census_shift_report(ref, cur, ["k"]).collect()}
    assert set(rows) == {"a", "b", "c", None}
    r = rows["a"]
    assert (r["n_ref"], r["n_cur"], r["n_ref_total"], r["n_cur_total"]) == (6, 2, 10, 10)
    assert r["shift_num"] == abs(6 * 10 - 2 * 10)
    # keys absent on one side report the full other-side mass
    assert rows["b"]["shift_num"] == 3 * 10
    assert rows["c"]["shift_num"] == 6 * 10
    # the NULL group is ONE row (null-safe join), not two phantom rows
    assert (rows[None]["n_ref"], rows[None]["n_cur"]) == (1, 2)
    # TV distance = sum/2*N_ref*N_cur = (40+30+60+10)/200 = 0.7
    assert sum(r["shift_num"] for r in rows.values()) == 140


def test_census_shift_same_source_slices(spark):
    """ref/cur sliced from the SAME DataFrame (the self-join lineage
    case the analyzer flags) must work."""
    from demv_spark.streaming.monitor import census_shift_report

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("k"), "id"
    )
    out = census_shift_report(
        df.filter(F.col("id") < 50), df.filter(F.col("id") >= 50), ["k"]
    ).collect()
    assert len(out) == 3
    assert all(r["n_ref_total"] == 50 and r["n_cur_total"] == 50 for r in out)


def _with_pii_text(df):
    """Deterministic per-event text: every 3rd event carries an email,
    every 5th an SSN."""
    return df.withColumn(
        "text",
        F.concat(
            F.lit("event payload "),
            F.when(F.col("user_id") % 3 == 0, F.lit("user@example.com "))
            .otherwise(F.lit("")),
            F.when(F.col("user_id") % 5 == 0, F.lit("123-45-6789"))
            .otherwise(F.lit("")),
        ),
    )


def test_windowed_pii_census_stream_matches_batch(spark, events_dir):
    batch = _with_pii_text(spark.read.parquet(events_dir))
    expected = {
        tuple(r)
        for r in monitor.windowed_pii_census(
            batch, window="6 hours", types=["email", "ssn"]
        ).collect()
    }
    assert any(r[3] > 0 for r in expected)        # emails actually fire

    stream = _with_pii_text(_stream(spark, events_dir))
    census = monitor.windowed_pii_census(
        stream, window="6 hours", types=["email", "ssn"]
    )
    q = (
        census.writeStream.format("memory")
        .queryName("pii_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM pii_sink").collect()}
    # append mode: emitted = watermark-closed windows; every emitted
    # row must equal its batch twin, and all closed windows emit
    assert got <= expected
    import datetime
    max_end = max(r[1] for r in expected)
    closed = {r for r in expected if r[1] <= max_end - datetime.timedelta(hours=2)}
    assert closed <= got
    assert len(got) > 0
