"""Per-key sliding-window census: ANSI RANGE-frame semantics pinned
against a hand fixture, incl. timestamp ties (peer groups) and the
trailing-window boundary (w-1 PRECEDING keeps exactly one width)."""

import datetime

import pyspark.sql.functions as F

from demv_spark.operators.temporal import rolling_census


def _ts(m, s=0):
    base = datetime.datetime(2026, 1, 1, 10, 0, 0)
    return base + datetime.timedelta(minutes=m, seconds=s)


def test_rolling_census_hand_fixture(spark):
    rows = [
        (1, 7, _ts(0), 1.0),
        (2, 7, _ts(30), 2.0),     # 30 min later: inside 1h of e1
        (3, 7, _ts(59, 59), 4.0), # 59:59 after e1: still inside
        (4, 7, _ts(60), 8.0),     # exactly 1h after e1: e1 EXCLUDED
        (5, 9, _ts(30), 16.0),    # other key: independent
        (6, 7, _ts(60), 32.0),    # tie with e4: peers, both included
        (7, 7, None, 64.0),       # NULL ts: dropped at entry
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        r["event_id"]: (r["n_trail"], r["sum_trail"])
        for r in rolling_census(
            df, ["user_id"], "ts", "1 hour", value_col="value"
        ).collect()
    }
    assert out[1] == (1, 1.0)
    assert out[2] == (2, 3.0)
    assert out[3] == (3, 7.0)
    # e4 and e6 are peers at +60:00: window covers (00:01..60:00] —
    # e1 (at 00:00) ages out, e2/e3 remain, both peers included
    assert out[4] == (4, 46.0)
    assert out[6] == (4, 46.0)
    assert out[5] == (1, 16.0)
    assert 7 not in out


def test_rolling_census_fractional_second_truncation(spark):
    """unix_timestamp TRUNCATES fractional seconds (DuckDB's bare
    CAST(epoch) would round) — an event at +59:59.9 must still count
    the t=0.5 event as inside the trailing hour (both truncate to a
    59:59 gap), pinning the truncation convention the oracles now
    FLOOR-match."""
    base = datetime.datetime(2026, 1, 1, 10, 0, 0, 400000)
    rows = [
        (1, 5, base, 1.0),
        (2, 5, base + datetime.timedelta(seconds=3599, microseconds=500000), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        r["event_id"]: r["n_trail"]
        for r in rolling_census(df, ["user_id"], "ts", "1 hour").collect()
    }
    # fractions .4 and .9 DISCRIMINATE the conventions: truncation
    # gives secs 0/3599 (gap 3599 → inside); round-half-up would give
    # 0/3600 (gap 3600 → outside) — so a convention change fails here
    assert out[2] == 2


def test_hop_window_census_membership(spark):
    from demv_spark.streaming.monitor import hop_window_census

    rows = [
        (1, "a", datetime.datetime(2026, 1, 1, 10, 7)),
        (2, "a", datetime.datetime(2026, 1, 1, 10, 22)),
        (3, None, datetime.datetime(2026, 1, 1, 10, 0)),  # NULL key kept
        (4, "a", None),                                   # NULL ts dropped
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, ts timestamp")
    out = {}
    for r in hop_window_census(df, ["k"], width="1 hour", slide="15 minutes").collect():
        out.setdefault(r["k"], []).append((r["window_start"], r["n"]))
    # every event lands in exactly width/slide = 4 hops
    assert sum(n for _, n in out["a"]) == 8
    assert sum(n for _, n in out[None]) == 4
    # all starts are slide-aligned
    assert all(ws % 900 == 0 for v in out.values() for ws, _ in v)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hop_window_census(df, ["k"], width="50 minutes", slide="15 minutes")


# ---- sessionized training features (round 9) ----

def test_session_features_hand_fixture(spark):
    """Hand fixture: two users, a sub-second gap boundary (exactly
    30min must NOT break; 30min + 1 microsecond must), NULL ts
    excluded, decimal-stable value sum, distinct type count."""
    import datetime as dt

    from demv_spark.operators.temporal import session_features

    b = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        # user 1, session 0: three events, 30:00.000000 gap does NOT break
        (1, b, "a", 1.5),
        (1, b + dt.timedelta(minutes=10), "b", 2.25),
        (1, b + dt.timedelta(minutes=40), "a", 0.125),
        # user 1, session 1: 30min + 1us after the last event
        (1, b + dt.timedelta(minutes=70, microseconds=1), "c", 4.0),
        # user 2: single event
        (2, b, "a", 7.0),
        # NULL ts: excluded
        (2, None, "a", 100.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "value"])
    got = {
        (r["user_id"], r["session_id"]): r
        for r in session_features(df, gap_minutes=30).collect()
    }
    assert set(got) == {(1, 0), (1, 1), (2, 0)}
    s = got[(1, 0)]
    assert s["n_events"] == 3
    assert s["duration_sec"] == 40 * 60
    assert s["n_types"] == 2
    assert s["value_sum"] == 1.5 + 2.25 + 0.125
    assert s["max_value"] == 2.25
    assert got[(1, 1)]["n_events"] == 1
    assert got[(1, 1)]["duration_sec"] == 0
    assert got[(2, 0)]["value_sum"] == 7.0


def test_session_features_deterministic_under_partitioning(spark):
    from demv_spark.operators.temporal import session_features

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(map(tuple, session_features(ev).collect()))
    c = sorted(map(tuple, session_features(ev.repartition(17)).collect()))
    assert a == c and len(a) > 0
