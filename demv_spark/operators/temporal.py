"""Temporal join operators — as-of joins, which Spark's DataFrame API
lacks (SURVEY.md custom-operator category: compose from existing ops
when semantics allow).

The naive as-of formulation is a range join (l.ts >= r.ts) + per-row
argmax — O(|L|·|R|) within each key in Spark's nested-loop fallback.
The scalable form used here is the UNION + windowed last_value trick:
tag both sides, union them, sort each key group once by (ts, side),
and carry the right side's payload forward with last_value(...,
ignoreNulls) — ONE shuffle on the key, linear work, no join node at
all. This is the standard large-scale as-of pattern (time-series
stores implement exactly this under the name "asof join").
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: every left row gains the ``value_cols`` of the
    nearest right row within the same ``by`` keys — the LATEST with
    ``right.ts <= left.ts`` (direction='backward', default) or the
    EARLIEST with ``right.ts >= left.ts`` ('forward'); NULL when no
    such right row exists.

    Equivalent to DuckDB ``ASOF LEFT JOIN ... ON by AND l.ts >= r.ts``
    (backward) / ``l.ts <= r.ts`` (forward) — the oracle. Right rows
    should be unique per (by, ts) — pre-aggregate otherwise, or the
    carried value at a tied timestamp is engine-dependent.

    Plan: union of the two tagged sides → window over (by) ordered by
    (ts, side) with the side tiebreak placing right rows on the
    matching side of equal timestamps (inclusive boundary) → carry the
    right payload with last/first(ignoreNulls) over the trailing/
    leading frame → filter back to left rows. One exchange on the key
    columns; no join operator, no range explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    lcols = [c for c in left.columns]
    # the right payload travels as ONE struct: non-null whenever a
    # right row exists, even if every value field is NULL — so a
    # matched-but-NULL value stays NULL (ignoreNulls on bare columns
    # would skip past the match to an older row), and with several
    # value_cols all values come from the SAME matched row
    rv_struct = F.struct(*[F.col(v).alias(v) for v in value_cols])
    rv_type = "struct<" + ",".join(
        f"{v}:{right.schema[v].dataType.simpleString()}" for v in value_cols
    ) + ">"
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    # ASOF equality semantics on the RIGHT side too: a right row with a
    # NULL ts (or NULL by-key) can never be anyone's match — under ASC
    # ordering NULLs sort first, so an unfiltered NULL-ts right row
    # would carry its (non-null) __rv struct into every left row that
    # precedes any real right row. Drop them before the union.
    null_right = F.col(ts_col).isNull()
    for k in by:
        null_right = null_right | F.col(k).isNull()
    tagged_r = right.filter(~null_right).select(
        *[
            F.col(c) if c in (*by, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        rv_struct.alias("__rv"),
    )
    u = tagged_l.unionByName(tagged_r)
    if direction == "backward":
        # right (side 0) sorts before left at equal ts → inclusive
        order = [F.col(ts_col).asc(), F.col("__side").asc()]
    else:
        # same growing-frame shape, reversed time: in DESC ts order the
        # nearest at-or-after right row is the last one seen; right
        # still sorts before left at equal ts for the inclusive bound.
        # (A (0, unboundedFollowing) frame would be O(n²) per key —
        # Spark re-evaluates shrinking frames from scratch per row.)
        order = [F.col(ts_col).desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols,
        "__side",
        F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__rv_m"),
    )
    # ASOF equality semantics: NULL never matches — a NULL by-key or
    # NULL ts on the left yields NULL values (the window groups NULL
    # keys together, which an equi-join would not)
    null_left = F.col(ts_col).isNull()
    for k in by:
        null_left = null_left | F.col(k).isNull()
    return carried.filter(F.col("__side") == 1).select(
        *lcols,
        *[
            F.when(~null_left, F.col(f"__rv_m.{v}")).alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )


_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_seconds(spec: str) -> int:
    """'15 minutes' → 900. Fixed-width units only (no months/years —
    a tumbling bucket must have constant span; weeks are fixed at
    604800 s)."""
    n, unit = spec.strip().split()
    if unit.lower() not in _UNIT_SECONDS:
        raise ValueError(f"unsupported bucket unit: {unit!r}")
    return int(n) * _UNIT_SECONDS[unit.lower()]


def bucket_index(ts_col: str, bucket: str) -> Column:
    """Tumbling-bucket index of a timestamp: FLOOR(epoch_micros /
    bucket_micros) as exact int64 — the shared bucketing expression of
    retention_cohorts / windowed_heavy_hitters and the one the DuckDB
    oracles' ``//`` reproduces. Spark's ``div`` truncates toward zero
    while SQL ``//`` floors, so pre-1970 timestamps (negative epochs)
    need the explicit floor correction — a plain ``div`` would put
    1969-12-31 23:00 in bucket 0 instead of −1 and silently diverge
    from any floor-division engine."""
    width_us = _interval_seconds(bucket) * 1_000_000
    # escape embedded backticks so a quoted identifier can't break
    # out of the expression (ADVICE round 5)
    safe = ts_col.replace("`", "``")
    x = f"unix_micros(cast(`{safe}` as timestamp))"
    return F.expr(
        f"CASE WHEN {x} < 0 AND {x} % {width_us} != 0 "
        f"THEN ({x} div {width_us}) - 1 "
        f"ELSE {x} div {width_us} END"
    ).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket: str = "1 hour",
) -> DataFrame:
    """Point-in-interval join: every ``points`` row pairs with every
    ``intervals`` row (same ``by`` keys) whose closed range
    [start_col, end_col] contains its timestamp — telemetry
    enrichment ("which deploy/session/incident window was this event
    in"). Equivalent to ``p JOIN i ON by AND p.ts BETWEEN i.s AND
    i.e`` — the DuckDB IEJoin oracle.

    Spark plans that predicate as a broadcast-nested-loop (or worse,
    a cartesian) — O(|P|·|I|) per key. The scalable form here is
    time-bucketing: each interval EXPLODES to the tumbling ``bucket``
    windows it overlaps, each point maps to its single bucket, and
    the pair meets in an ordinary equi-join on (by…, bucket) — the
    point's bucket is unique and occurs once in the interval's bucket
    list, so every matching pair joins EXACTLY once and no distinct
    is needed. One hash shuffle, AQE-splittable, no range explosion.

    Choose ``bucket`` near the typical interval span: cost per
    interval is ceil(span/bucket)+1 join rows. NULL timestamps,
    NULL/inverted ranges, and NULL by-keys never match (join-key
    equality drops them, matching SQL BETWEEN/equality semantics).
    Interval columns keep their names — rename upstream on collision.
    """
    width = _interval_seconds(bucket)

    def _b(col: str) -> Column:
        # bucket index = floor(epoch / width); session tz is UTC
        # (session.py) so NTZ→epoch is monotone and DST-free
        return F.floor(F.col(col).cast("timestamp").cast("long") / F.lit(width))

    p_bucket = _b(ts_col)
    i_buckets = F.sequence(_b(start_col), _b(end_col))
    p = points.withColumn("__b", p_bucket)
    i = (
        intervals.filter(F.col(start_col) <= F.col(end_col))
        .withColumn("__b", F.explode(i_buckets))
    )
    keys = [*by, "__b"]
    return (
        p.join(i, keys)
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("__b")
    )


def funnel_depth(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    id_col: str | None = None,
) -> DataFrame:
    """Per-user funnel depth: the longest PREFIX of ``steps`` matched
    as an ordered subsequence of the user's event history (the
    Amplitude/match_recognize funnel, first-occurrence semantics:
    depth 2 for [view, click, purchase] means a click happened after
    the first qualifying view, but no purchase after that click).

    Plan: pre-filter to step types only (the collect never carries
    off-funnel events), ONE shuffle to assemble each user's ordered
    type sequence — sorted by (epoch-micros, type[, id]) for a total
    deterministic order both engines agree on — then the depth is a
    JVM-side fold: acc advances when the next event's step index
    equals acc. No window over the full event table, no per-step
    self-joins (the naive funnel is k-1 self-joins of the events
    table; this is one aggregate). State per user is its step-event
    count, bounded by the funnel's selectivity.

    Returns (user, depth). SQL twin: ``list(t ORDER BY ...)`` +
    ``list_reduce`` over ``list_prepend(0, indices)``.
    """
    steps = list(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = events.filter(
        F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
    )
    parts = [
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts"),
        F.col(type_col).alias("t"),
    ]
    if id_col:
        parts.append(F.col(id_col).alias("i"))
    per_user = ev.groupBy(F.col(user_col).alias("user")).agg(
        F.array_sort(F.collect_list(F.struct(*parts))).alias("evs")
    )
    idxs = F.transform(
        F.col("evs"), lambda e: F.array_position(steps_arr, e["t"]) - F.lit(1)
    )
    depth = F.aggregate(
        idxs,
        F.lit(0).cast("long"),
        lambda acc, x: F.when(
            (x == acc) & (acc < F.lit(len(steps))), acc + F.lit(1)
        ).otherwise(acc),
    )
    return per_user.select("user", depth.cast("int").alias("depth"))


def funnel_census(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    id_col: str | None = None,
) -> DataFrame:
    """Funnel report: one row per step with the number of users whose
    depth reaches it — (step, step_name, n_users), exact BIGINTs.
    The census is a single tiny aggregate over the per-user depths
    (≤ |users| rows), unpivoted JVM-side."""
    steps = list(steps)
    d = funnel_depth(events, user_col, type_col, ts_col, steps, id_col)
    aggs = [
        F.sum((F.col("depth") >= k).cast("long")).alias(f"__s{k}")
        for k in range(1, len(steps) + 1)
    ]
    wide = d.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(k).alias("step"),
            F.lit(steps[k - 1]).alias("step_name"),
            F.coalesce(F.col(f"__s{k}"), F.lit(0)).cast("long").alias("n_users"),
        )
        for k in range(1, len(steps) + 1)
    ])
    return wide.select(F.explode(rows).alias("r")).select(
        "r.step", "r.step_name", "r.n_users"
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    bucket: str = "1 week",
) -> DataFrame:
    """Cohort retention census: users are cohorted by the time bucket
    of their FIRST event; for every (cohort, offset k) the census
    counts how many of that cohort were active k buckets later — the
    classic retention triangle, all exact integers.

    Plan: one distinct-activity shuffle on (user, bucket), a per-user
    min for the cohort (same user-keyed partitioning), a user-keyed
    join of activity onto cohorts, then a tiny (cohort, k) census.
    No per-k self-joins, no window over the raw event table; the
    heavy columns never shuffle. Bucket indices are
    ``epoch_micros div bucket_micros`` — exact int64, identical in
    any engine. The k=0 row IS the cohort size (every user is active
    in their first bucket by construction), so retention rates derive
    downstream without a second pass.

    Returns (cohort_bucket, k, n_active): cohort_bucket = the
    cohort's bucket index (multiply by the bucket width for the
    wall-clock start), k ≥ 0, n_active exact.
    """
    act = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            bucket_index(ts_col, bucket).alias("__b"),
        )
        .distinct()
    )
    coh = act.groupBy("__u").agg(F.min("__b").alias("__c"))
    return (
        act.join(coh, "__u")
        .groupBy(
            F.col("__c").alias("cohort_bucket"),
            (F.col("__b") - F.col("__c")).cast("int").alias("k"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def rolling_census(
    df: DataFrame,
    key_cols: "Sequence[str]",
    ts_col: str,
    width: str = "1 hour",
    value_col: "str | None" = None,
) -> DataFrame:
    """Per-key SLIDING-window aggregates over event time: for EVERY
    event, the count (and optional exact-decimal value sum) of that
    key's events in the trailing ``width`` window, current event
    included — rate-limit checks, burst detection, trailing-activity
    features. The frame is ``RANGE BETWEEN (w−1) PRECEDING AND
    CURRENT ROW`` over integer epoch seconds: ANSI semantics, so
    Spark and any SQL engine agree bit-for-bit, including ties
    (equal timestamps within a key are peers — every engine includes
    the whole peer group).

    Scale: one shuffle partitioning by key; within a key Spark
    evaluates the RANGE frame in a single ordered pass (no per-row
    rescan). A pathologically hot key serializes its own partition —
    the standard mitigations (pre-aggregate to coarser ticks, or
    bound with the tumbling ``windowed_group_census``) apply; normal
    key cardinality needs none. NULL timestamps are dropped at entry
    (no position in event time)."""
    width_s = _interval_seconds(width)
    sec = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    base = df.filter(F.col(ts_col).isNotNull()).withColumn("__sec", sec)
    w = (
        Window.partitionBy(*list(key_cols))
        .orderBy("__sec")
        .rangeBetween(-(width_s - 1), 0)
    )
    out = base.withColumn("n_trail", F.count(F.lit(1)).over(w))
    if value_col is not None:
        from demv_spark.functions.compat import DECIMAL_T

        out = out.withColumn(
            "sum_trail",
            F.sum(F.col(value_col).cast(DECIMAL_T)).over(w).cast("double"),
        )
    return out.drop("__sec")


def session_features(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session TRAINING FEATURES: gap-timeout sessionization (the
    batch twin of streaming ``session_window_rollup``) folded straight
    into one feature vector per session — the classic
    behavioral-features step of a training-data pipeline.

    Sessionization is the LAG-islands form: one window per user
    ordering by ``ts`` flags a session break when the gap exceeds
    ``gap_minutes``; the running sum of breaks is the session ordinal.
    Ties in ``ts`` are harmless by construction — equal timestamps
    have zero gap, so the island assignment is a pure function of the
    multiset of timestamps (no tiebreak column needed).

    Features per (user, session): start/end, n_events, duration_sec
    (integer — microsecond-exact difference floor-divided to whole
    seconds; gap compares run on integer MICROSECONDS, since event
    timestamps routinely carry sub-second precision and a
    second-truncated gap would misplace boundaries), n_types =
    distinct ``type_col``, value_sum as the ORDER-INDEPENDENT
    decimal-stable sum (``stable_sum``) and max_value — every emitted
    number either integer or a deterministic double, so the whole
    table value-hashes cross-engine. NULL-``ts`` rows are EXCLUDED
    (session position is undefined without a time; the CDC
    convention).

    Plan: ONE shuffle on the user key (window + final group share the
    partitioning); no join anywhere. At 100 TB the state per task is
    one user's event run — skewed power users are the one hazard,
    same as any sessionizer; cap upstream if a single user exceeds a
    task."""
    from demv_spark.functions.compat import stable_sum

    w = Window.partitionBy(user_col).orderBy(ts_col)
    # tz-free calendar micros: works for TIMESTAMP and TIMESTAMP_NTZ
    # alike (unix_micros rejects NTZ, and an NTZ→LTZ cast would drag
    # the session timezone — and its DST shifts — into gap math)
    micros = F.expr(
        f"timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    flagged = (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn("__us", micros)
        .withColumn(
            "__brk",
            F.when(
                F.col("__us") - F.lag("__us").over(w)
                > gap_minutes * 60 * 1_000_000,
                F.lit(1),
            )
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "__sid",
            F.sum("__brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        flagged.groupBy(user_col, "__sid")
        .agg(
            F.min(ts_col).alias("s_start"),
            F.max(ts_col).alias("s_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.expr("(max(__us) - min(__us)) div 1000000")
            .cast("long").alias("duration_sec"),
            F.countDistinct(type_col).cast("long").alias("n_types"),
            stable_sum(value_col).alias("value_sum"),
            F.max(F.col(value_col).cast("double")).alias("max_value"),
        )
        .withColumnRenamed("__sid", "session_id")
    )
