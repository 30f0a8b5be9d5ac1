"""Structured Streaming operators — online fairness monitoring.

The reference is batch-only (SURVEY.md §2.8: no streaming anywhere),
so this module is an *extension*: the engine's counting core applied
to unbounded data. The design follows the standard Structured
Streaming shapes:

- windowed group census with watermark (late data bounded, state
  evicted) — ONE streaming aggregation per query (Spark's limit);
- disparity derivation (w_exp/w_obs needs three aggregates of the
  same census) runs in ``foreachBatch`` on each micro-batch's census
  delta — the documented pattern for multi-aggregate post-processing;
- sessionization via ``session_window`` (native stateful op).

Every operator returns a plain DataFrame plan that works identically
on a batch frame (tested that way) and on ``spark.readStream`` input —
the same lazy plan, different source. That batch/stream symmetry is
the whole point of the DataFrame-first design.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import TimestampNTZType


def _watermarked(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Apply a watermark on a stream; no-op on batch frames.

    Event-time watermarks require TIMESTAMP (an instant); testdata
    timestamps are normalized to TIMESTAMP_NTZ for oracle parity, so
    cast at the watermark boundary — within one streaming query the
    interpretation is consistent."""
    if not df.isStreaming:
        return df
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def windowed_group_census(
    df: DataFrame,
    sensitive: Sequence[str],
    label: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(time-window, sensitive…, label) counts with a watermark.

    On a stream: append-mode capable (watermarked tumbling window);
    state per open window × group only. On a batch frame: identical
    results, watermark is a no-op."""
    wm = _watermarked(df, ts_col, watermark)
    return (
        wm.groupBy(F.window(ts_col, window).alias("w"), *sensitive, label)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *sensitive,
            label,
            "n",
        )
    )


def derive_disparities(
    census: DataFrame, sensitive: Sequence[str], label: str
) -> DataFrame:
    """Batch post-processing of a windowed census: per-window group
    weights (w_exp frozen on the window's own total — the streaming
    analogue of the reference's frozen-N invariant). Used inside
    foreachBatch, where multi-aggregate plans are allowed."""
    keys = ["window_start", "window_end"]
    sens = census.groupBy(*keys, *sensitive).agg(F.sum("n").alias("n_sens"))
    lab = census.groupBy(*keys, label).agg(F.sum("n").alias("n_label"))
    tot = census.groupBy(*keys).agg(F.sum("n").alias("n_total"))
    out = (
        census.join(sens, [*keys, *sensitive])
        .join(lab, [*keys, label])
        .join(tot, keys)
    )
    w_exp = (F.col("n_sens") / F.col("n_total")) * (F.col("n_label") / F.col("n_total"))
    w_obs = F.col("n") / F.col("n_total")
    return out.select(
        *keys, *sensitive, label, "n",
        w_exp.alias("w_exp"), w_obs.alias("w_obs"),
        (w_exp / w_obs).alias("disparity"),
    )


def disparity_monitor(
    stream: DataFrame,
    sensitive: Sequence[str],
    label: str,
    sink_table: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    trigger_available_now: bool = True,
):
    """End-to-end online disparity monitor: windowed census stream →
    foreachBatch → per-window disparities appended to an in-memory /
    catalog table. Returns the StreamingQuery (caller awaits it)."""
    census = windowed_group_census(stream, sensitive, label, ts_col, window, watermark)

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        disp = derive_disparities(batch_df, sensitive, label)
        disp.write.mode("append").saveAsTable(sink_table)

    writer = census.writeStream.outputMode("append").foreachBatch(emit)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def event_rate_monitor(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed event-type rates — the plain streaming rollup."""
    wm = _watermarked(df, ts_col, watermark)
    return (
        wm.groupBy(F.window(ts_col, window).alias("w"), type_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            type_col,
            "n",
        )
    )


def session_window_rollup(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user sessionization via native session_window (stateful op;
    applyInPandasWithState would only be needed for custom session
    logic beyond a gap timeout)."""
    wm = _watermarked(df, ts_col, watermark)
    return (
        wm.groupBy(F.session_window(ts_col, gap).alias("s"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def census_maintainer(
    stream: DataFrame,
    sensitive: Sequence[str],
    label: str,
    sink_table: str,
    trigger_available_now: bool = True,
):
    """Incremental global-census maintenance: each micro-batch's
    (sensitive…, label) census delta is merged into ``sink_table`` by
    per-key sum (group counts are a commutative monoid — see
    counting.merge_census), so the table always holds the exact
    census of everything ingested. ``DEMV.fit_from_census(spark.table
    (sink_table))`` then re-fits balancing targets after any append
    without touching the corpus — the streaming closure of the
    incremental-balancing path.

    One streaming aggregation (the batch census) + a tiny
    foreachBatch merge of |groups| rows per trigger. foreachBatch is
    at-least-once, so the merge is made idempotent: the last applied
    batch_id is stored in ``<sink_table>__meta`` and replayed batches
    (failure between sink commit and checkpoint commit) are skipped.
    Returns the StreamingQuery.
    """
    from demv_spark.functions.counting import group_census, merge_census

    keys = [*sensitive, label]
    meta_table = f"{sink_table}__meta"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if spark.catalog.tableExists(meta_table):
            applied = spark.table(meta_table).collect()[0]["last_batch_id"]
            if batch_id <= applied:
                return  # replayed batch — already merged
        delta = group_census(batch_df, keys)
        if spark.catalog.tableExists(sink_table):
            merged = merge_census([spark.table(sink_table), delta], keys)
            # the census is |groups| rows — materialize on the driver
            # so the overwrite doesn't read the table it replaces
            rows = merged.collect()
            spark.createDataFrame(rows, merged.schema).write.mode(
                "overwrite"
            ).saveAsTable(sink_table)
        else:
            delta.write.mode("overwrite").saveAsTable(sink_table)
        spark.createDataFrame(
            [(batch_id,)], "last_batch_id long"
        ).write.mode("overwrite").saveAsTable(meta_table)

    writer = stream.writeStream.outputMode("append").foreachBatch(merge)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cascade_rollup(
    fine: DataFrame,
    bucket_col: str,
    coarse_unit: str,
    group_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Multi-resolution rollup cascade: re-aggregate a fine-grained
    census (e.g. hourly) into a coarser one (e.g. daily) WITHOUT
    touching raw events — counts are a commutative monoid, so
    rollup(rollup(raw, hour), day) == rollup(raw, day) exactly. At
    scale this is how dashboard hierarchies are maintained: each tier
    reads the tier below (|buckets| rows), never the event stream.
    """
    return (
        fine.groupBy(
            F.date_trunc(coarse_unit, F.col(bucket_col)).alias(bucket_col),
            *group_cols,
        )
        .agg(F.sum(count_col).alias(count_col))
    )


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: for each prefix of ``steps``, how
    many users performed those event types in temporal order (each
    step strictly after their FIRST qualifying time for the previous
    step — the standard first-touch funnel semantics).

    Plan: stage i is one equi-join on the user key between the step's
    events and the stage-(i−1) user table followed by a min-timestamp
    aggregate — user tables only shrink down the funnel, and every
    join/aggregate shares the user-key partitioning, so Catalyst
    plans one shuffle per stage and AQE converts late stages to
    broadcast joins as they collapse. The output unions one count row
    per stage; stage subplans share lineage (cache the events table
    when funnels are long). Fully SQL-expressible → DuckDB oracle.
    Columns: stage (1-based), step, n_users."""
    if not steps:
        raise ValueError("steps must be non-empty")
    spark = df.sparkSession
    stage_rows = []
    cur = None
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == F.lit(step)).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if cur is None:
            cur = ev.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            cur = (
                ev.join(cur, "__u")
                .filter(F.col("__ts") > F.col("__t"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        stage_rows.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("stage"), F.lit(step).alias("step"), "n_users"
            )
        )
    out = stage_rows[0]
    for s in stage_rows[1:]:
        out = out.unionByName(s)
    return out


def census_shift_report(
    ref: DataFrame, cur: DataFrame, keys: "list[str]"
) -> DataFrame:
    """Categorical distribution drift between a REFERENCE slice and a
    CURRENT slice — the census complement of the numeric CUSUM
    monitor (has the language/source/label mix of the ingest moved?).

    Emits one row per key value seen in EITHER slice:
    (keys…, n_ref, n_cur, n_ref_total, n_cur_total, shift_num) where
    ``shift_num = |n_ref·N_cur − n_cur·N_ref|`` — the total-variation
    numerator in exact CROSS-PRODUCT form, so no proportion ever
    exists as a float: TV distance = Σ shift_num / (2·N_ref·N_cur)
    derives downstream, and the report value-hashes bit-for-bit in
    any engine. A key absent from one slice contributes its full
    count (the drift a ratio-based report silently skips when the
    denominator is 0).

    Plan: two tiny partial-agg censuses, a full-outer join on the key
    (census-sized, not row-sized), totals broadcast via cross join.
    Works identically on batch slices or on two foreachBatch
    snapshots of a stream.
    """
    # key columns are renamed per side BEFORE the join: ref and cur
    # usually slice the SAME source DataFrame, and same-lineage column
    # references are ambiguous to Spark's self-join analyzer
    rc = ref.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_ref")).select(
        *[F.col(k).alias(f"__rk{i}") for i, k in enumerate(keys)], "n_ref"
    )
    cc = cur.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_cur")).select(
        *[F.col(k).alias(f"__ck{i}") for i, k in enumerate(keys)], "n_cur"
    )
    # NULL-SAFE outer join on the key columns: a plain USING join
    # would split a NULL-keyed group into two rows (one per side),
    # each reporting the other side as 0 — phantom drift
    cond = None
    for i in range(len(keys)):
        term = F.col(f"__rk{i}").eqNullSafe(F.col(f"__ck{i}"))
        cond = term if cond is None else cond & term
    joined = rc.join(cc, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__rk{i}"), F.col(f"__ck{i}")).alias(k)
            for i, k in enumerate(keys)
        ],
        F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
    )
    # totals come from the per-side censuses, NOT from `joined`:
    # re-aggregating the join result would put the whole join subtree
    # into the plan twice (once as probe side, once under the totals)
    totals = rc.agg(
        F.coalesce(F.sum("n_ref"), F.lit(0)).cast("long").alias("n_ref_total")
    ).crossJoin(
        cc.agg(
            F.coalesce(F.sum("n_cur"), F.lit(0)).cast("long").alias("n_cur_total")
        )
    )
    return joined.crossJoin(F.broadcast(totals)).select(
        *keys, "n_ref", "n_cur", "n_ref_total", "n_cur_total",
        F.abs(
            F.col("n_ref") * F.col("n_cur_total")
            - F.col("n_cur") * F.col("n_ref_total")
        ).cast("long").alias("shift_num"),
    )


def windowed_pii_census(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    types: Sequence[str] | None = None,
) -> DataFrame:
    """Per-time-window PII rates over a streaming document feed — the
    ingest alarm for a curation pipeline (a PII-rate spike in a crawl
    source means an upstream extractor broke or a new source needs
    redaction before anything lands in a shard).

    Composition, not new machinery: ``pii.pii_counts`` is map-only
    column algebra (stream-safe by construction), so one watermarked
    tumbling-window aggregate yields per-window totals and
    docs-with-any-PII. On a batch frame: identical results, watermark
    a no-op — oracle-able through the batch twin like the other
    monitor censuses. Emits one row per window: n_docs,
    n_docs_any_pii, and a total_<type> per requested type."""
    from demv_spark.operators import pii

    names = list(types) if types is not None else list(pii.PII_TYPES)
    counted = pii.pii_counts(df, text_col, names)
    wm = _watermarked(counted, ts_col, watermark)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_pii") > 0).cast("long")).alias("n_docs_any_pii"),
    ]
    for name in names:
        aggs.append(F.sum(F.col(f"n_{name}")).cast("long").alias(f"total_{name}"))
    return (
        wm.groupBy(F.window(ts_col, window).alias("w"))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs", "n_docs_any_pii",
            *[f"total_{n}" for n in names],
        )
    )


def hop_window_census(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    unit_col: "str | None" = None,
) -> DataFrame:
    """Per-(hop-window, keys…) census over SLIDING windows — the
    smoothed trend view (each event lands in width/slide overlapping
    windows, so rates move every ``slide`` instead of jumping every
    ``width``). Uses Spark's native ``F.window(ts, width, slide)``,
    so the SAME call is streaming-capable (watermarked, append-mode;
    state per open hop × key) and batch-exact; on a batch frame the
    watermark is a no-op.

    Window starts are epoch-aligned multiples of ``slide`` (Spark's
    TimeWindow origin), which makes the SQL twin pure arithmetic:
    st ∈ {(sec div s − i)·s : i < w/s, st > sec − w} — pinned by the
    q_events_hop_census oracle. ``width`` must be a multiple of
    ``slide``. Emits (window_start epoch-seconds long, keys…, n
    [, units])."""
    from demv_spark.operators.temporal import _interval_seconds

    w_s, s_s = _interval_seconds(width), _interval_seconds(slide)
    if w_s % s_s != 0:
        raise ValueError(
            f"width ({w_s}s) must be a multiple of slide ({s_s}s)"
        )
    wm = _watermarked(df.filter(F.col(ts_col).isNotNull()), ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n")]
    if unit_col is not None:
        from demv_spark.functions.compat import stable_sum

        aggs.append(stable_sum(unit_col).alias("units"))
    return (
        wm.groupBy(F.window(ts_col, width, slide).alias("w"), *keys)
        .agg(*aggs)
        .select(
            # NTZ-safe epoch emission (a bare long cast is illegal on
            # TIMESTAMP_NTZ; unix_timestamp after a plain-timestamp
            # cast matches the rolling_census convention)
            F.unix_timestamp(F.col("w.start").cast("timestamp"))
            .alias("window_start"),
            *keys,
            *(["n"] + (["units"] if unit_col is not None else [])),
        )
    )
