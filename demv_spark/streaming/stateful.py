"""Custom stateful streaming operator via applyInPandasWithState.

Built-in windowed aggregations cover time-bucketed counting; what
they cannot express is *cumulative-from-stream-start* state with
custom transition logic. This module implements the canonical
example for the fairness domain: a per-key running-statistics
tracker with CUSUM drift detection — each micro-batch updates
per-key state (count, sum, CUSUM accumulators) and emits the
current cumulative stats + drift score.

This is the engine's one legitimately-stateful Python surface: the
state transition is scalar arithmetic per key per batch (Arrow moves
only the batch rows), so the Python overhead is O(keys), not O(rows).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("batch_mean", DoubleType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
        StructField("drift", LongType()),
    ]
)


def running_drift_monitor(
    df: DataFrame,
    key_col: str,
    value_col: str,
    target_mean: float,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Per-key cumulative stats + two-sided CUSUM drift detection.

    state(key) = (n, Σvalue, C⁺, C⁻); per batch:
        C⁺ = max(0, C⁺ + (batch_mean − target − slack))
        C⁻ = max(0, C⁻ + (target − batch_mean − slack))
        drift = 1 if either exceeds ``threshold``

    Works identically on a batch frame (single "batch" per key via
    applyInPandas) and a stream (state carried across micro-batches).
    """

    def update(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, c_pos, c_neg = state.get
        else:
            n, total, c_pos, c_neg = 0, 0.0, 0.0, 0.0
        batch_n, batch_sum = 0, 0.0
        for pdf in pdf_iter:
            batch_n += len(pdf)
            batch_sum += float(pdf[value_col].sum())
        if batch_n:
            batch_mean = batch_sum / batch_n
            c_pos = max(0.0, c_pos + (batch_mean - target_mean - slack))
            c_neg = max(0.0, c_neg + (target_mean - batch_mean - slack))
            n += batch_n
            total += batch_sum
        else:
            batch_mean = float("nan")
        state.update((n, total, c_pos, c_neg))
        yield pd.DataFrame(
            [
                {
                    "key": str(key[0]),
                    "n": n,
                    "mean": total / n if n else float("nan"),
                    "batch_mean": batch_mean,
                    "cusum_pos": c_pos,
                    "cusum_neg": c_neg,
                    "drift": int(c_pos > threshold or c_neg > threshold),
                }
            ]
        )

    if df.isStreaming:
        return (
            df.groupBy(key_col)
            .applyInPandasWithState(
                update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    # batch twin: one stateless pass with the same transition applied
    # to the single "batch" (fresh state), same output schema
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum(value_col).cast("double").alias("total")
    )
    batch_mean = F.col("total") / F.col("n")
    c_pos = F.greatest(F.lit(0.0), batch_mean - F.lit(target_mean) - F.lit(slack))
    c_neg = F.greatest(F.lit(0.0), F.lit(target_mean) - batch_mean - F.lit(slack))
    return agg.select(
        F.col(key_col).cast("string").alias("key"),
        "n",
        batch_mean.alias("mean"),
        batch_mean.alias("batch_mean"),
        c_pos.alias("cusum_pos"),
        c_neg.alias("cusum_neg"),
        ((c_pos > threshold) | (c_neg > threshold)).cast("long").alias("drift"),
    )


QUOTA_STATE_SCHEMA = StructType([StructField("n_admitted", LongType())])


def streaming_quota_admission(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Streaming per-key quota: admit the first ``cap`` rows of each
    key in arrival order (micro-batch order, then ``id_col`` within a
    batch) — the incremental twin of ``corpus.cap_per_key`` for a
    corpus that arrives as a stream (crawl snapshots, log shippers).

    state(key) = rows admitted so far; per batch the first
    ``cap − state`` rows (by id) admit and the counter advances by
    exactly the number admitted, so replaying MORE of the stream never
    revokes an earlier admission — append-only verdicts, the property
    downstream incremental consumers need. Arrow moves only each
    batch's rows; per-key Python work is O(batch rows).

    Emits (key, id, admitted) in append mode. On a batch frame the
    same function runs via a single applyInPandas pass (fresh state),
    which equals cap_per_key admitting in pure-id order.
    """

    def update(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_adm = state.get[0] if state.exists else 0
        # a key's micro-batch can arrive as SEVERAL Arrow chunks
        # (maxRecordsPerBatch); sorting chunks independently would
        # admit in chunk-arrival order, not the documented id order —
        # concatenate first (bounded by the key's batch volume)
        chunks = [p for p in pdf_iter]
        if not chunks:  # timeout-style invocation: no data, keep state
            state.update((n_adm,))
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(id_col, kind="mergesort")
        room = max(0, cap - n_adm)
        flags = [1] * min(room, len(pdf)) + [0] * max(0, len(pdf) - room)
        n_adm += min(room, len(pdf))
        state.update((n_adm,))
        yield pd.DataFrame(
            {
                "key": [str(key[0])] * len(pdf),
                "id": pdf[id_col].astype("int64").to_numpy(),
                "admitted": pd.array(flags, dtype="int64"),
            }
        )

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("id", LongType()),
            StructField("admitted", LongType()),
        ]
    )

    if df.isStreaming:
        return df.groupBy(key_col).applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=QUOTA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    # batch twin: identical admission semantics in one pass — rank by
    # id within key, admit rank ≤ cap (pure-id order == the stream
    # replayed as one batch)
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(id_col).cast("long").alias("id"),
            (F.col("__rn") <= cap).cast("long").alias("admitted"),
        )
    )
