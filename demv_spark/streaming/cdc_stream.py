"""Streaming CDC ingestion — continuous changelog → queryable state.

The batch side (operators/cdc.py) compacts a complete changelog; a
live pipeline receives it as a STREAM (the Debezium/Kafka shape) and
needs current state on demand. Design follows the admission
maintainer (dedup_stream.py): the only state is an APPEND-ONLY log
table tagged with micro-batch ids, and the snapshot is DERIVED on
read by the same ``cdc_snapshot`` the batch side uses — there is no
materialized state table to fall out of sync, and crash replays are
harmless (a replayed batch appends byte-identical rows; the
latest-wins row_number picks one of the identical copies, so the
derived state is unchanged). Fully-completed batches are skipped via
the ``__meta`` high-water mark.

Reading the state recomputes one latest-wins window over the log —
O(log) per read. At warehouse scale you would periodically COMPACT
the log (replace it with its own cdc_snapshot plus a new baseline
batch id), exactly the merge-on-read → copy-on-write tradeoff
Delta/Hudi expose; the compaction is one call to the same operator.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from demv_spark.operators.cdc import cdc_snapshot


def streaming_cdc_maintainer(
    stream: DataFrame,
    index_prefix: str,
    trigger_available_now: bool = True,
):
    """Start the changelog ingest; returns the StreamingQuery. The
    stream's columns pass through unchanged plus a ``batch_id`` tag —
    key/time semantics live entirely in ``cdc_state`` so one log can
    serve several key interpretations."""
    log_table = f"{index_prefix}_log"
    meta_table = f"{index_prefix}__meta"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if spark.catalog.tableExists(meta_table):
            rows = spark.table(meta_table).collect()
            applied = rows[0]["last_batch_id"] if rows else -1
            if batch_id <= applied:
                return
        batch_df.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").saveAsTable(log_table)
        spark.createDataFrame(
            [(batch_id,)], "last_batch_id long"
        ).write.mode("overwrite").saveAsTable(meta_table)

    writer = stream.writeStream.outputMode("append").foreachBatch(merge)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_log_replay(batches: "list[DataFrame]") -> DataFrame:
    """Batch replay of ``streaming_cdc_maintainer``'s log: tag each
    micro-batch with its id and append — the maintainer's exact merge
    step minus the table plumbing (the ``admission_log_replay``
    pattern, dedup_stream.py). Returns the tagged log; derive current
    state with ``cdc_snapshot`` over it, exactly as ``cdc_state``
    does over the maintainer's table — the surviving rows (and their
    ``batch_id`` provenance) are value-checkable end-to-end without a
    running stream, and batch boundaries are provably invisible to
    the derived state (latest-wins is order-independent over the
    union). Stream ≡ batch symmetry is pinned in
    tests/test_stateful_streaming.py."""
    from demv_spark.streaming.replay import tagged_batch_union

    return tagged_batch_union(batches)


def cdc_state(
    spark,
    index_prefix: str,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str = "op",
    seq_col: "str | None" = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Current state as of now — ``cdc_snapshot`` over the whole
    appended log (batch ≡ stream by construction: both run the same
    operator over the same rows). Refreshes the table first
    (foreachBatch writes happen in a cloned session)."""
    table = f"{index_prefix}_log"
    spark.catalog.refreshTable(table)
    return cdc_snapshot(
        spark.table(table).drop("batch_id"),
        key_cols, ts_col, op_col=op_col, seq_col=seq_col, delete_op=delete_op,
    )
