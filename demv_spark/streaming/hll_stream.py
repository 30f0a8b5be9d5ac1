"""Streaming HyperLogLog maintenance — continuous distinct-count
service over an append-only register log.

The batch side (functions/sketches.py::hll_registers) sketches a
complete corpus; a live ingest wants per-group distinct counts that
stay current between micro-batches WITHOUT rescanning history. Same
design as the admission/index/CDC maintainers (derived state over an
append-only batch-tagged log, replay-harmless):

  <prefix>_registers  (group…, bucket, max_rho, batch_id)
  <prefix>__meta      (last_batch_id)

Per batch: the batch's OWN registers (one bounded groupBy — at most
2^p rows per group regardless of batch size) append with the batch
id. The state is DERIVED on read by re-maxing over the log — HLL
register merge is an associative, idempotent MAX, so crash replays
(byte-identical re-appends) and batch boundaries are both invisible
to the derived registers BY ALGEBRA, not by bookkeeping. Reading the
state is one bounded groupBy over a log of ≤ batches·m rows per
group; compaction = replace the log with its own re-max (one call).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from demv_spark.functions.sketches import hll_estimate, hll_registers
from demv_spark.streaming.state import append_state_table


def streaming_hll_maintainer(
    stream: DataFrame,
    index_prefix: str,
    key_col: str,
    group_cols: "list[str] | None" = None,
    p: int = 8,
    seed: int = 7,
    trigger_available_now: bool = True,
):
    """Start the incremental sketcher; returns the StreamingQuery."""
    groups = list(group_cols or [])
    reg_table = f"{index_prefix}_registers"
    meta_table = f"{index_prefix}__meta"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if spark.catalog.tableExists(meta_table):
            rows = spark.table(meta_table).collect()
            applied = rows[0]["last_batch_id"] if rows else -1
            if batch_id <= applied:
                return
        regs = hll_registers(batch_df, key_col, group_cols=groups, p=p, seed=seed)
        # the register log is BUCKETED on the group keys (VERDICT r11
        # item 7, the 73aee1c discipline): resolve_hll_log re-maxes on
        # (group…, bucket) — a superset of the bucket spec — and
        # hll_estimate then groups on the keys exactly, so BOTH
        # derived reads get the whole log already hash-distributed
        # and merge-on-read never re-shuffles history, no matter how
        # many stream-lifetime batches accreted. Ungrouped logs
        # bucket on the register bucket (resolve's only key).
        # append_state_table falls back to a legacy table's plain
        # layout instead of dying on the spec mismatch (ADVICE r11).
        append_state_table(
            regs.withColumn("batch_id", F.lit(batch_id).cast("long")),
            reg_table,
            bucket_cols=groups if groups else ["bucket"],
        )
        spark.createDataFrame(
            [(batch_id,)], "last_batch_id long"
        ).write.mode("overwrite").saveAsTable(meta_table)

    writer = stream.writeStream.outputMode("append").foreachBatch(merge)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def resolve_hll_log(log: DataFrame, group_cols: "list[str] | None" = None) -> DataFrame:
    """Derived register state over a batch-tagged log: re-max per
    (group…, bucket) — the merge is associative and idempotent, so
    replay duplicates and batch boundaries vanish by algebra. Shared
    by the maintainer's read surface and the batch replay."""
    groups = list(group_cols or [])
    return log.groupBy(*groups, "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_log_replay(
    batches: "list[DataFrame]",
    key_col: str,
    group_cols: "list[str] | None" = None,
    p: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Batch replay of ``streaming_hll_maintainer``'s register log:
    per-batch ``hll_registers`` + batch-id tag, appended — the
    maintainer's exact merge step minus the table plumbing (the
    ``admission_log_replay`` pattern). Returns the tagged log; derive
    state with ``resolve_hll_log`` and estimates with
    ``hll_estimate`` — value-checkable end-to-end without a running
    stream, and provably equal to the one-shot batch sketch (MAX over
    a union is MAX of MAXes)."""
    from demv_spark.streaming.replay import tagged_batch_union

    groups = list(group_cols or [])
    return tagged_batch_union(
        batches,
        per_batch=lambda b: hll_registers(
            b, key_col, group_cols=groups, p=p, seed=seed
        ),
    )


def hll_state(
    spark,
    index_prefix: str,
    group_cols: "list[str] | None" = None,
    p: int = 8,
) -> DataFrame:
    """Current per-group estimate components as of now —
    ``resolve_hll_log`` + ``hll_estimate`` over the maintainer's
    table. Refreshes first (foreachBatch writes happen in a cloned
    session)."""
    table = f"{index_prefix}_registers"
    spark.catalog.refreshTable(table)
    regs = resolve_hll_log(spark.table(table), group_cols=group_cols)
    return hll_estimate(regs, group_cols=group_cols, p=p)
