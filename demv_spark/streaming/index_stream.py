"""Streaming inverted-index maintenance — continuous crawl → search.

The batch side (operators/text.py::inverted_index / phrase_search)
indexes a complete corpus; a live ingest receives documents in
micro-batches and wants the index queryable between batches. Same
design as the CDC and admission maintainers (derived state over an
append-only tagged log, replay-harmless):

  <prefix>_postings  (term, doc_id, positions, tf, batch_id)
  <prefix>__meta     (last_batch_id)

Per batch: postings are the batch-local ``inverted_index`` (map +
one bounded groupBy — a doc's postings never straddle batches, so
batch-local IS globally correct for immutable documents), appended
with the batch id. Re-ingested doc ids (crawl re-fetches) are
resolved on READ: the highest-batch version of each (term, doc)
posting wins and a doc's stale terms from older batches are dropped
via the per-doc latest-batch census — so the read surface always
reflects each document's NEWEST text without any in-place update
(merge-on-read, the same tradeoff note as cdc_stream: compact by
rewriting the log with its own read surface).

Crash replays append byte-identical postings (the batch is
recomputed from the same rows); the read surface's latest-batch
dedup absorbs them. Query with ``phrase_search(index_state(...))``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from demv_spark.operators.text import inverted_index


def streaming_index_maintainer(
    stream: DataFrame,
    index_prefix: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Start the incremental indexer; returns the StreamingQuery."""
    postings_table = f"{index_prefix}_postings"
    meta_table = f"{index_prefix}__meta"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if spark.catalog.tableExists(meta_table):
            rows = spark.table(meta_table).collect()
            applied = rows[0]["last_batch_id"] if rows else -1
            if batch_id <= applied:
                return
        idx = inverted_index(batch_df, text_col=text_col, id_col=id_col)
        idx.withColumn("batch_id", F.lit(batch_id).cast("long")).write.mode(
            "append"
        ).saveAsTable(postings_table)
        spark.createDataFrame(
            [(batch_id,)], "last_batch_id long"
        ).write.mode("overwrite").saveAsTable(meta_table)

    writer = stream.writeStream.outputMode("append").foreachBatch(merge)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def index_state(spark, index_prefix: str) -> DataFrame:
    """The queryable index as of now: per document, only its NEWEST
    batch's postings survive (re-fetches fully replace the old text's
    terms; crash-replay duplicates collapse to one row). Plug
    straight into ``phrase_search``. Refreshes the table first
    (foreachBatch writes happen in a cloned session)."""
    table = f"{index_prefix}_postings"
    spark.catalog.refreshTable(table)
    log = spark.table(table)
    latest = log.groupBy("doc_id").agg(F.max("batch_id").alias("__latest"))
    return (
        log.join(latest, "doc_id")
        .filter(F.col("batch_id") == F.col("__latest"))
        .select("term", "doc_id", "positions", "tf")
        .dropDuplicates(["term", "doc_id"])
    )
