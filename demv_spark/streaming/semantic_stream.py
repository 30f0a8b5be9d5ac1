"""Streaming semantic-dedup admission — first-wins against an
accumulating whitened-vector store under FROZEN reference geometry.

The batch pipeline (operators/similarity.semantic_dedup) answers
"which vectors in THIS corpus are semantic near-duplicates"; an
embedding-ingest pipeline needs the online form: as vectors arrive,
is each one within whitened-cosine tau of anything already accepted
in its centroid bucket? This module maintains that store with the
dedup_stream design, calling the SAME batch operator
(similarity.semantic_admission) per micro-batch so the two regimes
cannot drift.

Frozen geometry (the dsir_stream frozen-target pattern): (mu, Σ⁻¹)
from ``whitening_inverse`` and the centroid set from
``centroid_refs`` are computed ONCE on a reference corpus and passed
in as literals — re-fitting them per batch would make every verdict
depend on arrival order, destroying replay determinism. Drift
monitoring (when to re-freeze) is the monitor family's job.

State is ONE verdict table: every row lands in
``{prefix}_verdicts`` tagged with its micro-batch id; the store a
batch is judged against is DERIVED (``verdict='admitted' AND
batch_id < this batch``), so there is no second table to fall out of
sync. Crash semantics are the streaming_admission_maintainer
contract verbatim: appends are at-least-once, but a batch's verdicts
are a pure function of (strictly earlier batches, the batch itself),
so a replayed batch can only append byte-identical duplicates —
never a contradictory verdict — and the read surface's dedup absorbs
them; fully-completed batches are skipped via the ``__meta``
high-water mark.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from demv_spark.streaming.state import append_state_table


def streaming_semantic_maintainer(
    stream: DataFrame,
    index_prefix: str,
    mu: "list[float]",
    minv: "list[list[float]]",
    centroids: "list[tuple[int, list[float], float]]",
    tau: float = 0.99,
    dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
):
    """foreachBatch maintainer over ``{prefix}_verdicts`` /
    ``{prefix}__meta``; per batch it runs
    ``similarity.semantic_admission`` against the derived store and
    appends the verdict rows (including the derived u/qaa arrays, so
    later batches never re-whiten history). Returns the
    StreamingQuery. Read the accepted store with
    ``semantic_accepted``."""
    from demv_spark.operators.similarity import (
        semantic_admission,
        semantic_assign,
    )

    verdicts_table = f"{index_prefix}_verdicts"
    meta_table = f"{index_prefix}__meta"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if spark.catalog.tableExists(meta_table):
            rows = spark.table(meta_table).collect()
            applied = rows[0]["last_batch_id"] if rows else -1
            if batch_id <= applied:
                return  # replayed batch — already merged
        # assign FIRST (map + broadcast, batch-sized): the batch's
        # cluster set (a census-sized collect) prunes the store read
        # to those clusters' partitions, so a batch scans only the
        # history it can actually match — not the whole store
        # (round-10 VERDICT item 5)
        assigned = semantic_assign(
            batch_df, mu, minv, centroids,
            dim=dim, id_col=id_col, vec_col=vec_col,
        )
        clusters = sorted(
            r["cluster"] for r in assigned.select("cluster").distinct().collect()
        )
        if spark.catalog.tableExists(verdicts_table):
            store = (
                spark.table(verdicts_table)
                .filter(
                    (F.col("verdict") == "admitted")
                    & (F.col("batch_id") < F.lit(batch_id))
                    & F.col("cluster").isin(clusters)
                )
                .select("vec_id", "cluster", "u", "qaa")
                # NO distinct: admission consumes the store only
                # through min-folds, so crash-window duplicate
                # appends cannot change any verdict — the old
                # per-batch global distinct re-shuffled the whole
                # history every batch for nothing
            )
        else:
            store = _empty_store(spark)
        v = semantic_admission(
            batch_df, store, mu, minv, centroids,
            tau=tau, dim=dim, id_col=id_col, vec_col=vec_col,
            assigned=assigned,
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        # cluster-partitioned store: each batch's pruned read above
        # touches only its clusters' directories (PartitionFilters);
        # legacy-layout fallback per ADVICE r11
        append_state_table(v, verdicts_table, partition_cols=["cluster"])
        spark.createDataFrame(
            [(batch_id,)], "last_batch_id long"
        ).write.mode("overwrite").saveAsTable(meta_table)

    writer = stream.writeStream.outputMode("append").foreachBatch(merge)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _empty_store(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "vec_id long, cluster int, u array<double>, qaa double"
    )


def semantic_log_replay(
    batches: "list[DataFrame]",
    mu: "list[float]",
    minv: "list[list[float]]",
    centroids: "list[tuple[int, list[float], float]]",
    tau: float = 0.99,
    dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch replay of the maintainer's verdict log: fold
    ``semantic_admission`` over an ORDERED micro-batch list with the
    store threaded from earlier batches' admitted rows — the SAME
    per-batch step the maintainer's merge runs, minus the table
    plumbing, so multi-batch semantics are value-checkable without a
    running stream (the driver row q_stream_semantic_log oracles the
    scalar columns of this log; stream ≡ replay is pinned in
    tests/test_semantic_stream.py)."""
    if not batches:
        raise ValueError("semantic_log_replay: empty batch list")
    from demv_spark.operators.similarity import semantic_admission

    store = _empty_store(batches[0].sparkSession)
    out = None
    for i, b in enumerate(batches):
        v = semantic_admission(
            b, store, mu, minv, centroids,
            tau=tau, dim=dim, id_col=id_col, vec_col=vec_col,
        ).withColumn("batch_id", F.lit(i).cast("long"))
        # the store THREADS through the fold: materialize each step so
        # the lazy plan doesn't re-run every earlier admission per
        # batch (the admission-replay shape, lineage cut per step)
        v = v.localCheckpoint(eager=True)
        out = v if out is None else out.unionByName(v)
        store = store.unionByName(
            v.filter(F.col("verdict") == "admitted").select(
                "vec_id", "cluster", "u", "qaa"
            )
        )
    return out


def semantic_accepted(spark, index_prefix: str) -> DataFrame:
    """The accepted store (vec_id, cluster, u, qaa) derived from the
    verdict log — DISTINCT absorbs any crash-window duplicate
    appends, so admission reads are exactly-once even though verdict
    delivery is at-least-once."""
    return (
        spark.table(f"{index_prefix}_verdicts")
        .filter(F.col("verdict") == "admitted")
        .select("vec_id", "cluster", "u", "qaa")
        .distinct()
    )
