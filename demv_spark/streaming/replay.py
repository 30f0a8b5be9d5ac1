"""Shared fold behind the streaming maintainers' batch-replay twins:
tag each micro-batch (optionally transformed) with its ordinal and
append — the maintainers' exact merge step minus the table plumbing,
factored once so the index/CDC/HLL replays cannot drift from each
other (the admission replay keeps its own fold: its store THREADS
through the batches, a different shape)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tagged_batch_union(batches: "list[DataFrame]", per_batch=None) -> DataFrame:
    """Fold an ORDERED micro-batch list into one batch-tagged log:
    ``per_batch`` (default identity) maps each batch to its log rows,
    which then carry ``batch_id`` = the batch's ordinal. Raises on an
    empty list — a replay of nothing is a caller bug, not an empty
    log."""
    if not batches:
        raise ValueError("batch replay: empty batch list")
    out = None
    for i, b in enumerate(batches):
        t = per_batch(b) if per_batch is not None else b
        t = t.withColumn("batch_id", F.lit(i).cast("long"))
        out = t if out is None else out.unionByName(t)
    return out
