"""Shared state-table append for the streaming maintainers.

Round 10 switched the maintainers' state tables to bucketed
(sigs/bands/verdicts/postings) and partitioned (semantic verdicts)
layouts so per-batch joins and pruned reads get the history already
hash-distributed. That left a migration cliff (ADVICE r11): a stream
resuming over a state table CREATED by the pre-bucketed code would
die — `saveAsTable(mode="append")` with a bucket/partition spec that
does not match the existing table raises AnalysisException before
writing anything.

``append_state_table`` makes the layout a best-effort OPTIMIZATION
instead of a hard precondition: the append is attempted in the
desired layout first; on the specific does-not-match analysis error
it falls back to a plain append in the table's EXISTING layout. The
fallback is correctness-neutral — every reader derives state from
row contents (batch_id high-water marks, verdict columns), never
from file layout; a legacy table just keeps paying the read-side
shuffle the bucketing would have saved. To migrate a legacy table to
the bucketed layout, rewrite it once offline::

    df = spark.table(t)
    df.write.mode("overwrite").bucketBy(32, *keys).saveAsTable(t_new)

(or simply drop the state tables and replay the source — every
maintainer is replay-safe by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def append_state_table(
    df: DataFrame,
    table: str,
    bucket_cols: "list[str] | None" = None,
    n_buckets: int = 32,
    partition_cols: "list[str] | None" = None,
) -> None:
    """Append ``df`` to ``table`` in the requested bucketed /
    partitioned layout, falling back to the table's existing layout
    when the table predates the layout (legacy, pre-round-10 state).

    The mismatch is detected from the analysis error itself rather
    than by parsing DESCRIBE output: Spark rejects a spec'd append
    onto a differently-spec'd table with "Specified bucketing/
    partitioning does not match that of the existing table" BEFORE
    any file is written, so catching exactly that error and retrying
    plain is atomic-safe. Any other AnalysisException (schema drift,
    missing columns) re-raises untouched.
    """
    from pyspark.errors import AnalysisException

    writer = df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if bucket_cols:
        writer = writer.bucketBy(int(n_buckets), *bucket_cols)
    try:
        writer.saveAsTable(table)
    except AnalysisException as e:
        msg = str(e)
        if "does not match that of the existing table" not in msg:
            raise
        df.write.mode("append").saveAsTable(table)
