"""Change-data-capture compaction — changelog → snapshot / history.

A 100 TB ingest rarely receives clean full tables: upstream systems
emit CHANGELOGS (insert/update/delete rows keyed by entity + change
time, the Debezium/Kafka-connect shape), and the lakehouse's job is
to compact them — either to the latest snapshot (merge-on-read, what
Delta/Hudi/Iceberg do under MERGE) or to SCD2-style validity
intervals for time-travel joins. Both are pure relational window
algebra here, so they value-hash against a SQL oracle and inherit
Spark's shuffle machinery instead of a bespoke merge engine.

Scale shape: ONE shuffle each, keyed on the entity key (the window
partition). At warehouse scale the changelog would be bucketed by
key so compaction is shuffle-free; AQE handles skewed keys (a
hot-entity key is the classic CDC skew).

Determinism contract: (key, ts [, seq]) must totally order each
key's changes — ties beyond the provided ordering columns would make
row_number nondeterministic (same contract as any MERGE engine;
Debezium provides the LSN/offset as ``seq_col``).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _order(ts_col: str, seq_col: "str | None"):
    cols = [F.col(ts_col).desc()]
    if seq_col is not None:
        cols.append(F.col(seq_col).desc())
    return cols


def cdc_snapshot(
    log: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str = "op",
    seq_col: "str | None" = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Latest-wins compaction: one row per key — the change with the
    greatest (ts [, seq]) — with keys whose LATEST change is a
    ``delete_op`` dropped entirely. Columns pass through unchanged
    (the snapshot keeps ``op_col``/``ts_col`` so lineage is
    auditable; drop them downstream if not wanted).

    SQL twin: ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts
    DESC, seq DESC) = 1 AND op <> 'delete'``."""
    w = Window.partitionBy(*key_cols).orderBy(*_order(ts_col, seq_col))
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .filter(F.col(op_col) != delete_op)
    )


def scd2_history(
    log: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str = "op",
    seq_col: "str | None" = None,
    delete_op: str = "delete",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current: str = "is_current",
) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) validity intervals:
    every non-delete change becomes a history row valid from its own
    change time until the NEXT change of the same key (NULL = still
    open). A delete closes the previous interval but emits no row of
    its own, so the history never resurrects deleted state.

    One ordered pass per key (lead window over the same partition as
    ``cdc_snapshot`` — the two compactions share a shuffle when run
    together). ``is_current`` marks open intervals, i.e. exactly the
    rows ``cdc_snapshot`` would return."""
    asc = [F.col(ts_col).asc()] + (
        [F.col(seq_col).asc()] if seq_col is not None else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*asc)
    return (
        log.withColumn("__next_ts", F.lead(ts_col).over(w))
        .filter(F.col(op_col) != delete_op)
        .select(
            *log.columns,
            F.col(ts_col).alias(valid_from),
            F.col("__next_ts").alias(valid_to),
            F.col("__next_ts").isNull().alias(current),
        )
    )
