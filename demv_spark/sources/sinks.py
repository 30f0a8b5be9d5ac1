"""Write-side operators — partitioned and bucketed sinks.

The reference only writes tiny metric CSVs (S6). At 100 TB the write
layout IS the read plan of every downstream job, so the engine
exposes the two layout levers:

- ``write_partitioned``: hive-style directory partitioning → partition
  PRUNING for any filter on the partition columns (the scan skips
  directories, not rows).
- ``write_bucketed``: pre-shuffled bucket layout → joins/aggregations
  on the bucket keys need NO exchange at read time (co-located join).
  Requires a catalog table (saveAsTable), which is how Spark persists
  bucket metadata.

Both are thin wrappers; their value is the documented contract plus
``verify_bucketed_join_plan`` for asserting the no-exchange property.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet: filters on ``partition_cols``
    prune whole directories at scan time."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table: repeated joins/aggs on ``bucket_cols``
    skip the shuffle (both sides already hash-distributed). Size
    ``n_buckets`` so one bucket ≈ one task's worth of data at the
    target scale."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")


def is_exchange_free_join(spark: SparkSession, left: str, right: str, on: Sequence[str]) -> bool:
    """True when a join of two bucketed tables on their bucket keys
    plans without a shuffle exchange on either side."""
    from demv_spark.plans.introspect import plan_stats

    j = spark.table(left).join(spark.table(right), list(on))
    return plan_stats(j)["n_exchanges"] == 0
