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


def write_corpus(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    target_rows_per_file: int = 1_000_000,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    total_rows: int | None = None,
    validate_partitions: bool = True,
) -> None:
    """Curated-corpus writer: partitioned parquet with SMALL-FILE
    CONTROL — the write-side half of a 100 TB curation pipeline.

    A naive ``df.write.partitionBy(...)`` emits one file per (task ×
    partition value): 2000 shuffle tasks × 50 sources = 100k files of
    a few MB — the classic small-files problem that makes every
    downstream scan pay 100k file-open round-trips. This writer sizes
    the task count from the data instead:

    - task count = ceil(total_rows / target_rows_per_file), so file
      count tracks data volume, not ``spark.sql.shuffle.partitions``;
    - ``repartitionByRange`` on (partition_cols + sort_cols) clusters
      each partition value into the fewest tasks that respect the
      target, while still SPLITTING a hot partition value across
      tasks (a hash repartition on partition_cols alone would bottleneck
      the biggest source on one task);
    - ``maxRecordsPerFile`` hard-caps any straggler file the range
      sampler misestimates;
    - ``sortWithinPartitions`` gives each file an internal order
      (run-length/delta encoding friendly, and min/max zone maps on
      the sort key actually prune).

    The row-count pass is one aggregate over the input; at 100 TB
    that is a real scan, so pass ``total_rows`` when the upstream
    pipeline already knows it (a census, a manifest, a streaming
    counter) and the writer plans its task count without touching the
    data twice. An EMPTY input writes only a ``_SUCCESS`` marker
    (hive-partitioned parquet has no schema-bearing data file to
    write), so ``corpus_manifest`` on that path raises Spark's
    unable-to-infer-schema error — callers that may write empty
    corpora should guard on ``total_rows == 0``.

    Partition-value contract: hive directory layout stores BOTH NULL
    and ``''`` partition values as ``__HIVE_DEFAULT_PARTITION__``, so
    a readback conflates them (and returns NULL) — the round-trip
    would NOT be lossless for such rows. The writer therefore rejects
    NULL/empty partition values up front, fused into the same
    aggregate pass as the row count. When the pipeline has already
    cleaned the partition columns AND knows the count, pass
    ``total_rows`` + ``validate_partitions=False`` to skip the
    planning scan entirely.
    """
    import math

    import pyspark.sql.functions as F

    keys = [*partition_cols, *(sort_cols or [])]
    bad_terms = [] if not validate_partitions else [
        F.sum(
            (F.col(c).isNull() | (F.col(c).cast("string") == "")).cast("long")
        ).alias(c)
        for c in partition_cols
    ]
    if bad_terms:
        counted = df.agg(F.count(F.lit(1)).alias("__n"), *bad_terms).collect()[0]
        bad = {c: counted[c] for c in partition_cols if counted[c]}
        if bad:
            raise ValueError(
                "write_corpus: NULL/empty partition values would be stored "
                "as __HIVE_DEFAULT_PARTITION__ and conflated on readback — "
                f"clean or coalesce these columns first: {bad}"
            )
        total = counted["__n"] if total_rows is None else total_rows
    else:
        total = df.count() if total_rows is None else total_rows
    n_tasks = max(1, math.ceil(total / max(1, target_rows_per_file)))
    out = (
        df.repartitionByRange(n_tasks, *keys) if keys else df.repartition(n_tasks)
    )
    if keys:
        out = out.sortWithinPartitions(*keys)
    w = out.write.mode(mode).option("maxRecordsPerFile", target_rows_per_file)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def dataset_file_stats(spark: SparkSession, path: str) -> dict:
    """Physical layout census of a written dataset: file count, byte
    totals and extremes. Uses the Hadoop FileSystem API (not
    os.walk), so it reports the same numbers on HDFS/S3A as on a
    local test dir. Metadata files (_SUCCESS, .crc) are excluded."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    sizes = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        sizes.append(f.getLen())
    return {
        "n_files": len(sizes),
        "total_bytes": int(sum(sizes)),
        "max_bytes": int(max(sizes, default=0)),
        "min_bytes": int(min(sizes, default=0)),
    }


# one filesystem may answer to several scheme spellings — treat them
# as the same location for the disjointness check
_SCHEME_ALIASES = {"s3": "s3", "s3a": "s3", "s3n": "s3"}


def _qualified_uri(spark: SparkSession, path: str) -> str:
    """Fully-qualified, alias-normalized URI string for a path that
    may be local or a Hadoop URI. Qualification goes through the
    Hadoop FileSystem (resolving relative paths against the working
    dir and bare paths against fs.defaultFS — what the subsequent
    read/write will actually do), then s3/s3a/s3n collapse to one
    scheme so spelling variants of one bucket can't dodge the
    never-in-place guard."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    try:
        uri = p.getFileSystem(conf).makeQualified(p).toUri()
    except Exception:
        # no FileSystem impl on the classpath for this scheme (e.g.
        # s3a without the AWS bundle in a local test JVM) — the URI
        # itself still normalizes and the check stays scheme-exact
        uri = p.toUri()
    scheme = (uri.getScheme() or "").lower()
    scheme = _SCHEME_ALIASES.get(scheme, scheme)
    authority = uri.getAuthority() or ""
    return f"{scheme}://{authority}{uri.getPath()}".rstrip("/")


def compact_dataset(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_cols: Sequence[str] = (),
    target_rows_per_file: int = 1_000_000,
    sort_cols: Sequence[str] | None = None,
) -> dict:
    """Rewrite a small-files dataset into right-sized files (the
    OPTIMIZE/compaction maintenance op every long-lived corpus needs:
    streaming and incremental ingests accrete tiny files until scans
    are metadata-bound). Reads src, rewrites via ``write_corpus`` to
    dst (never in place — a failed rewrite must not destroy the
    source), returns before/after file stats."""
    # enforce the never-in-place contract instead of documenting it:
    # dst == src would overwrite while reading, and a NESTED dst
    # (either direction) double-counts every row on the next read of
    # the outer directory. Paths may be Hadoop URIs (hdfs://, s3a://),
    # where os.path.abspath would wrongly prepend cwd and scheme
    # aliases (s3 vs s3a vs s3n) of one bucket would bypass a string
    # compare (ADVICE round 5) — so qualify both through the Hadoop
    # FileSystem and normalize aliased schemes before comparing.
    s = _qualified_uri(spark, src_path)
    d = _qualified_uri(spark, dst_path)
    if s == d or d.startswith(s + "/") or s.startswith(d + "/"):
        raise ValueError(
            f"compact_dataset: dst_path {dst_path!r} must be disjoint from "
            f"src_path {src_path!r} (same or nested paths corrupt the source "
            "or double-count rows)"
        )
    before = dataset_file_stats(spark, src_path)
    df = spark.read.parquet(src_path)
    write_corpus(
        df, dst_path, partition_cols,
        target_rows_per_file=target_rows_per_file, sort_cols=sort_cols,
    )
    after = dataset_file_stats(spark, dst_path)
    return {"before": before, "after": after}


def corpus_manifest(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str],
    unit_col: str | None = None,
) -> DataFrame:
    """Deterministic readback manifest of a written corpus: one row
    per partition value with exact row counts (and unit totals when
    ``unit_col`` is given) — the dataset-card numbers a training run
    records next to the data. Computed by READING BACK the written
    files, so comparing it against the same aggregate on the source
    table proves the write round-trip lossless (the driver query
    ``q_corpus_write_manifest`` does exactly that against a DuckDB
    aggregate of the source)."""
    import pyspark.sql.functions as F

    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if unit_col is not None:
        aggs.append(F.sum(F.col(unit_col).cast("long")).alias("units"))
    return df.groupBy(*partition_cols).agg(*aggs)
