"""Source readers — SURVEY.md §2.1 (S1–S5).

The reference reads CSV/Excel with pandas (getdataset.py); the engine
reads parquet/CSV with the Spark readers, plus one wrinkle the
testdata exposes: parquet INT64 TIMESTAMP(NANOS) columns, which
Spark's vectorized reader rejects outright. ``read_table`` flips the
``nanosAsLong`` legacy conf and rebuilds a micros-precision timestamp
column — semantics identical to DuckDB's native TIMESTAMP_NS read at
any sub-second precision coarser than nanos.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = True
) -> DataFrame:
    """Read one testdata table, normalizing ns-timestamps to
    TimestampType (micros). Safe for any table; only acts when a
    column actually arrives as raw nanos.

    ``spread``: a single small parquet file arrives as ONE input
    split, which serializes every downstream map stage onto one core
    (31 of 32 idle). Production inputs at scale have thousands of
    splits, so the single-split case is the local-test anomaly —
    round-robin repartition to the session's parallelism when the
    scan is under-split."""
    path = f"{sf_dir}/{name}.parquet"
    # INT64 TIMESTAMP(NANOS,…) columns are rejected by the vectorized
    # reader; surfacing them as raw longs up-front avoids a failed
    # first read (which costs a whole schema-inference job). Tables
    # without nanos columns are unaffected by this conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer division keeps exact micros (double division would
        # round at ~1.7e18 ns epoch values)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if spread:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < min(target, 8):
            df = df.repartition(target)
    return df


def read_csv_noheader(
    spark: SparkSession, path: str, names: Sequence[str], **options
) -> DataFrame:
    """S1 — headerless CSV with explicit column names
    (getdataset.py:16)."""
    df = spark.read.csv(path, header=False, inferSchema=True, **options)
    return df.toDF(*names)


def read_csv_semicolon(spark: SparkSession, path: str, **options) -> DataFrame:
    """S3 — ';'-delimited CSV (wine loader, getdataset.py:495-497)."""
    return spark.read.csv(path, header=True, inferSchema=True, sep=";", **options)
