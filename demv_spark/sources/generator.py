"""Synthetic classification dataset generator — SURVEY.md §2.1 S8.

Mirrors the reference generator's shape (replication_package/data/
generator.py:19-30: sklearn make_classification + s sensitive columns
appended as an exact half-0/half-1 split, shuffled) as a pure Spark
plan: class-dependent Gaussian-ish features from seeded rand, exact
50/50 sensitive assignment via parity of a random rank. No driver-side
data — scales to any row count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def make_classification(
    spark: SparkSession,
    n_rows: int = 1000,
    n_features: int = 10,
    n_classes: int = 2,
    n_sensitive: int = 2,
    seed: int = 42,
    sensitive_balance: float | None = None,
) -> DataFrame:
    """Columns: f0..f{k-1} double, s0..s{m-1} int {0,1}, y int.

    Features are informative: feature j of a row with class c is
    centered at 2·c·((j % 3) − 1) with uniform noise — linearly
    separable enough for classifier smoke tests, matching the
    reference fixture's role (test_demv.py:8-20).

    ``sensitive_balance=None`` reproduces the reference's exact
    half/half split (parity of a seeded random permutation rank);
    a float p gives Bernoulli(p) instead (skew scenarios)."""
    df = spark.range(n_rows).withColumnRenamed("id", "row_id")
    y = F.pmod(F.floor(F.rand(seed) * n_classes), n_classes).cast("int")
    df = df.withColumn("y", y)
    for j in range(n_features):
        center = (2.0 * (j % 3 - 1)) * F.col("y")
        df = df.withColumn(f"f{j}", center + F.rand(seed + 100 + j) * 2.0 - 1.0)
    for m in range(n_sensitive):
        if sensitive_balance is None:
            w = Window.orderBy(F.rand(seed + 200 + m))
            df = df.withColumn(f"s{m}", (F.row_number().over(w) % 2).cast("int"))
        else:
            df = df.withColumn(
                f"s{m}", (F.rand(seed + 200 + m) < sensitive_balance).cast("int")
            )
    return df.select(
        *[f"f{j}" for j in range(n_features)],
        *[f"s{m}" for m in range(n_sensitive)],
        "y",
    )
