"""Structured-data privacy screens — k-anonymity / l-diversity.

Training corpora increasingly carry STRUCTURED records (user tables,
transaction logs, metadata sidecars), and the release bar for those
is not regex redaction (operators/pii.py handles free text) but
group-size guarantees: a row is k-anonymous when at least k rows
share its quasi-identifier combination, and a quasi-group is
l-diverse when it contains at least l distinct sensitive values
(k-anonymity alone leaks the sensitive attribute when a group is
homogeneous). Both are pure counting algebra — exact, SQL-twinnable,
and one aggregation/window pass at any scale.

Scale shape: the census is ONE groupBy on the quasi columns;
suppression reuses the same key via a window count (one shuffle,
the exchange shared if both run). No UDFs, no collects beyond the
census itself.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def k_anonymity_census(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Per quasi-identifier group: row count and whether it meets the
    k bar. The release decision surface — every row in a flagged
    group is re-identifiable within a candidate set smaller than k."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) >= k).alias("anonymous"),
    )


def suppress_rare_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Rows whose quasi-group has at least k members — the standard
    suppression release (drop the re-identifiable tail). Window count
    over the quasi key: one shuffle, schema unchanged."""
    w = Window.partitionBy(*quasi_cols)
    return (
        df.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") >= k)
        .drop("__n")
    )


def l_diversity_census(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """Per quasi-group: exact distinct count of the sensitive column
    and whether it meets the l bar. NULL sensitive values do not
    count as a distinct value (SQL COUNT(DISTINCT) semantics on both
    engines). A group can be k-anonymous yet 1-diverse — that is the
    homogeneity attack this census catches."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
        (F.countDistinct(sensitive_col) >= l).alias("diverse"),
    )


def anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], ks: Sequence[int]
) -> DataFrame:
    """One-row-per-k release summary: groups/rows below each k bar —
    the census aggregated once more, so sweeping ks costs one extra
    tiny pass over the group table, not one scan per k."""
    census = k_anonymity_census(df, quasi_cols, k=2).select("n")
    spark = df.sparkSession
    ks_df = spark.createDataFrame([(int(k),) for k in ks], "k long")
    return (
        census.crossJoin(F.broadcast(ks_df))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("n") < F.col("k")).cast("long")).alias("groups_below"),
            F.sum(
                F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(F.lit(0))
            ).alias("rows_below"),
        )
    )


def t_closeness_census(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    ordered: bool = True,
) -> DataFrame:
    """t-closeness (Li et al. 2007) — the third rung of the release
    ladder after k-anonymity and l-diversity: a quasi-group leaks
    when its SENSITIVE-value distribution diverges from the global
    one, even if it is large and diverse. For an ORDERED sensitive
    attribute the distance is the Earth Mover's Distance over the
    value order, EMD = (1/(m−1))·Σ_i |Σ_{j≤i} (p_j − q_j)| with m
    distinct values; for ``ordered=False`` the variational distance
    (1/2)·Σ|p_j − q_j| applies.

    INTEGER-EXACT: probabilities are rationals (group count / group
    size; global count / N), so every cumulative difference
    cross-multiplies to |cum_g·N − cum·n_g| and the census emits the
    integer numerator ``dist_num`` with its closed denominator —
    EMD = dist_num / ((m−1)·n_g·N), variational = dist_num/(2·n_g·N)
    — value-hashable cross-engine, threshold decisions downstream.

    Scale shape: one (quasi…, sensitive) census, one sensitive-keyed
    global census (broadcast — ≤ |domain| rows), one cumulative
    window over the sensitive ORDER within each group (partition =
    the quasi key), one final group fold. No UDFs, no collects; the
    sensitive domain is the only driver-visible size and it is a
    column domain, not the corpus. NULL sensitive values form their
    own ordered-first category (Spark asc NULLS FIRST) — exclude them
    upstream if that is not the release semantics."""
    quasi = list(quasi_cols)
    cell = df.groupBy(*quasi, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    glob = df.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("__gc")
    )
    n_total = df.count()
    m_vals = glob.count()
    # every (group, sensitive) pair must exist so cumulative sums see
    # zero-count cells: cross the group roster with the global domain
    groups = cell.groupBy(*quasi).agg(F.sum("__c").cast("long").alias("__ng"))
    full = (
        groups.crossJoin(F.broadcast(glob))
        .join(cell, [*quasi, sensitive_col], "left")
        .select(
            *quasi, sensitive_col, "__ng", "__gc",
            F.coalesce("__c", F.lit(0)).alias("__c"),
        )
    )
    w = (
        Window.partitionBy(*quasi)
        .orderBy(F.col(sensitive_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = full.select(
        *quasi, "__ng",
        F.abs(
            F.sum("__c").over(w) * F.lit(int(n_total))
            - F.sum("__gc").over(w) * F.col("__ng")
        ).alias("__step") if ordered else
        F.abs(
            F.col("__c") * F.lit(int(n_total))
            - F.col("__gc") * F.col("__ng")
        ).alias("__step"),
    )
    return (
        cum.groupBy(*quasi)
        .agg(
            F.max("__ng").alias("n"),
            F.sum("__step").cast("long").alias("dist_num"),
        )
        .withColumn("n_total", F.lit(int(n_total)).cast("long"))
        .withColumn("m_values", F.lit(int(m_vals)).cast("long"))
    )
