"""Data-contract validation — expectation checks for training tables.

Before a 100 TB corpus feeds a training run you assert its contract:
required columns non-null, values in range/set, keys unique, strings
well-formed. The engine shape matters more than the checks
themselves: ALL scalar expectations evaluate in ONE fused aggregate
pass (each rule is a violation predicate summed as a conditional
count — the same fusion the metric suite uses), never one scan per
rule; uniqueness — the one inherently keyed check — is its own
single-shuffle census.

Rules are plain violation predicates (Column → TRUE when the row
VIOLATES), so the vocabulary is open: compose any column algebra.
Helpers cover the standard contract checks.

Row-level twin: ``flag_violations`` annotates each row with the
array of rule names it fails — flags, never filters, so quarantine/
repair pipelines downstream choose the policy.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


# ---- rule helpers (violation predicates) ----

def not_null(col: str) -> Column:
    """Violated when NULL."""
    return F.col(col).isNull()


def in_range(col: str, lo, hi) -> Column:
    """Violated when outside [lo, hi] (NULL passes — combine with
    not_null to require presence; SQL BETWEEN semantics)."""
    c = F.col(col)
    return c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))


def in_set(col: str, values: Sequence) -> Column:
    """Violated when non-NULL and outside the allowed set."""
    c = F.col(col)
    return c.isNotNull() & ~c.isin(list(values))


def matches(col: str, pattern: str) -> Column:
    """Violated when non-NULL and the regex finds NO match — SQL
    rlike/``regexp_matches`` SUBSTRING-search semantics, not full
    match: anchor with ``^...$`` when the whole value must conform
    (the oracle twin is DuckDB ``regexp_matches``, same semantics)."""
    c = F.col(col)
    return c.isNotNull() & ~c.rlike(pattern)


def non_empty(col: str) -> Column:
    """Violated when NULL or '' (strings) — the corpus hygiene floor."""
    c = F.col(col)
    return c.isNull() | (c.cast("string") == "")


# ---- evaluation ----

def expectation_report(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """(rule, violations, n_rows) per rule — ONE aggregate pass for
    the whole contract (map-side partial counts; the scan is shared
    by every rule). Deterministic long form via posexplode of the
    fused counters, ordered by rule name at the caller's discretion."""
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(pred.cast("long")).alias(f"__v{i}")
        for i, pred in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(name).alias("rule"),
            F.coalesce(F.col(f"__v{i}"), F.lit(0)).cast("long").alias("violations"),
        )
        for i, name in enumerate(names)
    ])
    return wide.select(
        F.explode(pairs).alias("r"), F.col("__n").cast("long").alias("n_rows")
    ).select("r.rule", "r.violations", "n_rows")


def flag_violations(
    df: DataFrame, rules: Mapping[str, Column], out: str = "violations"
) -> DataFrame:
    """Row-level contract annotation: ``out`` = sorted array of the
    rule names this row violates (empty array = clean). Map-only;
    flags, never filters."""
    if out in df.columns:
        raise ValueError(f"flag_violations: column {out!r} already exists")
    arr = F.array_sort(
        F.filter(
            F.array(*[
                F.when(pred, F.lit(name)).otherwise(F.lit(None))
                for name, pred in rules.items()
            ]),
            lambda x: x.isNotNull(),
        )
    )
    return df.withColumn(out, arr)


def duplicate_key_report(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Uniqueness census for a prospective primary key: one row
    (n_rows, n_keys, n_dup_keys, n_dup_rows) — all exact BIGINTs from
    a single key-census shuffle. n_dup_rows counts every row that
    shares its key (the rows a dedup would have to adjudicate)."""
    census = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    zero = F.lit(0).cast("long")
    return census.agg(
        F.coalesce(F.sum("n").cast("long"), zero).alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.coalesce(
            F.sum((F.col("n") > 1).cast("long")), zero
        ).alias("n_dup_keys"),
        F.coalesce(
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).cast("long"),
            zero,
        ).alias("n_dup_rows"),
    )
