"""Counting core — SURVEY.md §2.4 A1–A4.

The reference's workhorse is the conditional count
(``len(df.query(...))`` at utils.py:26-29, helpers.py:52-54). It
re-scans the pandas table once per count; here every family of counts
is fused into ONE aggregate pass (partial+final hash aggregation,
whole-stage codegen — no Python in the loop), which is the shape that
survives a 100 TB scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def group_census(df: DataFrame, keys: Sequence[str], count_col: str = "n") -> DataFrame:
    """All non-empty key combinations with sizes, in one shuffle.

    Replaces the reference's recursive depth-first group enumeration
    (demv/helpers.py:63-106, 2^k pandas slices) with a single
    ``groupBy`` — Catalyst does partial aggregation map-side, so the
    shuffle carries only one row per (partition, group).
    """
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_col))


def conditional_counts(df: DataFrame, preds: Mapping[str, Column]) -> DataFrame:
    """Fused conditional counts: {name: predicate} → single-row DataFrame.

    Equivalent of N separate ``len(df.query(...))`` scans
    (reference utils.py:26-29,37-60) collapsed into one pass:
    ``agg(count_if(p1), count_if(p2), ...)``. SQL oracle form:
    ``COUNT(*) FILTER (WHERE p)``.
    """
    aggs = [
        F.sum(F.when(p, F.lit(1)).otherwise(F.lit(0))).cast("long").alias(name)
        for name, p in preds.items()
    ]
    return df.agg(F.count(F.lit(1)).alias("n_total"), *aggs)


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """Distinct values of a column (reference helpers.py:50 np.unique)."""
    return df.select(col).distinct()


def group_weights(
    df: DataFrame,
    sensitive: Sequence[str],
    label: str,
    round_level: int | None = 1,
) -> DataFrame:
    """Per-(sensitive…, label) expected/observed weights + disparity.

    Semantics of demv/helpers.py:50-57 with the crucial invariant that
    the expected weight is a product of *marginal* frequencies frozen
    on the original table::

        w_exp = (|S=s| / N) * (|y=l| / N)      (helpers.py:53)
        w_obs = |S=s ∧ y=l| / N                (helpers.py:54)
        disparity = round(w_exp / w_obs, round_level)  (helpers.py:10)

    Plan shape: ONE full-table groupBy(sensitive…, label) census —
    the base table is scanned exactly once. The three marginals are
    WINDOW sums over the tiny census (separate aggregation subtrees
    would each re-scan the base table: Spark's shuffle reuse only
    fires on identical exchange subtrees, so a join-based combine
    costs 4 scans). The unpartitioned n_total window is CENSUS-ONLY
    by contract: its input is always the ≤ Π|domains| census rows,
    never the raw table, so the WindowExec single-task sort it
    implies is bounded — pinned executable in
    tests/test_plan_quality.py::test_group_weights_windows_are_census_only.
    Columns: sensitive…, label, n, n_sens, n_label,
    n_total, w_exp, w_obs, disparity.
    """
    from pyspark.sql import Window

    census = group_census(df, [*sensitive, label], count_col="n")
    out = census.select(
        "*",
        F.sum("n").over(Window.partitionBy(*sensitive)).alias("n_sens"),
        F.sum("n").over(Window.partitionBy(label)).alias("n_label"),
        F.sum("n").over(Window.partitionBy()).alias("n_total"),
    )
    w_exp = (F.col("n_sens") / F.col("n_total")) * (F.col("n_label") / F.col("n_total"))
    w_obs = F.col("n") / F.col("n_total")
    disparity = w_exp / w_obs
    if round_level:
        disparity = F.round(disparity, round_level)
    return out.select(
        *sensitive,
        label,
        "n",
        "n_sens",
        "n_label",
        "n_total",
        w_exp.alias("w_exp"),
        w_obs.alias("w_obs"),
        disparity.alias("disparity"),
    )


def merge_census(
    censuses: Sequence[DataFrame], keys: Sequence[str], count_col: str = "n"
) -> DataFrame:
    """Incremental census maintenance: combine per-shard/per-batch
    censuses into the global one by summing counts per group — the
    append path for a 100 TB corpus, where re-scanning everything to
    rebalance after loading one shard is the anti-pattern. Censuses
    are tiny (≤ Π|domains| rows each), so this is a union of small
    tables + one shuffle of |groups| rows, independent of corpus size.

    Algebra: group counts are a commutative monoid under per-key sum,
    so census(A ∪ B) == merge(census(A), census(B)) exactly — the
    oracle-checkable identity. Deletions: pass a census with negated
    counts.
    """
    if not censuses:
        raise ValueError("merge_census needs at least one census")
    out = censuses[0]
    for c in censuses[1:]:
        out = out.unionByName(c)
    return out.groupBy(*keys).agg(F.sum(count_col).alias(count_col))


def distinct_sketch_rollup(
    df: DataFrame,
    value_col: str,
    bucket_col: Column | str,
    lgk: int = 12,
) -> DataFrame:
    """Mergeable distinct-count sketches per bucket (Datasketches HLL):
    (bucket, sketch, estimate). The 100 TB distinct pattern — exact
    COUNT(DISTINCT) needs a full shuffle of the values per re-ask,
    while HLL sketches aggregate map-side into ~2^lgk bytes, persist
    next to the census, and re-merge to any coarser grain without
    touching raw data (see merge_distinct_sketches).
    """
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    return (
        df.groupBy(b.alias("bucket"))
        .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"))
        .withColumn("estimate", F.hll_sketch_estimate("sketch"))
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    bucket_expr: Column,
) -> DataFrame:
    """Re-merge per-bucket HLL sketches to a coarser grain (the sketch
    twin of merge_census/cascade_rollup): HLL union is associative and
    commutative, so estimate(union(daily)) == estimate(weekly-from-raw)
    EXACTLY — not just approximately — because both sides hold the
    identical sketch state."""
    return (
        sketches.groupBy(bucket_expr.alias("bucket"))
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .withColumn("estimate", F.hll_sketch_estimate("sketch"))
    )


def heavy_hitters(
    df: DataFrame, keys: Sequence[str], top_k: int = 10
) -> DataFrame:
    """Top-k most frequent key values with exact counts and a dense
    rank — the first question to ask a prospective join/groupBy key
    before committing a 100 TB shuffle to it (is one customer/domain/
    day going to own a straggler task? how bad is the head?).

    Plan: one key census (the same map-side-combined shuffle the
    eventual join would pay), then a DISTRIBUTED top-k —
    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject, a
    per-partition heap + driver merge of k·n_partitions rows, NOT a
    global sort (a global-ordered window here would serialize the
    whole key census into one task). The rank window runs over the
    k surviving rows only. Ties break by key ascending with NULLS
    LAST (Spark's ascending default is nulls-first, SQL engines'
    is nulls-last — pinned explicitly so the output is deterministic
    AND SQL-oracle-able when a NULL-keyed group ties at the top_k
    boundary). NULL key values form their own group, mirroring SQL
    GROUP BY. The window's census-and-limit-bounded input is pinned
    executable in tests/test_plan_quality.py::
    test_heavy_hitters_window_is_census_and_limit_bounded.
    """
    from pyspark.sql import Window

    kcols = [F.asc_nulls_last(k) for k in keys]
    census = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    top = census.orderBy(F.desc("n"), *kcols).limit(top_k)
    w = Window.orderBy(F.desc("n"), *kcols)
    return top.withColumn("rank", F.row_number().over(w))


def key_skew_profile(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """One-row skew census of a key: (n_rows, n_keys, max_n, min_n)
    — all exact BIGINTs (skew ratio = max_n · n_keys / n_rows derives
    downstream without a float crossing the engine boundary). The
    numbers that decide salting (`skew_salt=` on cap_per_key /
    postprocess quota) and AQE skew-join thresholds. Cost: the key
    census shuffle + a tiny global fold."""
    census = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    # coalesce: sum/max/min over an EMPTY census are NULL — an empty
    # input must still honor the all-BIGINT contract (0,0,0,0)
    zero = F.lit(0).cast("long")
    return census.agg(
        F.coalesce(F.sum("n").cast("long"), zero).alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.coalesce(F.max("n"), zero).alias("max_n"),
        F.coalesce(F.min("n"), zero).alias("min_n"),
    )


def windowed_heavy_hitters(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    bucket: str = "1 hour",
    top_k: int = 10,
    prune_salt: int = 16,
) -> DataFrame:
    """Trending keys per time bucket: the top-k most frequent key
    values within every tumbling window — ops dashboards, trending
    content, per-hour hot-domain reports.

    Scale shape: after the (bucket, keys) census, the per-bucket
    top-k is computed in TWO phases so no single task ever ranks a
    bucket's full key set — a local rank within (bucket,
    hash(keys) mod prune_salt) keeps only k candidates per salt
    (every true top-k key wins its own salt partition, so pruning is
    lossless), then the final rank orders ≤ prune_salt·k rows per
    bucket. Ordering is (n desc, keys asc NULLS LAST) — deterministic
    and SQL-oracle-able, same contract as ``heavy_hitters``.

    Returns (bucket_start long epoch-seconds, keys…, n, rank ≤ k).
    """
    from demv_spark.operators.temporal import _interval_seconds, bucket_index
    from pyspark.sql import Window

    width = _interval_seconds(bucket)
    b = bucket_index(ts_col, bucket)
    kcols = [F.asc_nulls_last(k) for k in keys]
    census = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy((b * F.lit(width)).alias("bucket_start"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salt = F.pmod(
        F.xxhash64(*[F.col(k).cast("string") for k in keys]), F.lit(prune_salt)
    )
    w_local = Window.partitionBy("bucket_start", salt).orderBy(
        F.desc("n"), *kcols
    )
    pruned = census.withColumn("__lr", F.row_number().over(w_local)).filter(
        F.col("__lr") <= top_k
    )
    w_final = Window.partitionBy("bucket_start").orderBy(F.desc("n"), *kcols)
    return (
        pruned.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= top_k)
        .drop("__lr")
    )


def census_cube(
    df: DataFrame,
    dims: Sequence[str],
    unit_col: "str | None" = None,
    sets: str = "cube",
) -> DataFrame:
    """OLAP cube/rollup census: exact counts (plus an
    order-independent unit sum) for every grouping set of ``dims`` in
    ONE pass — the dataset-card rollup (per-source × per-lang ×
    total in a single job). ``sets="cube"`` covers all 2^d subsets,
    ``"rollup"`` the d+1 hierarchical prefixes.

    ``gid`` is the SQL-standard grouping bitmask (bit = 1 when that
    dim is aggregated away), which disambiguates a REAL NULL
    dimension value from an aggregated-away dimension — Spark's
    grouping_id() and DuckDB's GROUPING() emit the identical mask
    (parity pinned by the q_olap_census_cube oracle).

    Scale: Spark evaluates CUBE/ROLLUP by expanding each input row to
    its grouping sets ahead of ONE partially-aggregated shuffle — map
    -side combine still applies, no per-set rescan of the input. The
    expansion factor is 2^d (cube) or d+1 (rollup): keep d small, as
    in any OLAP cube. The unit sum goes through the exact DECIMAL
    path (``stable_sum``) so float emission is canonical."""
    from demv_spark.functions.compat import stable_sum

    if sets not in ("cube", "rollup"):
        raise ValueError(f"sets must be 'cube' or 'rollup', got {sets!r}")
    base = df.cube(*dims) if sets == "cube" else df.rollup(*dims)
    aggs = [
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
    ]
    if unit_col is not None:
        aggs.append(stable_sum(unit_col).alias("units"))
    return base.agg(*aggs)
