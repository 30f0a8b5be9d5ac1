"""Data-layout clustering — Z-order (Morton) keys + pruning stats.

At 100 TB the dominant read cost is scan volume, and the lever is
LAYOUT: parquet row-group min/max stats prune a scan only if rows
with nearby values sit in the same files. Sorting clusters ONE
column; multi-dimensional workloads (filter by customer AND date)
need a space-filling curve — write the data range-partitioned and
sorted by a Z-order key and every dimension's min/max ranges stay
narrow per file, so predicate pushdown skips most of them (the
Delta/Iceberg OPTIMIZE ZORDER machinery, expressed as one column).

Everything here is exact integer bit algebra (shift/and/or), so the
key and the pruning census value-hash against a SQL twin; no UDF,
no shuffle — the key is map-only, the census is one aggregation.

Usage shape for writes::

    df.withColumn("z", zorder_key(...cols...)) \
      .repartitionByRange(n_files, "z").sortWithinPartitions("z") \
      .write.parquet(path)

(repartitionByRange samples boundaries — deterministic layout, not
deterministic file assignment, which is why the WRITE itself is not
an oracle row; the key and the skip-effectiveness census are.)
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_key(cols: Sequence[Column], bits: int) -> Column:
    """Morton interleave: bit i of column c lands at position
    ``i*len(cols) + c`` of the key. Every input must already be an
    integer in ``[0, 2**bits)`` — map/bucket upstream (e.g.
    ``value % 2**bits`` or a width-bucketed timestamp); out-of-range
    bits are silently masked off (the key stays well-defined, the
    clustering quality degrades for those rows). ``bits *
    len(cols)`` must fit a signed long (≤ 63)."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: no columns")
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: {bits} bits x {n} cols = {bits * n} > 63 "
            "key bits; lower bits or drop a dimension"
        )
    key = F.lit(0).cast("long")
    for c_idx, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            bit = F.shiftrightunsigned(cl, i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + c_idx))
    return key


def zorder_key_sql(col_names: Sequence[str], bits: int) -> str:
    """The SAME interleave as a portable SQL expression (the oracle
    twin — generated from one loop so the two cannot drift)."""
    n = len(col_names)
    terms = []
    for c_idx, name in enumerate(col_names):
        for i in range(bits):
            terms.append(
                f"((({name} >> {i}) & 1) << {i * n + c_idx})"
            )
    return " | ".join(terms)


def zorder_pruning_stats(
    df: DataFrame,
    cols: Sequence[str],
    bits: int,
    prefix_bits: int,
) -> DataFrame:
    """Skip-effectiveness census: bucket rows by the top
    ``prefix_bits`` of their Z-key (a bucket ≈ one file of the
    range-partitioned write) and report each bucket's per-dimension
    min/max plus row count — exactly the parquet footer stats a
    pruned scan would consult. Narrow ranges = effective skipping;
    compare against the same census bucketed by a single-column sort
    to quantify what the curve buys. One aggregation pass."""
    z = zorder_key([F.col(c) for c in cols], bits)
    total = bits * len(cols)
    if not 0 < prefix_bits <= total:
        raise ValueError(
            f"prefix_bits must be in [1, {total}] (got {prefix_bits})"
        )
    bucket = F.shiftrightunsigned(z, total - prefix_bits)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(bucket.alias("bucket")).agg(*aggs)


# ------------------------------------------------------------ Hilbert

def hilbert_key_2d(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int,
    out: str = "hkey",
) -> DataFrame:
    """Hilbert-curve distance for 2-D layout clustering — the better
    space-filling curve: consecutive keys are always MANHATTAN
    NEIGHBORS (|Δx|+|Δy| = 1), so range-partitioned files get tighter
    per-dimension min/max bounds than Z-order's jump-prone quadrant
    walk (what Databricks liquid clustering moved to). Inputs must be
    integers in [0, 2**bits); out-of-range values raise downstream of
    the masked AND only in the sense of degraded clustering, exactly
    like ``zorder_key``.

    The classic xy→d walk rebinds x/y each step (conditional
    flip+swap), so this is a DataFrame transformer, not a pure
    Column: each of the ``bits`` steps is one NAMED projection, which
    keeps the plan linear in ``bits`` instead of the 4^bits blow-up a
    single nested expression would suffer. Map-only, integer-exact,
    no UDF; ``hilbert_key_sql`` generates the identical chain as
    nested SQL selects for the oracle."""
    if not 1 <= int(bits) <= 31:
        raise ValueError(f"bits must be 1..31, got {bits}")
    for c in ("__hx", "__hy", "__hd", out):
        if c in df.columns:
            raise ValueError(
                f"hilbert_key_2d reserves the column name {c!r}; "
                "rename it first (or pick another `out`)"
            )
    cur = df.select(
        "*",
        F.col(xcol).cast("long").alias("__hx"),
        F.col(ycol).cast("long").alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    for step in range(int(bits) - 1, -1, -1):
        s = 1 << step
        x, y = F.col("__hx"), F.col("__hy")
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        fx = F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)
        fy = F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)
        cur = cur.select(
            *[c for c in cur.columns if c not in ("__hx", "__hy", "__hd")],
            F.when(ry == 0, fy).otherwise(x).alias("__hx"),
            F.when(ry == 0, fx).otherwise(y).alias("__hy"),
            (
                F.col("__hd")
                + F.lit(s).cast("long") * F.lit(s)
                * ((F.lit(3) * rx).bitwiseXOR(ry)).cast("long")
            ).alias("__hd"),
        )
    return cur.drop("__hx", "__hy").withColumnRenamed("__hd", out)


def hilbert_key_sql(xexpr: str, yexpr: str, bits: int) -> str:
    """The SAME walk as nested SQL subqueries (oracle twin — one
    generator loop, so the two cannot drift). Returns a subquery
    fragment exposing columns (x0, y0, hkey) where x0/y0 echo the
    inputs; embed as ``... FROM {hilbert_key_sql(...)} t``."""
    inner = f"(SELECT {xexpr} AS x0, {yexpr} AS y0, " \
            f"{xexpr} AS hx, {yexpr} AS hy, CAST(0 AS BIGINT) AS hd FROM __SRC__)"
    for step in range(int(bits) - 1, -1, -1):
        s = 1 << step
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        fx = f"(CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END)"
        fy = f"(CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END)"
        inner = (
            "(SELECT x0, y0, "
            f"CASE WHEN {ry} = 0 THEN {fy} ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN {fx} ELSE hy END AS hy, "
            f"hd + {s * s} * CAST(xor(3 * {rx}, {ry}) AS BIGINT) AS hd "
            f"FROM {inner} __h{step})"
        )
    return (
        f"(SELECT x0, y0, hd AS hkey FROM {inner} __hfin)"
    )


def hilbert_pruning_stats(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int,
    prefix_bits: int,
) -> DataFrame:
    """The ``zorder_pruning_stats`` census over the Hilbert key:
    bucket by the top ``prefix_bits`` of the key, report per-bucket
    row count and per-dimension min/max — the parquet-footer view of
    what the curve buys."""
    total = 2 * int(bits)
    if not 0 < int(prefix_bits) <= total:
        raise ValueError(
            f"prefix_bits must be in [1, {total}] (got {prefix_bits})"
        )
    keyed = hilbert_key_2d(df, xcol, ycol, bits, out="__hk")
    bucket = F.shiftrightunsigned(F.col("__hk"), total - int(prefix_bits))
    return keyed.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(xcol).alias(f"min_{xcol}"),
        F.max(xcol).alias(f"max_{xcol}"),
        F.min(ycol).alias(f"min_{ycol}"),
        F.max(ycol).alias(f"max_{ycol}"),
    )
