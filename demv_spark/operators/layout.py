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
