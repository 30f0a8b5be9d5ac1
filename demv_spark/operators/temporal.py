"""Temporal join operators — as-of joins, which Spark's DataFrame API
lacks (SURVEY.md custom-operator category: compose from existing ops
when semantics allow).

The naive as-of formulation is a range join (l.ts >= r.ts) + per-row
argmax — O(|L|·|R|) within each key in Spark's nested-loop fallback.
The scalable form used here is the UNION + windowed last_value trick:
tag both sides, union them, sort each key group once by (ts, side),
and carry the right side's payload forward with last_value(...,
ignoreNulls) — ONE shuffle on the key, linear work, no join node at
all. This is the standard large-scale as-of pattern (time-series
stores implement exactly this under the name "asof join").
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: every left row gains the ``value_cols`` of the
    nearest right row within the same ``by`` keys — the LATEST with
    ``right.ts <= left.ts`` (direction='backward', default) or the
    EARLIEST with ``right.ts >= left.ts`` ('forward'); NULL when no
    such right row exists.

    Equivalent to DuckDB ``ASOF LEFT JOIN ... ON by AND l.ts >= r.ts``
    (backward) / ``l.ts <= r.ts`` (forward) — the oracle. Right rows
    should be unique per (by, ts) — pre-aggregate otherwise, or the
    carried value at a tied timestamp is engine-dependent.

    Plan: union of the two tagged sides → window over (by) ordered by
    (ts, side) with the side tiebreak placing right rows on the
    matching side of equal timestamps (inclusive boundary) → carry the
    right payload with last/first(ignoreNulls) over the trailing/
    leading frame → filter back to left rows. One exchange on the key
    columns; no join operator, no range explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    lcols = [c for c in left.columns]
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__rv_{v}") for v in value_cols],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (*by, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__rv_{v}") for v in value_cols],
    )
    u = tagged_l.unionByName(tagged_r)
    if direction == "backward":
        # right (side 0) sorts before left at equal ts → inclusive
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts_col), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)
    else:
        # right sorts after left at equal ts → inclusive looking ahead
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts_col), F.desc("__side"))
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)
    carried = u.select(
        *lcols,
        "__side",
        *[carry(F.col(f"__rv_{v}")).alias(f"{v}{suffix}") for v in value_cols],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
