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
) -> DataFrame:
    """Backward as-of join: every left row gains the ``value_cols`` of
    the LATEST right row with ``right.ts <= left.ts`` within the same
    ``by`` keys (NULL when no prior right row exists).

    Equivalent to DuckDB ``ASOF LEFT JOIN ... ON by AND l.ts >= r.ts``
    (the oracle). Right rows should be unique per (by, ts) — pre-
    aggregate otherwise, or the carried value at a tied timestamp is
    engine-dependent.

    Plan: union of the two tagged sides → window over (by) ordered by
    (ts, side asc: right rows sort before left at equal ts, making the
    match inclusive) → filter back to left rows. One exchange on the
    key columns; no join operator, no range explosion.
    """
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
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols,
        "__side",
        *[
            F.last(F.col(f"__rv_{v}"), ignorenulls=True)
            .over(w)
            .alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
