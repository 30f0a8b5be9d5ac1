"""Post-processing prediction balancers — SURVEY.md §2.6 E9.

The reference optionally applies post-hoc "blackbox" balancers to the
prediction table (utils.py:362-379; the `balancers` package is not
shipped). The engine-native equivalent is per-group threshold
adjustment over a score column: pure window/when expressions, one
pass, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def group_threshold_adjust(
    df: DataFrame,
    unpriv: Column,
    score_col: str,
    priv_threshold: float,
    unpriv_threshold: float,
    out: str = "prediction_adj",
) -> DataFrame:
    """Binary re-thresholding with a group-dependent cutoff —
    the classic reject-option post-processor shape."""
    thr = F.when(unpriv, F.lit(unpriv_threshold)).otherwise(F.lit(priv_threshold))
    return df.withColumn(out, (F.col(score_col) >= thr).cast("int"))


def equalize_positive_rates(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    rate: float,
    out: str = "prediction_adj",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Set each group's positive rate to exactly ``rate``: rank scores
    within each group, mark the top ceil(rate·n) positive. Pass
    ``tiebreak`` columns for a total order when scores can tie
    (determinism/oracle contract). One window pass per group
    partition; skewed groups can reuse the balancer's salted rank if
    ever needed."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), *[F.col(t) for t in tiebreak]
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    rn = F.row_number().over(w)
    return df.withColumn(out, (rn <= F.ceil(n * F.lit(rate))).cast("int"))
