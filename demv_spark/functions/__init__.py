from demv_spark.functions.counting import (
    conditional_counts,
    distinct_values,
    group_census,
    group_weights,
)
from demv_spark.functions.compat import stable_avg, stable_sum
from demv_spark.functions import metrics

__all__ = [
    "conditional_counts",
    "distinct_values",
    "group_census",
    "group_weights",
    "stable_avg",
    "stable_sum",
    "metrics",
]
