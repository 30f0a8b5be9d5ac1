from demv_spark.ml.evaluation import (
    assign_folds,
    build_classifier,
    cross_val,
    metrics_report,
    out_of_fold_predictions,
)

__all__ = [
    "assign_folds",
    "build_classifier",
    "cross_val",
    "metrics_report",
    "out_of_fold_predictions",
]
