"""Declarative dataset-preparation specs — the engine's equivalent of
the reference's per-dataset loader functions (getdataset.py:9-545).

Each reference loader is a linear recipe: scan → row filters → value
recodes → threshold binarizations → binning/encoding → label
construction → drop columns. ``DatasetSpec`` captures that recipe as
data; ``load`` compiles it to one DataFrame plan (every step is a
narrow column transform, so Catalyst fuses the whole recipe into the
scan projection — a single pass at any scale).

The reference's nine concrete recipes depend on its bundled CSVs; the
spec below reproduces their *shapes* (see tests for a cmc-like
example), and the vocabulary covers every operation the nine loaders
use: P2/P4 (filter), P6/P7 (recode), P8 (binarize), F1/F2 (binning),
F3 (one-hot), F4 (label-encode), F5 (z-score), F6 (quantile label),
P1/P10 (drops).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from demv_spark.operators import etl


@dataclass
class DatasetSpec:
    """Recipe steps, applied in order. Each entry mirrors one loader
    idiom from getdataset.py."""

    filter_sql: str | None = None                       # P2/P4
    recodes: dict[str, dict] = field(default_factory=dict)          # P7
    conditional_recodes: list[tuple[str, str, Any]] = field(default_factory=list)  # P6: (col, pred_sql, value)
    binarize: dict[str, float] = field(default_factory=dict)        # P8
    fixed_bins: dict[str, tuple[list, list]] = field(default_factory=dict)  # F1: col -> (splits, labels)
    quantile_bins: dict[str, int] = field(default_factory=dict)     # F2
    one_hot: dict[str, list] = field(default_factory=dict)          # F3
    label_encode: list[str] = field(default_factory=list)           # F4
    zscore: list[str] = field(default_factory=list)                 # F5
    quantile_label: tuple[str, int] | None = None                   # F6: (col, n_classes)
    drop: list[str] = field(default_factory=list)                   # P1
    drop_strings: bool = False                                      # P10
    dropna: bool = False                                            # P5
    sensitive: list[str] = field(default_factory=list)
    label: str = "y"
    positive_label: Any = 1


def load(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    """Compile a spec into one DataFrame plan over ``df``."""
    out = df
    if spec.filter_sql:
        out = out.filter(spec.filter_sql)
    if spec.dropna:
        out = etl.drop_na_rows(out)
    for col, mapping in spec.recodes.items():
        out = etl.recode_map(out, col, mapping)
    for col, pred_sql, value in spec.conditional_recodes:
        out = etl.recode_when(out, col, F.expr(pred_sql), value)
    for col, threshold in spec.binarize.items():
        out = etl.binarize(out, col, threshold)
    for col, (splits, labels) in spec.fixed_bins.items():
        out = etl.bucketize(out, col, splits, labels, out=col)
    for col, n in spec.quantile_bins.items():
        out = etl.quantile_bucketize(out, col, n, out=col)
    for col, values in spec.one_hot.items():
        out = etl.one_hot(out, col, values)
    for col in spec.label_encode:
        out = etl.label_encode(out, col, out=col + "_enc")
        out = out.drop(col).withColumnRenamed(col + "_enc", col)
    if spec.zscore:
        out = etl.zscore(out, spec.zscore)
    if spec.quantile_label:
        col, n = spec.quantile_label
        out = etl.quantile_label(out, col, n, out=spec.label)
    if spec.drop:
        out = out.drop(*spec.drop)
    if spec.drop_strings:
        out = etl.drop_string_cols(out)
    return out
