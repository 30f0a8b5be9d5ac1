"""Synthetic oversampling strategies — SURVEY.md §2.5 D11.

The replication scripts' extended API supports
``strategy ∈ {uniform, smote, adasyn}`` (generatemetrics.py:57,133;
uniform is the only one in the shipped library; smote/adasyn came
from imbalanced-learn). Here both synthetic strategies are
implemented natively (imblearn is not a dependency): per-group
k-NN interpolation inside a grouped ``applyInPandas`` — the Arrow
grouped-map path, which is the right Spark shape because every
(sensitive…, label) group must see all its own rows to pick
neighbors, and groups are partitions of a classification table
(bounded size by construction).

Undersampling is shared with the uniform strategy (random exact
deletion); only the oversample delta is synthesized.

Scale path: if a single group outgrows an executor, swap the in-group
exact k-NN for an LSH neighbor join (BucketedRandomProjectionLSH) —
interface kept identical.
"""

from __future__ import annotations

import zlib
from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from demv_spark.operators.balancer import rebalance


def _interpolate_group(
    pdf: pd.DataFrame,
    n_new: int,
    feature_cols: list[str],
    k: int,
    seed: int,
    adaptive: bool,
) -> pd.DataFrame:
    """SMOTE-style synthesis: new = x + gap·(neighbor − x) over the
    numeric feature space. ``adaptive=True`` (ADASYN flavor) biases
    the base-point choice toward sparser points (larger mean k-NN
    distance) instead of uniform."""
    rng = np.random.RandomState(seed)
    x = pdf[feature_cols].to_numpy(dtype=float)
    n = len(x)
    if n == 1:
        # degenerate group: duplicate the single row
        return pdf.iloc[np.zeros(n_new, dtype=int)].copy()
    kk = min(k, n - 1)
    # exact in-group kNN (groups are bounded; see module docstring)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn_idx = np.argsort(d2, axis=1)[:, :kk]

    if adaptive:
        density = np.sqrt(np.take_along_axis(d2, nn_idx, 1)).mean(axis=1)
        w = density / density.sum() if density.sum() > 0 else None
        base = rng.choice(n, size=n_new, p=w)
    else:
        base = rng.randint(0, n, size=n_new)
    neigh = nn_idx[base, rng.randint(0, kk, size=n_new)]
    gap = rng.uniform(size=(n_new, 1))
    synth_x = x[base] + gap * (x[neigh] - x[base])

    out = pdf.iloc[base].copy().reset_index(drop=True)
    for j, c in enumerate(feature_cols):
        vals = synth_x[:, j]
        if not pd.api.types.is_float_dtype(pdf[c]):
            # integer feature: interpolation rounds back to the domain
            vals = np.rint(vals)
        out[c] = vals.astype(pdf[c].dtype, copy=False)
    return out


def synthetic_rebalance(
    df: DataFrame,
    sensitive: Sequence[str],
    label: str,
    targets: list[dict],
    strategy: str = "smote",
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Rebalance with synthetic oversampling (smote/adasyn):
    shrinking groups use the exact random-deletion path (shared with
    uniform); growing groups keep all original rows and append
    interpolated synthetic rows up to the target."""
    keys = [*sensitive, label]
    feature_cols = [
        f.name
        for f in df.schema.fields
        if f.name not in keys
        and f.dataType.typeName() in ("double", "float", "integer", "long", "short")
    ]
    if not feature_cols:
        raise ValueError("no numeric feature columns to interpolate")

    shrink = [t for t in targets if t["target"] <= t["n"]]
    grow = [t for t in targets if t["target"] > t["n"]]

    out = rebalance(df, sensitive, label, shrink, seed=seed) if shrink else None

    if grow:
        from demv_spark.operators.balancer import _join_targets

        grow_df = _join_targets(df, keys, grow)
        adaptive = strategy == "adasyn"

        def synth(pdf: pd.DataFrame) -> pd.DataFrame:
            n_new = int(pdf["__target"].iloc[0] - pdf["__n"].iloc[0])
            base = pdf.drop(columns=["__n", "__target"])
            if n_new <= 0:
                return base
            # stable per-group seed (python hash() is process-dependent)
            key_repr = repr(tuple(pdf[k2].iloc[0] for k2 in keys)).encode()
            gseed = (seed + zlib.crc32(key_repr)) % (2**31)
            new_rows = _interpolate_group(base, n_new, feature_cols, k, gseed, adaptive)
            return pd.concat([base, new_rows], ignore_index=True)

        grown = grow_df.groupBy(*keys).applyInPandas(synth, schema=df.schema)
        out = grown if out is None else out.unionByName(grown)
    return out if out is not None else df.limit(0)
