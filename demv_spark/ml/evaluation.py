"""Evaluation harness — SURVEY.md §2.6 (E1–E7, E10–E11).

The reference evaluates debiasing with sklearn KFold(10, shuffle,
seed=2) + classifier train/predict per fold, collecting fairness
metrics per fold (utils.py:136-158, 242-261). Here:

- fold assignment is a COLUMN (seeded ntile over a random order —
  fold sizes match sklearn KFold exactly: the first n%k folds get the
  extra row), so per-fold train/test splits are plain filters that
  Catalyst prunes;
- classifiers are MLlib estimators (distributed fit/predict) behind
  the same four names the reference uses (generatemetrics.py:172-184);
- the featurized table is cached once before the k-fold loop — the
  reference re-slices an in-memory pandas frame, the Spark analogue
  is reuse of a cached DataFrame, not 10× ETL recompute;
- per-fold metrics are ONE fused aggregate each (fairness_suite), and
  the final report is mean ± std over the tiny per-fold table
  (A5/E10), with explode for list-valued cells (E11).

sklearn↔MLlib gaps (documented, SURVEY §7): GBTClassifier is
binary-only → multiclass falls back to RandomForest; LinearSVC gets
OneVsRest for multiclass; MLP needs explicit layer sizes. Metric
parity with the reference is tolerance-based, never bitwise.

The fairlearn ExponentiatedGradient reduction (E8) is implemented
Spark-natively in ml/eg.py (weightCol best responses + multiplicative
multiplier updates over the bounded-group-loss constraint); GridSearch
remains out of scope (a λ-grid sweep of the same machinery).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from demv_spark.functions import metrics as M


_warned_fold_default = False


def assign_folds(
    df: DataFrame,
    k: int = 10,
    seed: int = 2,
    fold_col: str = "fold",
    exact: bool | None = None,
    portable_key: Sequence[str] | None = None,
) -> DataFrame:
    """Seeded fold-assignment column (E4, utils.py:137,145-148).

    exact=False (the DEFAULT): pmod(hash, k) — shuffle-free, scales
    to any size, fold sizes only approximately equal. The default is
    the 100 TB plan (VERDICT r5: a default must not be the
    scale-killer); the reference-parity regimes below are opt-in.
    VERSIONING NOTE: the default FLIPPED from exact=True in round 6 —
    callers relying on the old default silently got hash folds
    instead of sklearn-KFold-equal sizes, so leaving ``exact``
    unspecified now emits a one-time warning (pass it explicitly to
    silence).

    exact=True: ntile(k) over rand(seed) — fold sizes identical to
    sklearn KFold (first n % k folds take the extra row). GLOBAL
    SORT: the whole table serializes through one ranking task —
    right only for datasets that fit a sort (the reference's regime).

    portable_key=[cols]: like exact=False but md5-based (compat.
    portable_hash) over the given key columns — shuffle-free AND
    reproducible in any SQL engine, so fold membership itself can be
    oracle-checked. SQL twin per row:
    ``CAST(concat('0x', substr(md5(concat_ws('|', key..., 'seed')),
    1, 15)) AS BIGINT) % k``."""
    if exact is None:
        global _warned_fold_default
        if not _warned_fold_default and portable_key is None:
            import warnings

            warnings.warn(
                "assign_folds: the default changed to exact=False "
                "(shuffle-free hash folds) in round 6; pass "
                "exact=True for sklearn-KFold-equal fold sizes or "
                "exact=False to silence this one-time warning",
                stacklevel=2,
            )
            _warned_fold_default = True
        exact = False
    if portable_key is not None:
        from demv_spark.functions.compat import portable_hash

        h = portable_hash(
            F.concat_ws("|", *[F.col(c) for c in portable_key], F.lit(str(seed)))
        )
        return df.withColumn(fold_col, F.pmod(h, F.lit(k)).cast("int"))
    if exact:
        w = Window.orderBy(F.rand(seed))
        return df.withColumn(fold_col, F.ntile(k).over(w) - 1)
    return df.withColumn(
        fold_col, F.pmod(F.xxhash64(F.struct(*df.columns), F.lit(seed)), k).cast("int")
    )


def assign_folds_stratified(
    df: DataFrame,
    label_col: str,
    k: int = 10,
    seed: int = 2,
    fold_col: str = "fold",
    key_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Stratified seeded fold assignment — sklearn StratifiedKFold's
    guarantee (every fold carries each label's share ±1 row) in
    shuffle-bounded form: within each label stratum, rows rank by the
    portable md5 hash of ``key_cols`` (default: all columns) and take
    ``fold = (rank − 1) mod k`` — round-robin, so per-(label, fold)
    counts differ by at most one, and membership is a pure function
    of the data (oracle-checkable, partitioning-independent).

    Scale shape: ONE window shuffle keyed on the label stratum. A
    huge stratum ranks in one task — same hazard and remedy as
    ``assign_folds(exact=True)``; prefer it only when class balance
    across folds matters (imbalanced labels, the usual reason), else
    the default hash folds are shuffle-free."""
    from demv_spark.functions.compat import portable_hash

    cols = list(key_cols) if key_cols is not None else list(df.columns)
    h = portable_hash(
        F.concat_ws(
            "|", F.lit(f"sfold{seed}"),
            *[F.col(c).cast("string") for c in cols],
        )
    )
    w = Window.partitionBy(label_col).orderBy(h.asc(), *[F.col(c) for c in cols])
    return df.withColumn(
        fold_col, ((F.row_number().over(w) - 1) % k).cast("int")
    )


def build_classifier(name: str, label_col: str, features_col: str, n_classes: int, seed: int = 2):
    """E3 — classifier factory matching generatemetrics.py:172-184:
    logistic | gradient | svc | mlp (+ input layer sizes for mlp)."""
    from pyspark.ml.classification import (
        GBTClassifier,
        LinearSVC,
        LogisticRegression,
        OneVsRest,
        RandomForestClassifier,
    )

    if name == "logistic":
        return LogisticRegression(labelCol=label_col, featuresCol=features_col)
    if name == "gradient":
        if n_classes <= 2:
            return GBTClassifier(labelCol=label_col, featuresCol=features_col, seed=seed)
        # GBT is binary-only in MLlib → documented RF fallback
        return RandomForestClassifier(labelCol=label_col, featuresCol=features_col, seed=seed)
    if name == "svc":
        svc = LinearSVC(labelCol=label_col, featuresCol=features_col)
        if n_classes <= 2:
            return svc
        return OneVsRest(classifier=svc, labelCol=label_col, featuresCol=features_col)
    if name == "mlp":
        raise ValueError("mlp needs explicit layers; use build_mlp(...)")
    raise ValueError(f"unknown classifier: {name}")


def build_mlp(label_col: str, features_col: str, layers: Sequence[int], seed: int = 2):
    from pyspark.ml.classification import MultilayerPerceptronClassifier

    return MultilayerPerceptronClassifier(
        labelCol=label_col, featuresCol=features_col, layers=list(layers), seed=seed
    )


def _pipeline(feature_cols: Sequence[str], label_col: str, classifier):
    """E1+E2 — VectorAssembler → StandardScaler → classifier
    (reference: make_pipeline(StandardScaler(), model),
    generatemetrics.py:196)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembler = VectorAssembler(inputCols=list(feature_cols), outputCol="__raw_features")
    scaler = StandardScaler(
        inputCol="__raw_features", outputCol="__features", withMean=True, withStd=True
    )
    clf = classifier.copy() if hasattr(classifier, "copy") else classifier
    clf = clf.setParams(featuresCol="__features") if hasattr(clf, "setParams") else clf
    return Pipeline(stages=[assembler, scaler, clf])


def out_of_fold_predictions(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    classifier,
    k: int = 10,
    seed: int = 2,
    fold_col: str = "fold",
    debias: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """E7 (confusionmatrix.py:147-205): per fold, fit on the other
    k−1 folds (optionally debiased first), predict the held-out fold;
    union of the k test-fold predictions covers every row exactly
    once. No row-id writeback join is needed — predictions stay
    attached to their rows through transform (the reference's
    positional writeback at confusionmatrix.py:203 is a pandas-ism).

    Returns df columns + `prediction` (double) + `y_true` (the label
    copied, matching the reference's column convention)."""
    # eager localCheckpoint, not cache (round 13): the returned union
    # references the folded table lazily, so a bare unpersist would
    # re-derive it per fold on the caller's first action, while the
    # old .cache() held a CacheManager entry for the session lifetime
    # (every later query paid a canonicalized-plan comparison on it)
    folded = assign_folds(df, k, seed, fold_col, exact=False).localCheckpoint(
        eager=True
    )
    pipe = _pipeline(feature_cols, label_col, classifier)
    parts = []
    for fold in range(k):
        train = folded.filter(F.col(fold_col) != fold)
        test = folded.filter(F.col(fold_col) == fold)
        if debias is not None:
            train = debias(train)
        model = pipe.fit(train)
        pred = model.transform(test).drop(
            "__raw_features", "__features", "rawPrediction", "probability"
        )
        parts.append(pred)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("y_true", F.col(label_col))


def majority_baseline_oof(
    df: DataFrame,
    label_col: str,
    key_cols: Sequence[str],
    k: int = 5,
    seed: int = 2,
    fold_col: str = "fold",
    out: str = "y_pred_base",
) -> DataFrame:
    """Out-of-fold MAJORITY-CLASS baseline: each row is predicted the
    most frequent label of the other k−1 folds (ties → smallest
    label). The zero-parameter twin of ``out_of_fold_predictions`` —
    same fold machinery, but the 'model' is a grouped count, which
    makes the entire CV split-train-predict cycle SQL-expressible and
    therefore oracle-checkable end to end (MLlib fits are not).

    Plan: portable-hash fold column (no shuffle) → per-(fold, label)
    census (one aggregate; tiny result) → complement counts by
    label-total subtraction (no second scan) → per-fold argmax →
    broadcast join back. One scan + one k×|labels| aggregate.

    Returns df + fold_col + ``out`` (the baseline prediction).
    """
    folded = assign_folds(df, k, seed, fold_col, portable_key=key_cols)
    census = folded.groupBy(fold_col, label_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    totals = census.groupBy(label_col).agg(F.sum("__n").alias("__n_tot"))
    # full fold × label grid: a label absent from fold f still counts
    # toward f's complement majority (its complement count is the
    # label's global total)
    grid = census.select(fold_col).distinct().crossJoin(totals)
    compl = grid.join(census, [fold_col, label_col], "left").select(
        fold_col,
        label_col,
        (F.col("__n_tot") - F.coalesce(F.col("__n"), F.lit(0))).alias("__n_compl"),
    )
    w = Window.partitionBy(fold_col).orderBy(
        F.desc("__n_compl"), F.col(label_col)
    )
    majority = (
        compl.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(fold_col, F.col(label_col).alias(out))
    )
    return folded.join(F.broadcast(majority), fold_col)


def cross_val(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    classifier,
    unpriv,
    positive_label,
    sensitive: Sequence[str],
    k: int = 10,
    seed: int = 2,
    debias: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """E4+E5 (utils.py:136-158): k-fold cross-validation collecting
    the fairness metric suite per fold. `unpriv` is a Column predicate
    over the raw columns; `positive_label` the positive class value.
    Optional `debias` callable (e.g. DEMV fit_transform) runs on each
    training split only, mirroring _demv_training (utils.py:231-239).

    Returns one row per fold: (fold, stat_par, disp_imp, eq_odds, acc,
    zero_one_loss)."""
    folded = assign_folds(df, k, seed, exact=False).cache()
    pipe = _pipeline(feature_cols, label_col, classifier)
    rows = []
    for fold in range(k):
        train = folded.filter(F.col("fold") != fold)
        test = folded.filter(F.col("fold") == fold)
        if debias is not None:
            train = debias(train)
        model = pipe.fit(train)
        pred = model.transform(test)
        suite = M.fairness_suite(
            pred,
            unpriv,
            F.col("prediction") == positive_label,
            F.col(label_col) == positive_label,
            label_col,
            "prediction",
        ).collect()[0]
        loss = M.zero_one_loss_diff(pred, label_col, "prediction", sensitive).collect()[0][0]
        rows.append(
            {
                "fold": fold,
                "stat_par": suite["stat_par"],
                "disp_imp": suite["disp_imp"],
                "eq_odds": suite["eq_odds"],
                "acc": suite["acc"],
                "zero_one_loss": loss,
            }
        )
    # every fold's metrics are collected above — nothing lazy escapes,
    # so the fold cache releases with the call (round 13)
    folded.unpersist()
    return df.sparkSession.createDataFrame(rows)


def repeated_demv_eval(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    classifier,
    unpriv,
    positive_label,
    sensitive: Sequence[str],
    n_reps: int = 30,
    k: int = 10,
    seed: int = 2,
    stop: int = 10000,
) -> DataFrame:
    """E5 (utils.py:231-239 _demv_training): the reference repeats
    debias+train 30× per fold to average out sampling noise. Engine
    form: vary the DEMV sampling seed per repetition; the group census
    is identical across reps (only sampling differs), so group_targets
    is computed once per training split by construction. Returns the
    unioned per-(rep, fold) metric table."""
    from demv_spark.operators.balancer import DEMV

    reps = []
    for rep in range(n_reps):
        per_fold = cross_val(
            df, feature_cols, label_col, classifier, unpriv, positive_label,
            sensitive, k=k, seed=seed,
            debias=lambda t, r=rep: DEMV(
                list(sensitive), label=label_col, seed=seed + r, stop=stop
            ).fit_transform(t),
        )
        reps.append(per_fold.withColumn("rep", F.lit(rep)))
    out = reps[0]
    for p in reps[1:]:
        out = out.unionByName(p)
    return out


def sweep_stops(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    classifier,
    unpriv,
    positive_label,
    sensitive: Sequence[str],
    stops: Sequence[int],
    k: int = 10,
    seed: int = 2,
) -> DataFrame:
    """E6 (utils.py:214-228 eval_demv): evaluate DEMV across a sweep
    of ``stop`` values; per-stop grouped mean of each metric (A13,
    utils.py:223-227). Returns (stop, metric means…)."""
    from demv_spark.operators.balancer import DEMV

    parts = []
    for stop in stops:
        per_fold = cross_val(
            df, feature_cols, label_col, classifier, unpriv, positive_label,
            sensitive, k=k, seed=seed,
            debias=lambda t, s=stop: DEMV(
                list(sensitive), label=label_col, seed=seed, stop=s
            ).fit_transform(t),
        )
        parts.append(per_fold.withColumn("stop", F.lit(stop)))
    swept = parts[0]
    for p in parts[1:]:
        swept = swept.unionByName(p)
    metric_cols = [c for c in swept.columns if c not in ("fold", "stop")]
    return swept.groupBy("stop").agg(
        *[F.avg(c).alias(c) for c in metric_cols]
    )


def metrics_report(per_fold: DataFrame, metric_cols: Sequence[str] | None = None) -> DataFrame:
    """E10/A5 (utils.py:330-340): mean ± population std per metric
    over the per-fold table. Long form: (metric, mean, std)."""
    metric_cols = metric_cols or [c for c in per_fold.columns if c != "fold"]
    pieces = [
        per_fold.agg(
            F.lit(c).alias("metric"),
            F.avg(c).alias("mean"),
            F.coalesce(F.stddev_pop(c), F.lit(0.0)).alias("std"),
        )
        for c in metric_cols
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def explode_metric_lists(df: DataFrame, list_cols: Sequence[str]) -> DataFrame:
    """E11 (utils.py:342-354): explode list-valued metric cells into
    rows for CSV output — literal same-name Spark op."""
    out = df
    for c in list_cols:
        out = out.withColumn(c, F.explode(c))
    return out


def write_metrics_csv(df: DataFrame, path: str) -> None:
    """S6 — CSV sink for (tiny) metric tables (utils.py:352-358)."""
    df.toPandas().to_csv(path, index=False)
