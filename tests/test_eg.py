"""Exponentiated-gradient reduction (E8) — dynamics unit tests plus
the MLlib-backed reduction's tolerance test against the reference's
published EG behavior (BASELINE.md: fairlearn ExponentiatedGradient +
BoundedGroupLoss(ZeroOneLoss, 0.1) over logistic on cmc —
stat_par −0.1072 ± 0.0426: the constraint bounds group LOSS, so
statistical parity stays negative rather than snapping to 0)."""

import pyspark.sql.functions as F
import pytest

from demv_spark.ml import evaluation as E
from demv_spark.ml.eg import ExponentiatedGradientBGL, eg_bounded_loss_dynamics
from demv_spark.sources.generator import make_classification


def test_eg_dynamics_hand_computed(spark):
    # group 0: 3 of 4 labeled 0; group 1: 4 of 4 labeled 1
    rows = [(0, 0)] * 3 + [(0, 1)] + [(1, 1)] * 4
    df = spark.createDataFrame(rows, "s int, y int")
    out = eg_bounded_loss_dynamics(df, "s", "y", bound=0.1, eta=1.0, iters=3).collect()
    t0 = out[0]
    # λ start at 1, p0 = p1 = 0.5 → w = 3 for both groups;
    # votes: v1 = 3·1 + 3·4 = 15 ≥ v0 = 3·3 = 9 → c = 1
    assert (t0["t"], t0["c"], t0["lam0"], t0["lam1"]) == (0, 1, 1.0, 1.0)
    assert t0["loss0"] == pytest.approx(0.75) and t0["loss1"] == 0.0
    # λ updates: lam0 ← 1·(1 + (0.75 − 0.1)) = 1.65; lam1 ← 0.9
    t1 = out[1]
    assert t1["lam0"] == pytest.approx(1.65) and t1["lam1"] == pytest.approx(0.9)


def test_eg_dynamics_violating_group_multiplier_grows(spark):
    rows = [(0, 0)] * 30 + [(0, 1)] * 10 + [(1, 1)] * 40
    df = spark.createDataFrame(rows, "s int, y int")
    out = eg_bounded_loss_dynamics(df, "s", "y", bound=0.1, eta=1.0, iters=6).collect()
    # whichever group violates the bound in round t gets a larger λ
    # in round t+1; a satisfied group's λ shrinks by exactly 0.9
    for a, b in zip(out, out[1:]):
        for g in (0, 1):
            lam_a, lam_b, loss = a[f"lam{g}"], b[f"lam{g}"], a[f"loss{g}"]
            if loss > 0.1:
                assert lam_b > lam_a
            else:
                assert lam_b == pytest.approx(lam_a * (1 + (loss - 0.1)))


def test_eg_dynamics_requires_both_groups(spark):
    df = spark.createDataFrame([(1, 0), (1, 1)], "s int, y int")
    with pytest.raises(ValueError):
        eg_bounded_loss_dynamics(df, "s", "y")


@pytest.fixture(scope="module")
def biased(spark):
    base = make_classification(
        spark, 2000, n_features=5, n_classes=2, n_sensitive=1, seed=11
    )
    return base.withColumn(
        "y",
        F.when(
            (F.col("s0") == 1) & (F.col("y") == 1) & (F.rand(3) < 0.5), 0
        ).otherwise(F.col("y")),
    ).cache()


@pytest.mark.slow
def test_eg_bgl_matches_reference_behavior(biased):
    """Reference parity (generatemetrics.py:101-113 via BASELINE.md):
    EG with a bounded-group-loss constraint narrows the group-loss gap
    while statistical parity stays NEGATIVE within the published band
    — the reference's cmc EG row is stat_par −0.1072 ± 0.0426, i.e.
    the constraint does not equalize selection rates."""
    feats = [f"f{i}" for i in range(5)]
    factory = lambda: E.build_classifier("logistic", "y", "__features", 2)

    def group_losses(pred):
        return {
            r["s0"]: r["loss"]
            for r in pred.groupBy("s0")
            .agg(
                (
                    F.sum((F.col("prediction") != F.col("y")).cast("int"))
                    / F.count(F.lit(1))
                ).alias("loss")
            )
            .collect()
        }

    base_model = E._pipeline(feats, "y", factory()).fit(biased)
    base_pred = base_model.transform(biased)
    base_losses = group_losses(base_pred)

    eg = ExponentiatedGradientBGL(
        factory, ["s0"], "y", bound=0.1, eta=2.0, iters=5
    ).fit(biased, feats)
    eg_pred = eg.predict(biased)
    eg_losses = group_losses(eg_pred)

    # group-loss gap narrows (the constraint's whole point)
    base_gap = max(base_losses.values()) - min(base_losses.values())
    eg_gap = max(eg_losses.values()) - min(eg_losses.values())
    assert eg_gap <= base_gap + 1e-9

    # multiplier dynamics: the violating group's λ rises, the
    # satisfied group's λ falls, every iteration
    for a, b in zip(eg.trajectory_, eg.trajectory_[1:]):
        for g, loss in a["losses"].items():
            if loss > 0.1:
                assert b["lams"][g] > a["lams"][g]
            else:
                assert b["lams"][g] < a["lams"][g]

    # fairness/accuracy envelope vs the published reference row:
    # stat_par stays negative, inside the ±2σ band around −0.1072,
    # and accuracy holds within 5pp of the unconstrained model
    from demv_spark.functions import metrics as M

    sp = M.statistical_parity(
        eg_pred, F.col("s0") == 1, F.col("prediction") == 1
    ).collect()[0][0]
    assert -0.1072 - 2 * 0.0426 < sp < 0.0
    acc_base = base_pred.filter(F.col("prediction") == F.col("y")).count() / 2000
    acc_eg = eg_pred.filter(F.col("prediction") == F.col("y")).count() / 2000
    assert acc_eg >= acc_base - 0.05
