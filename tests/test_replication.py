"""Tolerance replication test (SURVEY §5.4): the reference's headline
claim — DEMV moves disparate impact toward 1 and statistical parity
toward 0 while accuracy holds (BASELINE.md: cmc 2-features,
0.494→0.750 disp_imp, −0.126→−0.008 stat_par, acc 0.52→0.56) —
reproduced end-to-end through the Spark engine on a synthetic biased
dataset (the reference's CSVs aren't redistributable; the claim is
directional + tolerance-based, matching the stochastic original).
"""

import pyspark.sql.functions as F
import pytest

from demv_spark.ml import evaluation as E
from demv_spark.operators.balancer import DEMV
from demv_spark.sources.generator import make_classification


@pytest.fixture(scope="module")
def biased(spark):
    """Classification data with label bias against s0=1: positive
    labels in the unprivileged group are flipped with p=0.5."""
    base = make_classification(
        spark, 2000, n_features=5, n_classes=2, n_sensitive=1, seed=11
    )
    return base.withColumn(
        "y",
        F.when(
            (F.col("s0") == 1) & (F.col("y") == 1) & (F.rand(3) < 0.5), 0
        ).otherwise(F.col("y")),
    ).cache()


def _run(biased, debias):
    clf = E.build_classifier("logistic", "y", "__features", 2)
    per_fold = E.cross_val(
        biased, [f"f{i}" for i in range(5)], "y", clf,
        unpriv=F.col("s0") == 1, positive_label=1, sensitive=["s0"], k=3,
        debias=debias,
    )
    return {r["metric"]: r["mean"] for r in E.metrics_report(per_fold).collect()}


def test_demv_improves_fairness_holds_accuracy(biased):
    base = _run(biased, None)
    demv = _run(
        biased,
        lambda t: DEMV(["s0"], label="y", seed=5).fit_transform(t),
    )
    # directional claims from BASELINE.md, tolerance-based
    assert abs(demv["stat_par"]) <= abs(base["stat_par"]) + 0.02
    assert demv["disp_imp"] >= base["disp_imp"] - 0.02
    assert demv["acc"] >= base["acc"] - 0.05          # accuracy holds
    # sanity: the injected bias is visible pre-debias
    assert base["stat_par"] < 0
    assert base["disp_imp"] < 1.0


REF_DATA = "/root/reference/replication_package/data"


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_DATA),
    reason="reference data not available",
)
def test_cmc_real_data_replication(spark):
    """BASELINE.md quality rows on the REAL cmc table through the
    concrete recipe (sources/recipes.py): biased logistic 10-fold has
    stat_par −0.1257 ± 0.0321 (metrics_cmc_biased_2_features_logistic
    .csv); DEMV moves stat_par toward 0 and disp_imp up
    (−0.0078 ± 0.0694 / 0.494 → 0.750 on the gradient pairing).
    Tolerance-based: the reference pipeline is stochastic."""
    from demv_spark.operators.balancer import DEMV
    from demv_spark.sources import recipes as R

    data = R.load_cmc(spark, f"{REF_DATA}/cmc.data").cache()
    cfg = R.FAIRNESS["cmc"]
    unpriv_group = cfg["unpriv"][2]          # {wife_religion:1, wife_work:1}
    sensitive = list(unpriv_group)
    unpriv = (F.col("wife_religion") == 1) & (F.col("wife_work") == 1)
    features = [c for c in data.columns if c != cfg["label"]]

    def run(debias):
        clf = E.build_classifier("logistic", cfg["label"], "__features", 3)
        per_fold = E.cross_val(
            data, features, cfg["label"], clf,
            unpriv=unpriv, positive_label=cfg["positive_label"],
            sensitive=sensitive, k=10,
        ) if debias is None else E.cross_val(
            data, features, cfg["label"], clf,
            unpriv=unpriv, positive_label=cfg["positive_label"],
            sensitive=sensitive, k=10, debias=debias,
        )
        return {r["metric"]: r["mean"] for r in E.metrics_report(per_fold).collect()}

    base = run(None)
    # biased run reproduces the published stat_par within 3 sigma
    assert base["stat_par"] == pytest.approx(-0.1257, abs=3 * 0.0321)
    demv = run(
        lambda t: DEMV(sensitive, label=cfg["label"], seed=5).fit_transform(t)
    )
    assert abs(demv["stat_par"]) < abs(base["stat_par"])
    assert demv["disp_imp"] > base["disp_imp"]
    assert demv["acc"] >= base["acc"] - 0.05


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_DATA),
    reason="reference data not available",
)
def test_park_real_data_replication(spark):
    """Second real-data regime (VERDICT r5 item 8): the REAL park
    table (BASELINE.md:46 — 5,875 × 26, multiclass 3) through the
    driver-green recipe and the same 10-fold logistic harness. The
    reference ships quality CSVs only for cmc
    (replication_package/ris/2features/ holds 4 cmc files and nothing
    else), so unlike the cmc test there is no published mean±std to
    pin — the checks are the paper's DIRECTIONAL claims with the same
    tolerance structure, bounding the MLlib-vs-sklearn gap on a
    second regime (multiclass label, different sensitive pairing):
    DEMV moves stat_par toward 0 and disp_imp up while accuracy holds
    within 0.05."""
    from demv_spark.operators.balancer import DEMV
    from demv_spark.sources import recipes as R

    data = R.load_park(spark, f"{REF_DATA}/park.csv").cache()
    cfg = R.FAIRNESS["park"]
    unpriv_group = cfg["unpriv"][2]              # {age: 1, sex: 0}
    sensitive = list(unpriv_group)
    unpriv = (F.col("age") == 1) & (F.col("sex") == 0)
    features = [c for c in data.columns if c != cfg["label"]]

    def run(debias=None):
        clf = E.build_classifier("logistic", cfg["label"], "__features", 3)
        per_fold = E.cross_val(
            data, features, cfg["label"], clf,
            unpriv=unpriv, positive_label=cfg["positive_label"],
            sensitive=sensitive, k=10, debias=debias,
        )
        return {r["metric"]: r["mean"] for r in E.metrics_report(per_fold).collect()}

    base = run()
    demv = run(
        lambda t: DEMV(sensitive, label=cfg["label"], seed=5).fit_transform(t)
    )
    assert abs(demv["stat_par"]) <= abs(base["stat_par"]) + 0.02
    assert demv["disp_imp"] >= base["disp_imp"] - 0.02
    assert demv["acc"] >= base["acc"] - 0.05
    # the park regime is genuinely biased pre-debias (the paper's
    # premise for including it): disparity visible before DEMV
    assert base["disp_imp"] < 1.0


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_DATA),
    reason="reference data not available",
)
def test_adult_real_data_replication(spark):
    """Third real-data regime (VERDICT r6 item 8): the REAL adult
    table (BASELINE.md:41 — 32,561 × 15, binary income label, the
    reference's LARGEST loader) through the driver-green recipe and
    the same 10-fold logistic harness. As with park, the reference
    publishes quality CSVs only for cmc, so the checks are the
    paper's directional claims with the shared tolerance structure
    (stat_par toward 0, disp_imp up, accuracy holds within 0.05) on
    the sex=0 ∧ race=0 unprivileged pairing — bounding the
    MLlib-vs-sklearn gap on the largest, most-cited regime."""
    from demv_spark.operators.balancer import DEMV
    from demv_spark.sources import recipes as R

    data = R.load_adult(spark, f"{REF_DATA}/adult.data").cache()
    cfg = R.FAIRNESS["adult"]
    unpriv_group = cfg["unpriv"][2]              # {sex: 0, race: 0}
    sensitive = list(unpriv_group)
    unpriv = (F.col("sex") == 0) & (F.col("race") == 0)
    features = [c for c in data.columns if c != cfg["label"]]

    def run(debias=None):
        clf = E.build_classifier("logistic", cfg["label"], "__features", 2)
        per_fold = E.cross_val(
            data, features, cfg["label"], clf,
            unpriv=unpriv, positive_label=cfg["positive_label"],
            sensitive=sensitive, k=10, debias=debias,
        )
        return {r["metric"]: r["mean"] for r in E.metrics_report(per_fold).collect()}

    base = run()
    demv = run(
        lambda t: DEMV(sensitive, label=cfg["label"], seed=5).fit_transform(t)
    )
    assert abs(demv["stat_par"]) <= abs(base["stat_par"]) + 0.02
    assert demv["disp_imp"] >= base["disp_imp"] - 0.02
    assert demv["acc"] >= base["acc"] - 0.05
    # adult's income bias against the (sex=0, race=0) group is the
    # canonical fairness-benchmark premise: visible pre-debias
    assert base["stat_par"] < 0
    assert base["disp_imp"] < 1.0


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_DATA),
    reason="reference data not available",
)
def test_german_real_data_replication(spark):
    """Fourth real-data regime: the REAL german credit table (1,000
    rows — the smallest loader, stressing the opposite end of the
    size range from adult) through the driver-green recipe and the
    shared 10-fold logistic harness. No published CSVs beyond cmc, so
    the checks are the paper's directional claims with the shared
    tolerance structure on the sex=0 ∧ age=0 pairing."""
    from demv_spark.operators.balancer import DEMV
    from demv_spark.sources import recipes as R

    data = R.load_german(spark, f"{REF_DATA}/german.csv").cache()
    cfg = R.FAIRNESS["german"]
    unpriv_group = cfg["unpriv"][2]              # {sex: 0, age: 0}
    sensitive = list(unpriv_group)
    unpriv = (F.col("sex") == 0) & (F.col("age") == 0)
    features = [c for c in data.columns if c != cfg["label"]]

    def run(debias=None):
        clf = E.build_classifier("logistic", cfg["label"], "__features", 2)
        per_fold = E.cross_val(
            data, features, cfg["label"], clf,
            unpriv=unpriv, positive_label=cfg["positive_label"],
            sensitive=sensitive, k=10, debias=debias,
        )
        return {r["metric"]: r["mean"] for r in E.metrics_report(per_fold).collect()}

    base = run()
    demv = run(
        lambda t: DEMV(sensitive, label=cfg["label"], seed=5).fit_transform(t)
    )
    assert abs(demv["stat_par"]) <= abs(base["stat_par"]) + 0.02
    assert demv["disp_imp"] >= base["disp_imp"] - 0.02
    assert demv["acc"] >= base["acc"] - 0.05
    assert base["disp_imp"] < 1.0                # bias visible pre-debias
