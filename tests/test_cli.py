"""CLI twin of generatemetrics.py (demv_spark/cli.py): the method
dispatch runs end-to-end on a synthetic biased table, and the real-
file path reproduces the reference invocation shape."""

import os

import pyspark.sql.functions as F
import pytest

from demv_spark import cli
from demv_spark.sources.generator import make_classification

REF_DATA = "/root/reference/replication_package/data"


@pytest.fixture(scope="module")
def biased(spark):
    base = make_classification(
        spark, 1200, n_features=4, n_classes=2, n_sensitive=1, seed=9
    )
    return base.withColumn(
        "y",
        F.when(
            (F.col("s0") == 1) & (F.col("y") == 1) & (F.rand(4) < 0.5), 0
        ).otherwise(F.col("y")),
    ).cache()


@pytest.mark.parametrize(
    "method",
    [
        "biased",
        "uniform",
        # the EG variant fits iters x k MLlib models (~90 s) — slow
        # tier; the dispatch wiring it shares with biased/uniform is
        # covered by those, and EG itself by test_eg.py
        pytest.param("eg", marks=pytest.mark.slow),
    ],
)
def test_run_metrics_dispatch(biased, method):
    per_fold = cli.run_metrics(
        biased, method, {"s0": 1}, "y", 1, k=3,
    )
    rows = per_fold.collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r["acc"] <= 1.0
        assert -1.0 <= r["stat_par"] <= 1.0
    rep = {r["metric"]: r for r in cli.report(per_fold).collect()}
    assert set(rep) >= {"stat_par", "disp_imp", "eq_odds", "acc", "zero_one_loss"}


def test_run_metrics_unknown_method(biased):
    with pytest.raises(ValueError):
        cli.run_metrics(biased, "nope", {"s0": 1}, "y", 1)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not available"
)
def test_cli_main_real_cmc(tmp_path, spark):
    out = str(tmp_path / "metrics.csv")
    cli.main([
        "cmc", "biased", "2",
        "--path", f"{REF_DATA}/cmc.data",
        "--k", "3", "--out", out,
    ])
    text = open(out).read()
    assert "stat_par" in text and "mean" in text


def test_generate_cm_writes_pdf(biased, tmp_path):
    out = str(tmp_path / "cm.pdf")
    preds = cli.generate_cm(
        biased, {"s0": 1}, "y", out, k=3, debias_method="uniform"
    )
    assert "prediction" in preds.columns and "y_true" in preds.columns
    data = open(out, "rb").read()
    assert data.startswith(b"%PDF") and b"(Unprivileged group)" in data
