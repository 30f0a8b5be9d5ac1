"""Concrete dataset recipes (sources/recipes.py) vs the reference
loaders (getdataset.py:9-545): per-recipe unit tests on tiny
synthesized raw tables with hand-computed expectations, plus
real-file tests gated on the reference data being present (the
original CSVs are read read-only from the reference checkout when
available; every assertion also holds structurally without them)."""

import os

import pyspark.sql.functions as F
import pytest

from demv_spark.sources import recipes as R

REF_DATA = "/root/reference/replication_package/data"


def rows(df):
    return [r.asDict() for r in df.collect()]


# ---------------------------------------------------------------------------
# synthetic-fixture unit tests
# ---------------------------------------------------------------------------


def test_cmc_recipe_binarizes_wife_edu_only_at_3_features(spark):
    raw = spark.createDataFrame(
        [(25, 10, 1, 2, 1, 0, 1, 2, 0, 1), (30, 40, 2, 0, 0, 1, 2, 3, 1, 2)],
        R.CMC_COLUMNS,
    )
    out2 = R.cmc(raw, n_features=2)
    assert rows(out2.select("wife_edu").orderBy("wife_age")) == [
        {"wife_edu": 10}, {"wife_edu": 40}
    ]
    out3 = R.cmc(raw, n_features=3)
    assert rows(out3.select("wife_edu").orderBy("wife_age")) == [
        {"wife_edu": 0}, {"wife_edu": 1}
    ]
    assert out3.columns == R.CMC_COLUMNS


def test_adult_recipe_filter_dummies_encodes(spark):
    raw = spark.createDataFrame(
        [
            # age, workclass, fnlwgt, education, education-num, marital,
            # occupation, relationship, race, sex, gain, loss, hours,
            # country, income
            (35, " Private", 1.0, " Bachelors", 13, " Married", " Tech",
             " Husband", " White", " Male", 0, 0, 45, " ?", " >50K"),
            (22, " Private", 2.0, " HS-grad", 9, " Single", " Sales",
             " Wife", " Black", " Female", 0, 0, 8, " Cuba", " <=50K"),
            (50, " Private", 3.0, " HS-grad", 9, " Single", " Sales",
             " Wife", " Asian", " Female", 0, 0, 72, " Cuba", " <=50K"),
        ],
        R.ADULT_COLUMNS,
    )
    out = R.adult(raw)
    got = rows(out.orderBy("income"))
    # the Asian row is filtered (race ∉ {Black, White})
    assert len(got) == 2
    # dropped raw columns are gone; bin dummies + renames present
    for gone in ("age", "hours-per-week", "workclass", "fnlwgt",
                 "education-num", "capital-gain", "capital-loss"):
        assert gone not in out.columns
    assert "Bachelors" in out.columns and " Bachelors" not in out.columns
    assert "hours" in out.columns and "hour<10" not in out.columns
    hi, lo = got[1], got[0]
    # row 1: Bachelors, married, 35y (30-40 bin), 45h (40-50 bin),
    # ' ?' country → 'Not known', male/white → encoded 1/1, income 1
    assert hi["Bachelors"] == 1 and hi[" HS-grad"] == 0
    assert hi["age between 30 and 40"] == 1 and hi["hour between 40 and 50"] == 1
    assert hi["Not known"] == 1
    assert hi["sex"] == 1 and hi["race"] == 1 and hi["income"] == 1
    # row 2: HS-grad, 22y (20-30), 8h → 'hours' (renamed hour<10),
    # female/black → 0/0, income 0
    assert lo[" HS-grad"] == 1 and lo["Bachelors"] == 0
    assert lo["age between 20 and 30"] == 1 and lo["hours"] == 1
    assert lo["sex"] == 0 and lo["race"] == 0 and lo["income"] == 0
    # pd.cut categorical parity: ALL declared labels become columns,
    # observed or not
    for lab in R.ADULT_AGE_LABELS:
        assert lab in out.columns


def test_wine_recipe_union_filter_binarize(spark):
    red = spark.createDataFrame(
        [(9.5, 5, 0.99), (12.0, 3, 1.2)], ["alcohol", "quality", "density"]
    )
    white = spark.createDataFrame(
        [(11.0, 6, 1.15), (10.0, 8, 0.5)], ["alcohol", "quality", "density"]
    )
    out = R.wine(red, white, n_features=3)
    got = rows(out.orderBy("quality"))
    # quality 3 and 8 rows dropped
    assert [g["quality"] for g in got] == [5, 6]
    # alcohol ≤10 → 0, >10 → 1; density ≥1.1 → 1
    assert [g["alcohol"] for g in got] == [0.0, 1.0]
    assert [g["density"] for g in got] == [0, 1]
    assert [g["type"] for g in got] == [0, 1]


def test_law_recipe_recodes_dropna_quantiles(spark):
    raw = spark.createDataFrame(
        [
            ("NO", "female", 7.0, 3.9, 30, 160.0),
            ("YES", "male", 1.0, 2.1, 65, 150.0),
            ("NO", "male", 3.0, 3.0, 40, None),   # dropped by dropna
            ("YES", "female", 1.0, 3.5, 70, 140.0),
        ],
        ["Dropout", "gender", "race", "gpa", "age", "lsat"],
    )
    out = R.law(raw, n_features=3)
    got = rows(out.orderBy("lsat"))
    assert len(got) == 3
    # gpa became the 3-quantile class: 2.1→0, 3.5→1, 3.9→2
    assert [g["gpa"] for g in got] == [1, 0, 2]
    assert [g["Dropout"] for g in got] == [1, 1, 0]
    assert [g["gender"] for g in got] == [1, 0, 1]
    assert [g["race"] for g in got] == [1.0, 1.0, 0.0]   # 7.0→0, else→1
    assert [g["age"] for g in got] == [1, 1, 0]          # binarized at 61


def test_drug_recipe_recodes_and_drops_strings(spark):
    raw = spark.createDataFrame(
        [
            (0.48246, "white", "never", 0.5, "x", 1.0),
            (-0.48246, "non-white", "last year", -0.5, "y", 2.0),
        ],
        ["gender", "race", "y", "age", "yhat", "a"],
    )
    out = R.drug(raw, n_features=3)
    got = rows(out.orderBy("gender"))
    assert "yhat" not in out.columns and "a" not in out.columns
    assert [g["gender"] for g in got] == [0.0, 1.0]
    assert [g["race"] for g in got] == [0, 1]
    assert [g["y"] for g in got] == [2, 0]
    assert [g["age"] for g in got] == [0, 1]   # binarized at 0


def test_obesity_recipe_encodes_and_binarizes_age(spark):
    cols = ["Gender", "family_history_with_overweight", "FAVC", "CAEC",
            "SMOKE", "SCC", "CALC", "MTRANS", "y", "Age",
            "NObeyesdad", "weight_cat", "yhat", "a"]
    raw = spark.createDataFrame(
        [
            ("Male", "yes", "no", "Sometimes", "no", "no", "no",
             "Walking", "Normal_Weight", 21.0, "d", "d", "d", "d"),
            ("Female", "no", "yes", "Always", "yes", "yes", "Sometimes",
             "Automobile", "Obesity_Type_I", 30.0, "d", "d", "d", "d"),
        ],
        cols,
    )
    out = R.obesity(raw, n_features=2)
    got = rows(out.orderBy("y"))
    assert [g["y"] for g in got] == [0, 3]
    # lexicographic codes: Female<Male, Automobile<Walking, no<yes
    assert [g["Gender"] for g in got] == [1, 0]
    assert [g["MTRANS"] for g in got] == [1, 0]
    assert [g["SMOKE"] for g in got] == [0, 1]
    assert [g["Age"] for g in got] == [0, 1]
    for gone in ("NObeyesdad", "weight_cat", "yhat", "a"):
        assert gone not in out.columns


def test_park_recipe_relabels_exactly_n(spark):
    n_rows = 600
    raw = spark.range(n_rows).select(
        F.lit(70).alias("age"),
        F.lit(1).alias("sex"),
        F.lit("Moderate").alias("score_cut"),
        (F.col("id") % 100).cast("double").alias("PPE"),
        F.lit(1).alias("subject#"), F.lit(1).alias("a"), F.lit(1).alias("y"),
        F.lit(1).alias("yhat"), F.lit(1.0).alias("motor_UPDRS"),
        F.lit(1.0).alias("total_UPDRS"), F.lit(1.0).alias("test_time"),
    )
    out = R.park(raw, n_features=2, seed=7)
    counts = {r["score_cut"]: r["n"] for r in
              out.groupBy("score_cut").agg(F.count(F.lit(1)).alias("n")).collect()}
    # every row matched (age=1 after binarize, sex=1, score=1):
    # exactly 200 relabeled to 0 (getdataset.py:451-452)
    assert counts == {0: 200, 1: n_rows - 200}


def test_crime_cascade_matches_reference_loop(spark):
    import numpy as np

    vals = [float(v) for v in range(1, 21)]
    raw = spark.createDataFrame([(v,) for v in vals], ["x"])
    out = R.quantile_class_cascade(
        raw, "x", "cls", [0.0, 0.2, 0.4, 0.6, 0.8, 1.0], step=100
    )
    got = {r["x"]: r["cls"] for r in out.collect()}
    # reference loop replay (getdataset.py:173-180) with np.quantile
    qs = np.quantile(np.array(vals), [0, 0.2, 0.4, 0.6, 0.8, 1])
    ref = {v: v for v in vals}
    for i, cl in enumerate(qs):
        for v, cur in ref.items():
            if cur <= cl:
                ref[v] = i * 100
    assert got == {v: float(c) for v, c in ref.items()}


def test_fairness_configs_cover_all_datasets():
    assert set(R.FAIRNESS) == {
        "adult", "cmc", "compas", "crime", "drug",
        "german", "law", "obesity", "park", "wine",
    }
    for name, cfg in R.FAIRNESS.items():
        assert set(cfg["unpriv"]) == {1, 2, 3}, name
        for n, grp in cfg["unpriv"].items():
            assert len(grp) == n, (name, n)


# ---------------------------------------------------------------------------
# real-file tests (reference data checkout present)
# ---------------------------------------------------------------------------

needs_ref_data = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not available"
)


@needs_ref_data
def test_load_cmc_real_file(spark):
    df = R.load_cmc(spark, f"{REF_DATA}/cmc.data")
    assert df.columns == R.CMC_COLUMNS
    assert df.count() == 1473              # UCI cmc row count
    doms = df.select(
        F.collect_set("wife_religion").alias("r"),
        F.collect_set("contr_use").alias("y"),
    ).first()
    assert sorted(doms["r"]) == [0, 1] and sorted(doms["y"]) == [1, 2, 3]


@needs_ref_data
def test_load_wine_real_files(spark):
    df = R.load_wine(
        spark,
        f"{REF_DATA}/winequality-red.csv",
        f"{REF_DATA}/winequality-white.csv",
    )
    # 6497 raw rows minus quality∈{3,8,9}
    assert df.count() == 6497 - 30 - 193 - 5
    assert set(
        r["alcohol"] for r in df.select("alcohol").distinct().collect()
    ) == {0.0, 1.0}
    assert set(
        r["quality"] for r in df.select("quality").distinct().collect()
    ) == {4, 5, 6, 7}


@needs_ref_data
def test_load_german_real_file(spark):
    df = R.load_german(spark, f"{REF_DATA}/german.csv", n_features=3)
    assert df.count() == 1000
    assert set(
        r["investment_as_income_percentage"]
        for r in df.select("investment_as_income_percentage").distinct().collect()
    ) == {0, 1}


@needs_ref_data
def test_load_drug_real_file(spark):
    df = R.load_drug(spark, f"{REF_DATA}/drugs.csv")
    got = {r["gender"] for r in df.select("gender").distinct().collect()}
    assert got == {0.0, 1.0}
    assert {r["y"] for r in df.select("y").distinct().collect()} == {0, 1, 2}
    from pyspark.sql.types import StringType

    assert not [f for f in df.schema.fields if isinstance(f.dataType, StringType)]


@needs_ref_data
def test_load_adult_real_file(spark):
    df = R.load_adult(spark, f"{REF_DATA}/adult.data")
    # race filter keeps only Black/White rows of the 32561
    n = df.count()
    assert 28000 < n < 32561
    assert "Bachelors" in df.columns and "hours" in df.columns
    doms = df.select(
        F.collect_set("sex").alias("s"),
        F.collect_set("race").alias("r"),
        F.collect_set("income").alias("i"),
    ).first()
    assert sorted(doms["s"]) == [0, 1]
    assert sorted(doms["r"]) == [0, 1]
    assert sorted(doms["i"]) == [0, 1]
    # every declared pd.cut label is a column even if unobserved
    for lab in R.ADULT_AGE_LABELS[1:]:
        assert lab in df.columns


@needs_ref_data
def test_load_park_real_file(spark):
    df = R.load_park(spark, f"{REF_DATA}/park.csv", n_features=3)
    assert {r["age"] for r in df.select("age").distinct().collect()} == {0, 1}
    assert {r["score_cut"] for r in df.select("score_cut").distinct().collect()} <= {0, 1, 2}
    assert {r["PPE"] for r in df.select("PPE").distinct().collect()} == {0, 1}
    for gone in ("subject#", "motor_UPDRS", "total_UPDRS", "test_time"):
        assert gone not in df.columns


@needs_ref_data
def test_load_crime_real_file(spark):
    df = R.load_crime(spark, f"{REF_DATA}/crime_data_normalized.xlsx")
    assert df.count() == 1994            # UCI communities-and-crime rows
    assert "ViolentCrimesClass" in df.columns
    assert "ViolentCrimesPerPop" not in df.columns
    census = {
        r["ViolentCrimesClass"]: r["n"]
        for r in df.groupBy("ViolentCrimesClass")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # cascade semantics on REAL (z-scored, right-skewed) data: the
    # in-place loop re-captures earlier assignments whose value ≤ a
    # later quantile (e.g. the 0-class lands inside a later bucket —
    # getdataset.py:173-180 as written; the exact loop replay is
    # pinned by test_crime_cascade_matches_reference_loop), so only
    # structure is asserted here: classes are i·100, top class
    # present, quintile-ish masses
    assert set(census) <= {0.0, 100.0, 200.0, 300.0, 400.0, 500.0}
    assert 500.0 in census
    assert sum(census.values()) == 1994
    assert all(n >= 0.15 * 1994 for c, n in census.items() if c in (200.0, 300.0))
    assert {r["black_people"] for r in df.select("black_people").distinct().collect()} == {0, 1}
    # no remaining NA anywhere (NA columns dropped)
    n_null = df.select(
        sum(F.sum(F.col(c).isNull().cast("long")) for c in df.columns).alias("n")
    ).first()["n"]
    assert n_null == 0


def test_unpriv_for_matches_reference_sfs():
    # sfs tables mirror each loader's custom sensitivefeature branch
    assert R.unpriv_for("cmc", ["wife_work"]) == {"wife_work": 1}
    assert R.unpriv_for("adult", ["sex", "Bachelors"]) == {"sex": 0, "Bachelors": 0}
    assert R.unpriv_for("wine", ["density"]) == {"density": 0}
    with pytest.raises(ValueError):
        R.unpriv_for("german", ["not_a_feature"])
    # every per-n default is consistent with the sfs table
    for name, cfg in R.FAIRNESS.items():
        for grp in cfg["unpriv"].values():
            for col, val in grp.items():
                assert cfg["sfs"][col] == val, (name, col)
