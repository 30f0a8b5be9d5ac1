"""Concrete per-dataset preparation recipes — Spark twins of every
loader in the reference's ``getdataset.py:9-545`` (adult, cmc, compas,
crime, drug, german, law, obesity, park, wine).

Each recipe is a function ``<name>(raw, n_features=2) -> DataFrame``
taking the raw scanned table(s) (wine takes two) and returning the
prepared feature table, plus a ``FAIRNESS[name]`` config carrying the
loader's label / positive_label / per-n_features unprivileged-group
dicts (the loader's ``sfs`` table and ``numberoffeatures`` dispatch,
e.g. getdataset.py:60-82 for adult). The loaders' trailing ``k``
return value is vestigial — ``run_metrics`` receives and never reads
it (generatemetrics.py:89-146) — so it is not carried.

Recipes compose the ETL operator kit (operators/etl.py), so the whole
recipe is ONE DataFrame plan: every step is a narrow column transform
Catalyst fuses into the scan projection, except the aggregation-backed
steps (z-score stats, quantiles, label-encode distinct) which each add
one tiny broadcast. At 100 TB a recipe is therefore a single pass plus
config-scale side lookups — no step materializes an intermediate.

``load_<name>(spark, path)`` helpers wire the right reader (S1-S4
readers.py) to each recipe for users holding the original files; the
recipe functions themselves are reader-agnostic so tests and the
driver contract can feed synthesized raw tables of the same shape.

pd.get_dummies parity (adult): indicator columns are named exactly by
the category value (no prefix — ``adult_df.join(pd.get_dummies(...))``
at getdataset.py:35-48), string-column categories in sorted order of
the observed domain, pd.cut categoricals over ALL declared labels even
when unobserved.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType

from demv_spark.operators import etl


def _dummies(df: DataFrame, col: str, values=None) -> DataFrame:
    """pd.get_dummies twin: bare category-named indicator columns,
    original column dropped. With ``values=None`` the observed domain
    is enumerated (sorted, one tiny distinct per column — config-
    scale, like the pandas call itself); recipes with several
    categorical columns discover every domain in ONE aggregate via
    ``_observed_domains`` instead."""
    if values is None:
        values = sorted(
            r[0] for r in df.select(col).distinct().collect() if r[0] is not None
        )
    out = df
    for v in values:
        out = out.withColumn(str(v), (F.col(col) == F.lit(v)).cast("int"))
    return out.drop(col)


def _observed_domains(df: DataFrame, cols: list[str]) -> dict[str, list]:
    """Every needed column domain from ONE fused collect_set aggregate
    (config-scale result). A per-column ``distinct`` would re-scan the
    recipe lineage once per column — the adult recipe's 8 encoded
    columns cost 8 extra scans + shuffles that way; this is 1 scan."""
    row = df.agg(
        *[F.collect_set(F.col(c)).alias(str(i)) for i, c in enumerate(cols)]
    ).first()
    return {c: sorted(row[str(i)]) for i, c in enumerate(cols)}


def _encode_lex(df: DataFrame, col: str, domain: list) -> DataFrame:
    """Lexicographic label encode (sklearn LabelEncoder/OrdinalEncoder
    parity — both sort categories) as a pure CASE chain over a known
    domain: stays in codegen, no distinct, no join — the recipe-side
    twin of etl.label_encode (which discovers its own domain)."""
    expr = None
    for i, v in enumerate(domain):
        cond = F.col(col) == F.lit(v)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    return df.withColumn(col, expr.cast("int"))


# ---------------------------------------------------------------------------
# adult — getdataset.py:10-83
# ---------------------------------------------------------------------------

ADULT_COLUMNS = [
    "age", "workclass", "fnlwgt", "education", "education-num",
    "marital-status", "occupation", "relationship", "race", "sex",
    "capital-gain", "capital-loss", "hours-per-week", "native-country",
    "income",
]

# pd.cut declared labels (getdataset.py:21-32): the Categorical carries
# every label, so get_dummies emits ALL of them, observed or not
ADULT_AGE_BINS = [0, 9, 19, 29, 39, 49, 59, 69, 99]
ADULT_AGE_LABELS = [
    "age<10", "age between 10 and 20", "age between 20 and 30",
    "age between 30 and 40", "age between 40 and 50",
    "age between 50 and 60", "age between 60 and 70", "age>70",
]
ADULT_HOUR_BINS = [0, 9, 19, 29, 39, 49, 99]
ADULT_HOUR_LABELS = [
    "hour<10", "hours between 10 and 20", "hours between 20 and 30",
    "hours between 30 and 40", "hour between 40 and 50", "hour>70",
]


def adult(raw: DataFrame) -> DataFrame:
    """Adult/Census-income recipe (getdataset.py:10-54): keep only
    Black/White rows, recode unknown country, bin age and weekly
    hours, one-hot five string columns plus the two bin columns,
    label-encode income, ordinal-encode sex/race (both lexicographic:
    sklearn LabelEncoder and OrdinalEncoder sort categories), rename
    ' Bachelors'→'Bachelors' and 'hour<10'→'hours'."""
    out = raw.filter(F.col("race").isin(" Black", " White"))
    out = etl.recode_when(
        out, "native-country", F.col("native-country") == " ?", "Not known"
    )
    out = etl.bucketize(out, "age", ADULT_AGE_BINS, ADULT_AGE_LABELS, out="age_class")
    out = etl.bucketize(
        out, "hours-per-week", ADULT_HOUR_BINS, ADULT_HOUR_LABELS,
        out="hour-per-week-class",
    )
    out = out.drop(
        "hours-per-week", "workclass", "fnlwgt", "capital-gain",
        "capital-loss", "age", "education-num",
    )
    cat_cols = ["education", "marital-status", "occupation", "relationship",
                "native-country"]
    enc_cols = ["income", "sex", "race"]
    doms = _observed_domains(out, cat_cols + enc_cols)
    for c in cat_cols:
        out = _dummies(out, c, doms[c])
    out = _dummies(out, "age_class", ADULT_AGE_LABELS)
    out = _dummies(out, "hour-per-week-class", ADULT_HOUR_LABELS)
    for c in enc_cols:
        out = _encode_lex(out, c, doms[c])
    return out.withColumnsRenamed({" Bachelors": "Bachelors", "hour<10": "hours"})


# ---------------------------------------------------------------------------
# cmc — getdataset.py:85-123
# ---------------------------------------------------------------------------

CMC_COLUMNS = [
    "wife_age", "wife_edu", "hus_edu", "num_child", "wife_religion",
    "wife_work", "hus_occ", "living", "media", "contr_use",
]


def cmc(raw: DataFrame, n_features: int = 2) -> DataFrame:
    """Contraceptive-method-choice recipe (getdataset.py:86-123): the
    named headerless scan IS the dataset; the only transform is the
    3-feature variant's wife_edu binarization at 33
    (getdataset.py:115-120)."""
    out = raw
    if n_features >= 3:
        out = etl.binarize(out, "wife_edu", 33)
    return out


# ---------------------------------------------------------------------------
# compas — getdataset.py:126-163
# ---------------------------------------------------------------------------

def compas(raw: DataFrame, n_features: int = 2) -> DataFrame:
    """COMPAS recipe (getdataset.py:128-158): indexed-CSV scan; the
    3-feature variant binarizes age at 50 (getdataset.py:137-141)."""
    out = raw
    if n_features >= 3:
        out = etl.binarize(out, "age", 50)
    return out


# ---------------------------------------------------------------------------
# crime — getdataset.py:165-224
# ---------------------------------------------------------------------------

def crime(raw: DataFrame, n_features: int = 2) -> DataFrame:
    """Communities-and-crime recipe (getdataset.py:167-200): drop id
    columns, drop columns containing any NA, z-score the whole table,
    build the 6-step cascading quantile class (the reference's exact
    in-place loop semantics — see quantile_class_cascade), binarize
    the two race-fraction columns on fixed thresholds of the z-scored
    values, and the 3-feature variant binarizes MedRent at 0.1."""
    out = raw.drop("state", "county", "community", "communityname",
                   "fold", "OtherPerCap")
    # drop columns with ANY null (isna().any() — not all-null): one
    # fused aggregate, driver-side drop list (config-scale)
    null_counts = out.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in out.columns]
    ).collect()[0]
    out = out.drop(*[c for c in out.columns if null_counts[c] > 0])
    out = etl.zscore(out, [c for c in out.columns])
    out = quantile_class_cascade(
        out, "ViolentCrimesPerPop", "ViolentCrimesClass",
        [0.0, 0.2, 0.4, 0.6, 0.8, 1.0], step=100,
    ).drop("ViolentCrimesPerPop")
    out = out.withColumn(
        "black_people", (F.col("racepctblack") > -0.45).cast("int")
    ).withColumn(
        "hisp_people", (F.col("racePctHisp") > -0.4).cast("int")
    ).drop("racepctblack", "racePctHisp")
    if n_features >= 3:
        out = etl.binarize(out, "MedRent", 0.1)
    return out


def quantile_class_cascade(
    df: DataFrame, col: str, out: str, probs: list[float], step: int = 100
) -> DataFrame:
    """The crime loader's idiosyncratic label construction
    (getdataset.py:173-180): copy the column, then for each quantile
    cl (ascending, np.quantile linear interpolation) run the IN-PLACE
    update ``class[class <= cl] = i*step``. Because the update reads
    its own output, earlier assignments (0, 100, …) are re-tested
    against later quantiles — faithful only as a sequential fold, so
    that exact fold is what we build: one exact-percentile aggregate
    (broadcast) + len(probs) chained CASE WHENs in a single plan."""
    qcol = f"__q_{col}"
    quantiles = df.agg(
        F.expr(
            f"percentile(`{col}`, array({', '.join(str(p) for p in probs)}))"
        ).alias(qcol)
    )
    cascaded = df.crossJoin(F.broadcast(quantiles)).withColumn(out, F.col(col))
    for i in range(len(probs)):
        cascaded = cascaded.withColumn(
            out,
            F.when(
                F.col(out) <= F.col(qcol)[i], F.lit(float(i * step))
            ).otherwise(F.col(out)),
        )
    return cascaded.drop(qcol)


# ---------------------------------------------------------------------------
# drug — getdataset.py:226-282
# ---------------------------------------------------------------------------

def drug(raw: DataFrame, n_features: int = 2) -> DataFrame:
    """Drug-consumption recipe (getdataset.py:228-240): drop the
    prediction artifacts, binarize gender by exact-value recode
    (±0.48246 are the only two values), integer-code y and race by
    dict replace, drop remaining string columns; 3-feature variant
    binarizes age at 0."""
    out = raw.drop("yhat", "a")
    out = etl.recode_when(out, "gender", F.col("gender") == 0.48246, 1.0)
    out = etl.recode_when(out, "gender", F.col("gender") == -0.48246, 0.0)
    out = etl.recode_map(
        out, "y", {"never": 0, "not last year": 1, "last year": 2}
    ).withColumn("y", F.col("y").cast("int"))
    out = etl.recode_map(out, "race", {"non-white": 0, "white": 1}).withColumn(
        "race", F.col("race").cast("int")
    )
    out = etl.drop_string_cols(out)
    if n_features >= 3:
        out = etl.binarize(out, "age", 0)
    return out


# ---------------------------------------------------------------------------
# german — getdataset.py:284-330
# ---------------------------------------------------------------------------

def german(raw: DataFrame, n_features: int = 2) -> DataFrame:
    """German-credit recipe (getdataset.py:286): the indexed scan is
    already model-ready; the 3-feature variant binarizes
    investment_as_income_percentage at 3 (getdataset.py:295-297)."""
    out = raw
    if n_features >= 3:
        out = etl.binarize(out, "investment_as_income_percentage", 3)
    return out


# ---------------------------------------------------------------------------
# law — getdataset.py:333-378
# ---------------------------------------------------------------------------

LAW_DROP = [
    "ID", "decile1b", "decile3", "decile1", "cluster", "bar1", "bar2",
    "sex", "male", "race1", "race2", "other", "asian", "black", "hisp",
    "bar", "index6040", "indxgrp", "indxgrp2", "dnn_bar_pass_prediction",
    "grad", "bar1_yr", "bar2_yr", "ugpa",
]


def law(raw: DataFrame, n_features: int = 2) -> DataFrame:
    """LSAC bar-passage recipe (getdataset.py:335-355): drop 24 id/
    leak columns, recode Dropout NO/YES→0/1 and gender
    female/male→1/0 (int casts), drop NA rows, collapse race to
    {7.0→0, else→1}, 3-quantile-cut gpa then label-encode (qcut
    labels a<b<c are already lexicographic, so the encoded class IS
    the quantile index); 3-feature variant binarizes age at 61."""
    out = raw.drop(*LAW_DROP)
    out = etl.recode_map(out, "Dropout", {"NO": 0, "YES": 1})
    out = out.withColumn("Dropout", F.col("Dropout").cast("int"))
    out = etl.drop_na_rows(out)
    out = etl.recode_map(out, "gender", {"female": 1, "male": 0})
    out = out.withColumn("gender", F.col("gender").cast("int"))
    out = etl.recode_when(out, "race", F.col("race") == 7.0, 0.0)
    out = etl.recode_when(out, "race", F.col("race") != 0.0, 1.0)
    out = etl.quantile_label(out, "gpa", 3, out="__gpa_class")
    out = out.drop("gpa").withColumnRenamed("__gpa_class", "gpa")
    if n_features >= 3:
        out = etl.binarize(out, "age", 61)
    return out


# ---------------------------------------------------------------------------
# obesity — getdataset.py:380-439
# ---------------------------------------------------------------------------

OBESITY_ENCODE = [
    "Gender", "family_history_with_overweight", "FAVC", "CAEC",
    "SMOKE", "SCC", "CALC", "MTRANS",
]


def obesity(raw: DataFrame, n_features: int = 2) -> DataFrame:
    """Obesity recipe (getdataset.py:382-401): drop label twins and
    prediction artifacts, label-encode 8 categorical columns
    (lexicographic), integer-code y by dict replace, binarize Age at
    22; 3-feature variant binarizes the (already-encoded) MTRANS code
    at 3 (getdataset.py:412-416)."""
    out = raw.drop("NObeyesdad", "weight_cat", "yhat", "a")
    doms = _observed_domains(out, OBESITY_ENCODE)
    for c in OBESITY_ENCODE:
        out = _encode_lex(out, c, doms[c])
    out = etl.recode_map(
        out, "y",
        {"Normal_Weight": 0, "Overweight_Level_I": 1,
         "Overweight_Level_II": 2, "Obesity_Type_I": 3,
         "Insufficient_Weight": 4},
    ).withColumn("y", F.col("y").cast("int"))
    out = etl.binarize(out, "Age", 22)
    if n_features >= 3:
        out = etl.binarize(out, "MTRANS", 3)
    return out


# ---------------------------------------------------------------------------
# park — getdataset.py:441-493
# ---------------------------------------------------------------------------

def park(
    raw: DataFrame,
    n_features: int = 2,
    seed: int = 42,
    relabel_key_cols: list[str] | None = None,
) -> DataFrame:
    """Parkinson's telemonitoring recipe (getdataset.py:443-452): drop
    ids and regression targets, binarize age at 65, integer-code the
    severity label, then inject label noise — 200 random rows from the
    (age=1, sex=1, score_cut=1) group are relabeled to 0
    (getdataset.py:451-452; unseeded there, seeded here for
    reproducibility); 3-feature variant binarizes PPE at 0.14.
    ``relabel_key_cols`` routes the 200-row selection through the
    portable md5 rank (engine-reproducible; the oracle-able path)
    instead of rand(seed)."""
    out = raw.drop("subject#", "a", "y", "yhat", "motor_UPDRS",
                   "total_UPDRS", "test_time")
    out = etl.binarize(out, "age", 65)
    out = etl.recode_map(
        out, "score_cut", {"Mild": 0, "Moderate": 1, "Severe": 2}
    ).withColumn("score_cut", F.col("score_cut").cast("int"))
    out = etl.random_relabel(
        out,
        (F.col("age") == 1) & (F.col("sex") == 1) & (F.col("score_cut") == 1),
        "score_cut", 0, n=200, seed=seed, key_cols=relabel_key_cols,
    )
    if n_features >= 3:
        out = etl.binarize(out, "PPE", 0.14)
    return out


# ---------------------------------------------------------------------------
# wine — getdataset.py:495-541
# ---------------------------------------------------------------------------

def wine(red: DataFrame, white: DataFrame, n_features: int = 2) -> DataFrame:
    """Wine-quality recipe (getdataset.py:497-502): union red (type=0)
    and white (type=1), drop quality∈{3,8,9} rows, then the loader's
    exact two-step alcohol binarization — ``alcohol <= 10 → 0`` then
    ``(alcohol > 10) & (alcohol != 0) → 1`` (the second guard is
    vestigial after the first pass but reproduced as written);
    3-feature variant binarizes density at 1.1."""
    out = etl.union_provenance(red, white, "type", 0, 1)
    out = out.filter(~F.col("quality").isin(3, 8, 9))
    out = etl.recode_when(out, "alcohol", F.col("alcohol") <= 10, 0.0)
    out = etl.recode_when(
        out, "alcohol", (F.col("alcohol") > 10) & (F.col("alcohol") != 0), 1.0
    )
    if n_features >= 3:
        out = etl.binarize(out, "density", 1.1)
    return out


# ---------------------------------------------------------------------------
# fairness configs — each loader's label / positive_label / unpriv
# dispatch table (the sfs dict + numberoffeatures branches)
# ---------------------------------------------------------------------------

def unpriv_for(dataset: str, features: list[str]) -> dict[str, Any]:
    """The loaders' ``sensitivefeature`` custom-selection branch
    (e.g. getdataset.py:60-69): build the unprivileged-group dict for
    an arbitrary subset of the dataset's sensitive features, raising
    on unknown names exactly like the reference. Features whose
    unprivileged value presumes a threshold binarization (the third
    ``sfs`` entry of most loaders) require running the recipe with
    ``n_features=3`` so the column is binarized first."""
    sfs = FAIRNESS[dataset]["sfs"]
    out = {}
    for f in features:
        if f not in sfs:
            raise ValueError(
                f"Sensitive feature {f!r} not found in dataset {dataset!r}; "
                f"available: {sorted(sfs)}"
            )
        out[f] = sfs[f]
    return out


FAIRNESS: dict[str, dict[str, Any]] = {
    "adult": {                                  # getdataset.py:55-82
        "label": "income", "positive_label": 1,
        "sfs": {'sex': 0, 'race': 0, 'Bachelors': 0},
        "unpriv": {1: {"sex": 0}, 2: {"sex": 0, "race": 0},
                   3: {"sex": 0, "race": 0, "Bachelors": 0}},
    },
    "cmc": {                                    # getdataset.py:87-122
        "label": "contr_use", "positive_label": 2,
        "sfs": {'wife_religion': 1, 'wife_work': 1, 'wife_edu': 0},
        "unpriv": {1: {"wife_religion": 1},
                   2: {"wife_religion": 1, "wife_work": 1},
                   3: {"wife_religion": 1, "wife_work": 1, "wife_edu": 0}},
    },
    "compas": {                                 # getdataset.py:129-158
        "label": "two_year_recid", "positive_label": 1,
        "sfs": {'sex': 0, 'race': 0, 'age': 0},
        "unpriv": {1: {"sex": 0}, 2: {"sex": 0, "race": 0},
                   3: {"sex": 0, "race": 0, "age": 0}},
    },
    "crime": {                                  # getdataset.py:188-220
        "label": "ViolentCrimesClass", "positive_label": 100,
        "sfs": {'black_people': 1, 'hisp_people': 1, 'MedRent': 1},
        "unpriv": {1: {"black_people": 1},
                   2: {"black_people": 1, "hisp_people": 1},
                   3: {"black_people": 1, "hisp_people": 1, "MedRent": 1}},
    },
    "drug": {                                   # getdataset.py:242-276
        "label": "y", "positive_label": 0,
        "sfs": {'race': 1, 'gender': 0, 'age': 1},
        "unpriv": {1: {"race": 1}, 2: {"race": 1, "gender": 0},
                   3: {"race": 1, "gender": 0, "age": 1}},
    },
    "german": {                                 # getdataset.py:288-326
        "label": "credit", "positive_label": 1,
        "sfs": {'sex': 0, 'age': 0, 'investment_as_income_percentage': 0},
        "unpriv": {1: {"sex": 0}, 2: {"sex": 0, "age": 0},
                   3: {"sex": 0, "age": 0,
                       "investment_as_income_percentage": 0}},
    },
    "law": {                                    # getdataset.py:356-375
        "label": "gpa", "positive_label": 2,
        "sfs": {'race': 1, 'gender': 1, 'age': 0},
        "unpriv": {1: {"race": 1}, 2: {"race": 1, "gender": 1},
                   3: {"race": 1, "gender": 1, "age": 0}},
    },
    "obesity": {                                # getdataset.py:404-436
        "label": "y", "positive_label": 0,
        "sfs": {'Gender': 1, 'Age': 1, 'MTRANS': 1},
        "unpriv": {1: {"Gender": 1}, 2: {"Gender": 1, "Age": 1},
                   3: {"Gender": 1, "Age": 1, "MTRANS": 1}},
    },
    "park": {                                   # getdataset.py:456-488
        "label": "score_cut", "positive_label": 0,
        "sfs": {'age': 1, 'sex': 0, 'PPE': 0},
        "unpriv": {1: {"age": 1}, 2: {"age": 1, "sex": 0},
                   3: {"age": 1, "sex": 0, "PPE": 0}},
    },
    "wine": {                                   # getdataset.py:504-538
        "label": "quality", "positive_label": 6,
        "sfs": {'alcohol': 0, 'type': 1, 'density': 0},
        "unpriv": {1: {"alcohol": 0}, 2: {"alcohol": 0, "type": 1},
                   3: {"alcohol": 0, "type": 1, "density": 0}},
    },
}


# ---------------------------------------------------------------------------
# file loaders — reader wiring for users holding the original files
# ---------------------------------------------------------------------------

def load_adult(spark: SparkSession, path: str) -> DataFrame:
    from demv_spark.sources.readers import read_csv_noheader

    return adult(read_csv_noheader(spark, path, ADULT_COLUMNS))


def load_cmc(spark: SparkSession, path: str, n_features: int = 2) -> DataFrame:
    from demv_spark.sources.readers import read_csv_noheader

    return cmc(read_csv_noheader(spark, path, CMC_COLUMNS), n_features)


def load_compas(spark: SparkSession, path: str, n_features: int = 2) -> DataFrame:
    from demv_spark.sources.readers import read_csv

    raw = read_csv(spark, path)
    return compas(raw.drop(raw.columns[0]), n_features)


def load_crime(spark: SparkSession, path: str, n_features: int = 2) -> DataFrame:
    from demv_spark.sources.readers import read_excel

    return crime(read_excel(spark, path, na_values="?"), n_features)


def load_drug(spark: SparkSession, path: str, n_features: int = 2) -> DataFrame:
    from demv_spark.sources.readers import read_csv

    return drug(read_csv(spark, path), n_features)


def load_german(spark: SparkSession, path: str, n_features: int = 2) -> DataFrame:
    from demv_spark.sources.readers import read_csv

    raw = read_csv(spark, path)
    return german(raw.drop(raw.columns[0]), n_features)


def load_law(spark: SparkSession, path: str, n_features: int = 2) -> DataFrame:
    from demv_spark.sources.readers import read_csv

    raw = read_csv(spark, path)
    return law(raw.drop(raw.columns[0]), n_features)


def load_obesity(spark: SparkSession, path: str, n_features: int = 2) -> DataFrame:
    from demv_spark.sources.readers import read_csv

    return obesity(read_csv(spark, path), n_features)


def load_park(spark: SparkSession, path: str, n_features: int = 2) -> DataFrame:
    from demv_spark.sources.readers import read_csv

    return park(read_csv(spark, path), n_features)


def load_wine(
    spark: SparkSession, red_path: str, white_path: str, n_features: int = 2
) -> DataFrame:
    from demv_spark.sources.readers import read_csv_semicolon

    return wine(
        read_csv_semicolon(spark, red_path),
        read_csv_semicolon(spark, white_path),
        n_features,
    )
