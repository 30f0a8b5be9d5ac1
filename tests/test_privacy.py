"""k-anonymity / l-diversity counting screens."""

import pyspark.sql.functions as F
import pytest

from demv_spark.operators.privacy import (
    anonymity_report,
    k_anonymity_census,
    l_diversity_census,
    suppress_rare_groups,
)
from demv_spark.plans.introspect import plan_stats


@pytest.fixture(scope="module")
def people(spark):
    # (zip, age_band, disease): zip A/30s has 3 rows but homogeneous
    # disease; zip B/40s has 1 row; zip C/30s has 2 rows, 2 diseases
    rows = [
        ("A", "30s", "flu"), ("A", "30s", "flu"), ("A", "30s", "flu"),
        ("B", "40s", "cancer"),
        ("C", "30s", "flu"), ("C", "30s", "cold"),
    ]
    return spark.createDataFrame(rows, "zip string, age string, disease string")


def test_k_anonymity_census(people):
    got = {(r["zip"], r["age"]): (r["n"], r["anonymous"]) for r in
           k_anonymity_census(people, ["zip", "age"], k=2).collect()}
    assert got == {("A", "30s"): (3, True), ("B", "40s"): (1, False),
                   ("C", "30s"): (2, True)}


def test_suppress_rare_groups(people):
    kept = suppress_rare_groups(people, ["zip", "age"], k=2)
    assert kept.columns == people.columns
    assert {r["zip"] for r in kept.collect()} == {"A", "C"}
    assert kept.count() == 5


def test_l_diversity_catches_homogeneous_group(people):
    got = {(r["zip"], r["age"]): (r["n_sensitive"], r["diverse"]) for r in
           l_diversity_census(people, ["zip", "age"], "disease", l=2).collect()}
    # A is 3-anonymous but 1-diverse — the homogeneity attack
    assert got[("A", "30s")] == (1, False)
    assert got[("C", "30s")] == (2, True)
    assert got[("B", "40s")] == (1, False)


def test_l_diversity_null_not_a_value(spark):
    df = spark.createDataFrame(
        [("A", "flu"), ("A", None)], "zip string, disease string"
    )
    got = l_diversity_census(df, ["zip"], "disease", l=2).collect()[0]
    assert got["n_sensitive"] == 1 and not got["diverse"]


def test_anonymity_report(people):
    got = {r["k"]: (r["n_groups"], r["groups_below"], r["rows_below"]) for r in
           anonymity_report(people, ["zip", "age"], ks=[2, 3, 4]).collect()}
    assert got[2] == (3, 1, 1)
    assert got[3] == (3, 2, 3)
    assert got[4] == (3, 3, 6)


def test_no_python_udf(people):
    for d in (
        k_anonymity_census(people, ["zip"], 2),
        suppress_rare_groups(people, ["zip"], 2),
        l_diversity_census(people, ["zip"], "disease", 2),
        anonymity_report(people, ["zip"], [2]),
    ):
        assert not plan_stats(d)["has_python_udf"]
