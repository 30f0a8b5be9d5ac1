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


# ---- t-closeness (round 9) ----

def test_t_closeness_python_mirror(spark):
    """Hand mirror of the cross-multiplied ordered-EMD numerator on a
    tiny table, including a group missing one sensitive value (the
    zero-count cell the cumulative sum must see)."""
    from fractions import Fraction

    from demv_spark.operators.privacy import t_closeness_census

    rows = [
        ("a", "low"), ("a", "low"), ("a", "high"),
        ("b", "low"), ("b", "mid"), ("b", "mid"), ("b", "high"),
        ("c", "mid"),
    ]
    df = spark.createDataFrame(rows, ["q", "s"])
    got = {r["q"]: r for r in
           t_closeness_census(df, ["q"], "s").collect()}

    from collections import Counter
    N = len(rows)
    dom = sorted({s for _, s in rows})
    gc = Counter(s for _, s in rows)
    for q in ("a", "b", "c"):
        grp = [s for qq, s in rows if qq == q]
        ng = len(grp)
        c = Counter(grp)
        cum_c = cum_g = 0
        num = 0
        for s in dom:
            cum_c += c[s]
            cum_g += gc[s]
            num += abs(cum_c * N - cum_g * ng)
        r = got[q]
        assert (r["n"], r["dist_num"]) == (ng, num), q
        assert r["n_total"] == N and r["m_values"] == len(dom)
        # the actual EMD as a rational, sanity: in [0, 1]
        emd = Fraction(num, (len(dom) - 1) * ng * N)
        assert 0 <= emd <= 1


def test_t_closeness_uniform_group_scores_zero(spark):
    """A group whose sensitive distribution equals the global one has
    dist_num == 0 exactly; determinism under repartitioning."""
    import pyspark.sql.functions as F

    from demv_spark.operators.privacy import t_closeness_census

    # two groups with IDENTICAL value mixes -> both distributions
    # equal the global -> EMD 0
    rows = [(g, s) for g in ("x", "y") for s in
            ["low"] * 3 + ["mid"] * 2 + ["high"]]
    df = spark.createDataFrame(rows, ["q", "s"])
    out = t_closeness_census(df, ["q"], "s")
    assert {r["dist_num"] for r in out.collect()} == {0}
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple,
                   t_closeness_census(df.repartition(7), ["q"], "s").collect()))
    assert a == b
