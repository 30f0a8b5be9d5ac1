"""Data-contract validation: fused one-pass report, row flags,
uniqueness census."""

import pyspark.sql.functions as F
import pytest

from demv_spark.operators import validate as V


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [
        (1, 10.0, "F", "ok"),
        (2, -5.0, "X", ""),        # range + set + empty violations
        (None, 50.0, "O", "ok"),   # null key
        (4, None, "F", None),      # null price passes range; null str empty
        (1, 20.0, "P", "ok"),      # duplicate key 1
    ]
    return spark.createDataFrame(rows, ["k", "price", "status", "note"])


RULES = lambda: {
    "k_not_null": V.not_null("k"),
    "price_in_range": V.in_range("price", 0.0, 100.0),
    "status_in_set": V.in_set("status", ["F", "O", "P"]),
    "note_non_empty": V.non_empty("note"),
}


def test_expectation_report_counts(spark, tbl):
    got = {r["rule"]: (r["violations"], r["n_rows"])
           for r in V.expectation_report(tbl, RULES()).collect()}
    assert got == {
        "k_not_null": (1, 5),
        "price_in_range": (1, 5),       # NULL price passes (SQL BETWEEN)
        "status_in_set": (1, 5),
        "note_non_empty": (2, 5),       # '' and NULL
    }


def test_expectation_report_is_one_pass(spark, tbl):
    """The whole contract must be one aggregate over one scan — no
    per-rule jobs."""
    from demv_spark.plans.introspect import explain_str

    plan = explain_str(V.expectation_report(tbl, RULES()), "simple")
    assert plan.count("Scan") == 1


def test_flag_violations_rows(spark, tbl):
    rows = V.flag_violations(tbl, RULES()).collect()
    by_note = {(r["k"], r["price"]): r["violations"] for r in rows}
    assert by_note[(2, -5.0)] == ["note_non_empty", "price_in_range", "status_in_set"]
    assert by_note[(1, 10.0)] == []
    assert by_note[(None, 50.0)] == ["k_not_null"]
    with pytest.raises(ValueError):
        V.flag_violations(tbl.withColumn("violations", F.lit(1)), RULES())


def test_duplicate_key_report(spark, tbl):
    r = V.duplicate_key_report(tbl, ["k"]).collect()[0]
    # keys: 1 (x2), 2, None, 4 -> 4 keys, 1 dup key, 2 dup rows
    assert (r["n_rows"], r["n_keys"], r["n_dup_keys"], r["n_dup_rows"]) == (5, 4, 1, 2)


def test_duplicate_key_report_empty(spark, tbl):
    r = V.duplicate_key_report(tbl.filter(F.lit(False)), ["k"]).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["n_dup_keys"], r["n_dup_rows"]) == (0, 0, 0, 0)
