"""Unicode script census (round-6 multilingual curation router)."""

import duckdb
import pyspark.sql.functions as F
import pytest

from demv_spark.operators.text import SCRIPT_RANGES, script_profile
from demv_spark.plans.introspect import plan_stats

FIXTURE = [
    (0, "hello world plain ascii"),
    (1, "Привет мир по-русски"),
    (2, "北京 and two words"),          # 2 CJK chars vs 15 latin
    (3, "מזל טוב"),
    (4, "नमस्ते"),
    (5, "123 456"),
    (6, ""),
    (7, None),
    (8, "mixé café"),                   # accented latin stays latin
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(FIXTURE, ["doc_id", "text"])


def test_dominant_script(docs):
    got = {r["doc_id"]: r["script_main"] for r in script_profile(docs).collect()}
    assert got[0] == "latin"
    assert got[1] == "cyrillic"
    assert got[2] == "latin"            # latin majority despite CJK
    assert got[3] == "hebrew"
    assert got[4] == "devanagari"
    assert got[5] == "digit"
    assert got[6] == "und" and got[7] == "und"
    assert got[8] == "latin"


def test_counts_match_duckdb_exactly(docs):
    """Cross-engine parity of every range — the property the oracle
    relies on, checked directly against RE2."""
    spark_rows = {
        r["doc_id"]: r.asDict() for r in script_profile(docs).collect()
    }
    con = duckdb.connect()
    for doc_id, text in FIXTURE:
        for name, rng in SCRIPT_RANGES.items():
            (n,) = con.execute(
                "SELECT len(regexp_extract_all(coalesce(?, ''), ?))",
                [text, rng],
            ).fetchone()
            assert spark_rows[doc_id][f"n_{name}"] == n, (doc_id, name)


def test_map_only(docs):
    s = plan_stats(script_profile(docs))
    assert s["n_exchanges"] == 0
    assert not s["has_python_udf"]


def test_tie_breaks_by_range_order(spark):
    # equal latin and cyrillic counts -> latin (first in order)
    df = spark.createDataFrame([(0, "ab Пр")], ["doc_id", "text"])
    assert script_profile(df).collect()[0]["script_main"] == "latin"
