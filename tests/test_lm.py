"""Bigram surprisal scoring (round-6 LM quality filter)."""

import pyspark.sql.functions as F
import pytest

from demv_spark.operators import lm
from demv_spark.plans.introspect import plan_stats


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the hat"),
        (2, "the dog sat on the mat"),
        (3, "zq xv"),                  # all-OOV bigram
        (4, "single"),                 # < 2 tokens -> no bigrams
        (5, None),                     # NULL text
        (6, "the cat sat"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_counts_and_bits(corpus):
    m = {r["bigram"]: r for r in lm.train_bigram_model(corpus, min_count=2).collect()}
    # 'the cat' occurs in docs 0, 1, 6 -> count 3
    assert m["the cat"]["n_bigram"] == 3
    # prefix 'the' starts: the cat x3, the dog x1, the mat x2, the hat x1 -> 7
    assert m["the cat"]["n_prefix"] == 7
    # bits = bitlen(7) - bitlen(3) = 3 - 2 = 1
    assert m["the cat"]["bits"] == 1
    # min_count=2 prunes 'the dog' (count 1)
    assert "the dog" not in m
    # prefix totals come from the UNPRUNED census: 'sat on' count 3,
    # prefix 'sat' total 3 -> bits = bitlen(3)-bitlen(3) = 0
    assert m["sat on"]["bits"] == 0


def test_score_exact_integers(corpus):
    got = {r["doc_id"]: r for r in
           lm.bigram_surprisal_selfscore(corpus, min_count=2, oov_bits=20).collect()}
    # doc 3: one bigram 'zq xv', OOV
    assert got[3]["n_bigrams"] == 1 and got[3]["n_oov"] == 1
    assert got[3]["total_bits"] == 20
    assert got[3]["bits_per_bigram"] == 20.0
    # docs with < 2 tokens: zero bigrams, NULL mean, rows KEPT
    assert got[4]["n_bigrams"] == 0 and got[4]["bits_per_bigram"] is None
    assert got[5]["n_bigrams"] == 0
    # doc 6 'the cat sat': bigrams 'the cat'(1 bit) + 'cat sat'
    # (count 3, prefix 'cat' total 3 -> 0 bits) -> total 1
    assert got[6]["n_bigrams"] == 2 and got[6]["n_oov"] == 0
    assert got[6]["total_bits"] == 1
    assert got[6]["bits_per_bigram"] == 0.5
    # every doc present exactly once
    assert len(got) == 7


def test_gibberish_scores_higher_than_templated(spark):
    rows = [(i, "common phrase repeated here") for i in range(20)]
    rows += [(100, "common phrase repeated here"), (101, "zzq wkx vvb qqj")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["bits_per_bigram"] for r in
           lm.bigram_surprisal_selfscore(df, min_count=2).collect()}
    assert got[101] > got[100]


def test_model_join_broadcasts_by_default(corpus):
    out = lm.bigram_surprisal_selfscore(corpus)
    s = plan_stats(out)
    assert s["n_broadcasts"] >= 1
    assert not s["has_python_udf"]


def test_single_train_scan_three_exchanges(spark):
    """Train = ONE census shuffle + census-sized prefix window; score
    = one per-doc agg — 3 exchanges, 3 scans (spine, score, train) on
    a parquet-backed table. A 4th exchange/scan means the prefix
    self-join (which re-derived the whole census from a second corpus
    scan) leaked back in."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s = plan_stats(lm.bigram_surprisal_selfscore(d))
    assert s["n_exchanges"] <= 3
    assert len(s["read_schemas"]) <= 3


def test_deterministic_under_repartition(corpus):
    a = sorted(map(tuple, lm.bigram_surprisal_selfscore(corpus).collect()))
    b = sorted(map(tuple,
                   lm.bigram_surprisal_selfscore(corpus.repartition(7)).collect()))
    assert a == b
