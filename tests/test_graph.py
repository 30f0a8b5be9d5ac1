"""Integer PageRank (round-6 domain-authority scoring)."""

import pyspark.sql.functions as F
import pytest

from demv_spark.operators.graph import pagerank_integer
from demv_spark.plans.introspect import plan_stats


@pytest.fixture(scope="module")
def chain(spark):
    # a -> b -> c, plus d -> c (c is the authority sink)
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "c")], ["src", "dst"]
    )


def test_hand_computed_one_iteration(spark, chain):
    """scale 1e6, 1 iteration: base = 150000.
    b gets a's full rank (deg 1): 150000 + 85*1000000//100 = 1000000.
    c gets b + d: 150000 + 85*2000000//100 = 1850000.
    a and d get nothing: 150000."""
    got = {r["node"]: r["rank_int"] for r in
           pagerank_integer(chain, iterations=1).collect()}
    assert got == {"a": 150000, "d": 150000, "b": 1000000, "c": 1850000}


def test_authority_ordering_after_five(chain):
    got = {r["node"]: r["rank_int"] for r in pagerank_integer(chain).collect()}
    assert got["c"] > got["b"] > got["a"] == got["d"]


def test_duplicate_edges_count_once(spark):
    single = spark.createDataFrame([("a", "b")], ["src", "dst"])
    dup = spark.createDataFrame([("a", "b")] * 5, ["src", "dst"])
    a = sorted(map(tuple, pagerank_integer(single).collect()))
    b = sorted(map(tuple, pagerank_integer(dup).collect()))
    assert a == b


def test_deterministic_under_repartition(spark, chain):
    a = sorted(map(tuple, pagerank_integer(chain).collect()))
    b = sorted(map(tuple, pagerank_integer(chain.repartition(7)).collect()))
    assert a == b


def test_dangling_node_keeps_receiving(spark):
    # c has no out-edges: its rank must still accumulate, its mass
    # just never redistributes (the documented simple formulation)
    df = spark.createDataFrame([("a", "c"), ("b", "c")], ["src", "dst"])
    got = {r["node"]: r["rank_int"] for r in
           pagerank_integer(df, iterations=3).collect()}
    assert got["c"] > got["a"] == got["b"] == 150000


def test_no_python_udf(chain):
    s = plan_stats(pagerank_integer(chain, iterations=2))
    assert not s["has_python_udf"]
