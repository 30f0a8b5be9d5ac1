"""Scale-property assertions on physical plans (SURVEY §4): these
lock in the shuffle/scan/broadcast shape of the core operators so a
refactor that silently doubles scans or drops a broadcast fails CI."""

import pyspark.sql.functions as F
import pytest

from demv_spark.functions import counting, metrics as M
from demv_spark.operators import etl, similarity
from demv_spark.operators.balancer import DEMV
from demv_spark.plans.introspect import plan_stats
from demv_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return read_table(spark, SF, "orders")


def test_group_weights_single_scan(orders):
    s = plan_stats(counting.group_weights(orders, ["o_orderpriority"], "o_orderstatus", None))
    assert len(s["read_schemas"]) == 1, "marginals must not re-scan the base table"
    assert s["n_exchanges"] <= 4
    assert not s["has_python_udf"]


def test_fairness_suite_single_pass(orders):
    s = plan_stats(
        M.fairness_suite(
            orders.withColumn("y_true", F.col("o_orderstatus")).withColumn("y_pred", F.lit("F")),
            F.col("o_orderpriority") == "5-LOW",
            F.col("o_totalprice") > 0,
            F.col("o_orderstatus") == "F",
            "y_true", "y_pred",
        )
    )
    assert len(s["read_schemas"]) == 1          # all 12 counts in one scan
    assert s["n_exchanges"] <= 2                # partial+final agg only
    # only needed columns reach the scan
    assert all("o_orderkey" not in rs for rs in s["read_schemas"])


def test_rebalance_plan_broadcast_and_single_scan(orders):
    tbl = orders.select(
        (F.col("o_orderpriority") == "5-LOW").cast("int").alias("s"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        "o_orderkey",
    )
    d = DEMV(["s"], label="y", seed=1)
    d.fit(tbl)
    s = plan_stats(d.transform(tbl))
    assert len(s["read_schemas"]) == 1
    assert s["n_broadcasts"] >= 1               # target map is broadcast
    assert s["n_sort_merge_joins"] == 0


def test_cosine_topk_broadcasts_queries(spark):
    emb = read_table(spark, SF, "embeddings")
    s = plan_stats(
        similarity.cosine_topk_bruteforce(emb.filter(F.col("vec_id") < 3), emb, k=5)
    )
    assert s["n_broadcasts"] >= 1               # query side broadcast, corpus never shuffled for the join
    assert any("LessThan(vec_id,3)" in p for p in s["pushed_filters"])


def test_zscore_two_scans_max(orders):
    s = plan_stats(etl.zscore(orders.select("o_orderkey", "o_totalprice"), ["o_totalprice"]))
    # one scan for the stats aggregate + one for the output rows —
    # a window-over-all alternative would shuffle the entire table
    assert len(s["read_schemas"]) <= 2
    assert s["n_broadcasts"] >= 1


def test_label_encode_broadcasts_codes(spark):
    cust = read_table(spark, SF, "customer")
    s = plan_stats(etl.label_encode(cust, "c_mktsegment"))
    assert s["n_broadcasts"] >= 1
    assert s["n_sort_merge_joins"] == 0


def test_fairness_by_group_single_scan(orders):
    from demv_spark.functions import metrics as M
    import pyspark.sql.functions as F

    s = plan_stats(
        M.fairness_by_group(
            orders.withColumn("m", (F.col("o_custkey") % 3).cast("int")),
            ["o_orderpriority", "m"],
            F.col("o_totalprice") > 250000,
            F.col("o_orderstatus") == "F",
        )
    )
    assert len(s["read_schemas"]) == 1, "per-group view must not re-scan per group"
    assert not s["has_python_udf"]
