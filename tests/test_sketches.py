"""Count-min / Bloom: exact-contract sketches (portable-hash state)."""

import pyspark.sql.functions as F
import pytest

from demv_spark.functions.sketches import (
    bloom_build,
    bloom_probe,
    countmin_counters,
    countmin_estimate,
)
from demv_spark.plans.introspect import plan_stats


@pytest.fixture(scope="module")
def keys(spark):
    # zipf-ish: key k appears 101-k times, k in 1..100
    rows = [(k,) for k in range(1, 101) for _ in range(101 - k)]
    return spark.createDataFrame(rows, "k long").cache()


def test_countmin_overestimates_never_under(spark, keys):
    cs = countmin_counters(keys, "k", depth=4, width=256).cache()
    probes = spark.createDataFrame([(k,) for k in range(1, 101)], "k long")
    est = {r["k"]: r["est_count"] for r in
           countmin_estimate(cs, probes, "k", depth=4, width=256).collect()}
    for k in range(1, 101):
        true = 101 - k
        assert est[k] >= true                      # upper bound, always
    # with 256 buckets over 100 keys the heavy keys are near-exact
    assert est[1] == 100 or est[1] - 100 <= 60


def test_countmin_unseen_key_and_weights(spark, keys):
    cs = countmin_counters(keys, "k", depth=4, width=4096)
    probes = spark.createDataFrame([(999999,)], "k long")
    est = countmin_estimate(cs, probes, "k", depth=4, width=4096).collect()[0]
    assert est["est_count"] >= 0                  # may collide, never negative
    # weighted build: each row contributes its weight
    w = keys.withColumn("w", F.lit(3))
    cw = countmin_counters(w, "k", depth=4, width=4096, weight_col="w")
    p1 = spark.createDataFrame([(1,)], "k long")
    e3 = countmin_estimate(cw, p1, "k", depth=4, width=4096).collect()[0]["est_count"]
    e1 = countmin_estimate(
        countmin_counters(keys, "k", depth=4, width=4096), p1, "k",
        depth=4, width=4096,
    ).collect()[0]["est_count"]
    assert e3 == 3 * e1


def test_countmin_bounded_state_and_merge(spark, keys):
    cs = countmin_counters(keys, "k", depth=4, width=64)
    assert cs.count() <= 4 * 64
    # associative merge: union + re-sum == build over the union
    half1 = keys.filter("k <= 50")
    half2 = keys.filter("k > 50")
    merged = (
        countmin_counters(half1, "k", depth=4, width=64)
        .unionByName(countmin_counters(half2, "k", depth=4, width=64))
        .groupBy("d", "bucket").agg(F.sum("counter").alias("counter"))
    )
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, cs.collect()))
    assert a == b


def test_bloom_no_false_negatives(spark, keys):
    members = keys.select("k").distinct()
    bf = bloom_build(members, "k").cache()
    got = {r["k"]: r["might_contain"] for r in
           bloom_probe(bf, members, "k").collect()}
    assert all(got.values())                     # every member found
    # state is bounded
    assert bf.count() <= (1 << 16) // 32


def test_bloom_rejects_most_nonmembers(spark, keys):
    members = keys.select("k").distinct()        # 1..100
    bf = bloom_build(members, "k")
    probes = spark.createDataFrame([(k,) for k in range(1000, 2000)], "k long")
    got = bloom_probe(bf, probes, "k").collect()
    fp = sum(1 for r in got if r["might_contain"])
    # m/n = 65536/100 -> fp rate astronomically small; allow slack
    assert fp <= 5


def test_sketches_deterministic_and_no_udf(spark, keys):
    a = sorted(map(tuple, countmin_counters(keys, "k", width=64).collect()))
    b = sorted(map(tuple, countmin_counters(keys.repartition(7), "k", width=64).collect()))
    assert a == b
    c = sorted(map(tuple, bloom_build(keys, "k").collect()))
    d = sorted(map(tuple, bloom_build(keys.repartition(5), "k").collect()))
    assert c == d
    assert not plan_stats(countmin_counters(keys, "k"))["has_python_udf"]
    assert not plan_stats(bloom_build(keys, "k"))["has_python_udf"]


def test_kmv_exact_below_k(spark):
    from demv_spark.functions.sketches import kmv_distinct

    df = spark.createDataFrame([(i % 10,) for i in range(1000)], "k long")
    got = kmv_distinct(df, "k", k=64).collect()[0]
    assert got["n_kept"] == 10
    assert got["est_distinct"] == 10             # exact below k


def test_kmv_estimate_above_k_is_close(spark):
    from demv_spark.functions.sketches import kmv_distinct

    df = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    got = kmv_distinct(df, "k", k=256).collect()[0]
    assert got["n_kept"] == 256
    # KMV std err ~ 1/sqrt(k) ≈ 6%; allow 4 sigma
    assert abs(got["est_distinct"] - 5000) < 5000 * 0.25


def test_kmv_grouped_and_merge(spark):
    from demv_spark.functions.sketches import kmv_distinct
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i) for i in range(500)],
        "g string, k long",
    )
    got = {r["g"]: (r["n_kept"], r["est_distinct"]) for r in
           kmv_distinct(df, "k", group_cols=["g"], k=32).collect()}
    assert got["a"] == (7, 7)
    assert abs(got["b"][1] - 500) < 500 * 0.5
    # determinism under repartition
    a = sorted(map(tuple, kmv_distinct(df, "k", ["g"], k=32).collect()))
    b = sorted(map(tuple, kmv_distinct(df.repartition(7), "k", ["g"], k=32).collect()))
    assert a == b
