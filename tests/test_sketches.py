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


# ---- HyperLogLog (round 8): exact-register contract ----

def _py_hll_register(key, p=8, seed=7):
    import hashlib

    h = int(hashlib.md5(f"hll{seed}:{key}".encode()).hexdigest()[:15], 16)
    suffix_bits = 60 - p
    bucket = h >> suffix_bits
    suffix = h % (1 << suffix_bits)
    rho = (suffix_bits + 1) - suffix.bit_length() if suffix else suffix_bits + 1
    return bucket, rho


def test_hll_registers_python_mirror(spark):
    """Every (bucket, max_rho) row equals the md5 arithmetic computed
    independently in Python — the register state is an exact integer
    function of the data, not an engine artifact."""
    from demv_spark.functions.sketches import hll_registers

    keys = [str(i * 37) for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r["bucket"], r["max_rho"])
        for r in hll_registers(df, "k", p=8).collect()
    }
    want = {}
    for k in keys:
        b, rho = _py_hll_register(k)
        want[b] = max(want.get(b, 0), rho)
    assert got == set(want.items())


def test_hll_estimate_accuracy_and_merge(spark):
    """Raw estimate within the standard ~1.04/sqrt(m) band on a real
    id domain, and the register algebra is associative: union of two
    halves' registers re-maxed == the full build."""
    import pyspark.sql.functions as F

    from demv_spark.functions.sketches import hll_estimate, hll_registers

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    # raw-estimator regime (n >> 2.5m): the order-key domain
    true = orders.select("o_orderkey").distinct().count()
    regs = hll_registers(orders, "o_orderkey", p=8)
    est = hll_estimate(regs, p=8).collect()[0]
    assert true > 2.5 * 256
    assert abs(est["est_raw"] - true) / true < 0.20   # 3 sigma at m=256
    assert est["n_registers"] + est["n_zero_registers"] == 256

    # small-range regime (the o_custkey domain, 150 distinct): the
    # emitted exact components drive linear counting downstream —
    # m*ln(m/V) recovers the truth where the raw estimator is biased
    import math

    small = hll_estimate(hll_registers(orders, "o_custkey", p=8), p=8).collect()[0]
    true_small = orders.select("o_custkey").distinct().count()
    v = small["n_zero_registers"]
    assert v > 0
    lc = 256 * math.log(256 / v)
    assert abs(lc - true_small) / true_small < 0.15

    a = hll_registers(orders.filter(F.col("o_orderkey") % 2 == 0), "o_orderkey", p=8)
    b = hll_registers(orders.filter(F.col("o_orderkey") % 2 == 1), "o_orderkey", p=8)
    merged = (
        a.unionByName(b).groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, regs.collect()))


def test_hll_grouped_and_repartition_deterministic(spark):
    from demv_spark.functions.sketches import hll_registers

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(map(tuple, hll_registers(
        ev, "user_id", group_cols=["event_type"], p=6).collect()))
    b = sorted(map(tuple, hll_registers(
        ev.repartition(13), "user_id", group_cols=["event_type"], p=6).collect()))
    assert a == b and len(a) > 0
    # at most m rows per group
    import collections
    per = collections.Counter(r[0] for r in a)
    assert max(per.values()) <= 64


def test_hll_small_p_constants_and_bounds(spark):
    """ADVICE r8: the asymptotic alpha is only valid for m >= 128 —
    p in {4,5,6} must use the paper's tabulated constants (alpha_16 =
    0.673 etc.), and p outside [4, 24] is rejected outright."""
    from fractions import Fraction

    import pytest

    from demv_spark.functions.sketches import hll_estimate, hll_registers

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    regs = hll_registers(ev, "user_id", p=4)
    row = hll_estimate(regs, p=4).collect()[0]
    est_ref = int(
        Fraction(673, 1000) * 16 * 16
        / (Fraction(row.denom, 1 << 57))
    )
    assert row.est_raw == est_ref
    for bad_p in (3, 0, 25):
        with pytest.raises(ValueError, match=r"p must be in \[4, 24\]"):
            hll_registers(ev, "user_id", p=bad_p)
        with pytest.raises(ValueError, match=r"p must be in \[4, 24\]"):
            hll_estimate(regs, p=bad_p)


# ---- Bloom semi-join pruning (round 8) ----

def test_bloom_prune_no_false_negatives_and_deterministic(spark):
    """Every truly-matching fact row survives the prune; the pruned
    set equals the bloom_probe verdicts exactly (false positives
    included, deterministically) under any partitioning."""
    import pyspark.sql.functions as F

    from demv_spark.functions.sketches import (
        bloom_build,
        bloom_probe,
        bloom_prune,
    )

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    dim = cust.filter(F.col("c_nationkey") == 5).select(
        F.col("c_custkey").alias("o_custkey"))
    bf = bloom_build(dim, "o_custkey", n_bits=1 << 12, n_hashes=4)

    pruned = bloom_prune(orders, bf, "o_custkey", n_bits=1 << 12, n_hashes=4)
    pruned_keys = {r["o_custkey"] for r in pruned.select("o_custkey").distinct().collect()}
    true_keys = {r["o_custkey"] for r in
                 orders.join(dim, "o_custkey", "left_semi")
                 .select("o_custkey").distinct().collect()}
    assert true_keys <= pruned_keys                    # no false negatives

    verdict_keys = {
        r["o_custkey"]
        for r in bloom_probe(bf, orders.select("o_custkey").distinct(),
                             "o_custkey", n_bits=1 << 12, n_hashes=4)
        .filter("might_contain").collect()
    }
    assert pruned_keys == verdict_keys                 # prune == probe verdicts
    # row counts survive intact (prune filters, never dedups)
    n_again = bloom_prune(
        orders.repartition(17), bf, "o_custkey", n_bits=1 << 12, n_hashes=4
    ).count()
    assert pruned.count() == n_again


def test_bloom_probe_rejects_mismatched_config(spark):
    """A probe with different (n_bits, n_hashes, seed) than the build
    tests the wrong bit positions — the one failure mode a Bloom
    filter must exclude is false negatives, so the stamped config
    metadata turns the silent-garbage case into a loud ValueError."""
    import pytest
    from pyspark.sql import functions as F

    from demv_spark.functions.sketches import (
        bloom_build, bloom_probe, bloom_prune,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    dim = orders.filter(F.col("o_custkey") % 7 == 0).select("o_custkey").distinct()
    bf = bloom_build(dim, "o_custkey", n_bits=1 << 12, n_hashes=4)
    with pytest.raises(ValueError, match="built with"):
        bloom_prune(orders, bf, "o_custkey")          # default 1<<16
    with pytest.raises(ValueError, match="built with"):
        bloom_probe(bf, dim, "o_custkey", n_bits=1 << 12, n_hashes=3)
    # matched config passes and keeps the no-false-negative contract
    got = bloom_prune(orders, bf, "o_custkey", n_bits=1 << 12, n_hashes=4)
    true_matches = orders.join(dim, "o_custkey", "left_semi")
    assert got.count() >= true_matches.count() > 0
    assert true_matches.join(got.select("o_orderkey"), "o_orderkey",
                             "left_anti").count() == 0


def test_bloom_prune_drops_null_keys(spark):
    """NULL-keyed fact rows are pruned by design: the prune feeds an
    equi-join, and NULL never equi-joins — matching the SQL oracle's
    plain-equality semantics (a null-safe keep would diverge)."""
    from demv_spark.functions.sketches import bloom_build, bloom_prune

    dim = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (99, "d")], "k long, v string"
    )
    bf = bloom_build(dim, "k", n_bits=1 << 10, n_hashes=4)
    got = {(r["k"], r["v"]) for r in
           bloom_prune(fact, bf, "k", n_bits=1 << 10, n_hashes=4).collect()}
    assert (1, "a") in got and (2, "b") in got
    assert (None, "c") not in got
