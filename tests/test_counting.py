import pyspark.sql.functions as F

from demv_spark.functions.counting import (
    conditional_counts,
    group_census,
    group_weights,
)

ROWS = [
    # (s1, s2, y)
    (0, 0, 0), (0, 0, 0), (0, 0, 1),
    (0, 1, 0), (0, 1, 1), (0, 1, 1), (0, 1, 1),
    (1, 0, 0), (1, 0, 0), (1, 0, 0), (1, 0, 1),
    (1, 1, 1),
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["s1", "s2", "y"])


def test_group_census(spark):
    out = {tuple(r[:3]): r["n"] for r in group_census(_df(spark), ["s1", "s2", "y"]).collect()}
    assert out[(0, 0, 0)] == 2
    assert out[(0, 1, 1)] == 3
    assert out[(1, 1, 1)] == 1
    assert (1, 1, 0) not in out  # only non-empty groups
    assert sum(out.values()) == len(ROWS)


def test_conditional_counts_fused(spark):
    df = _df(spark)
    row = conditional_counts(
        df,
        {
            "pos": F.col("y") == 1,
            "s1_pos": (F.col("s1") == 1) & (F.col("y") == 1),
            "none": F.col("y") == 99,
        },
    ).collect()[0]
    assert row["n_total"] == 12
    assert row["pos"] == 6
    assert row["s1_pos"] == 2
    assert row["none"] == 0


def test_group_weights_frozen_marginals(spark):
    df = _df(spark)
    rows = {(r["s1"], r["s2"], r["y"]): r for r in group_weights(df, ["s1", "s2"], "y").collect()}
    n = len(ROWS)
    r = rows[(0, 1, 1)]
    # marginals: |s=(0,1)| = 4, |y=1| = 6, group n = 3
    assert r["n"] == 3 and r["n_sens"] == 4 and r["n_label"] == 6 and r["n_total"] == n
    w_exp = (4 / n) * (6 / n)
    w_obs = 3 / n
    assert abs(r["w_exp"] - w_exp) < 1e-12
    assert abs(r["w_obs"] - w_obs) < 1e-12
    assert r["disparity"] == round(w_exp / w_obs, 1)


def test_distinct_sketch_merge_identity(spark):
    import pyspark.sql.functions as F

    from demv_spark.functions.counting import (
        distinct_sketch_rollup,
        merge_distinct_sketches,
    )
    from demv_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    daily = distinct_sketch_rollup(ev, "user_id", F.date_trunc("day", F.col("ts")))
    weekly_merged = merge_distinct_sketches(
        daily, F.date_trunc("week", F.col("bucket"))
    )
    weekly_direct = distinct_sketch_rollup(
        ev, "user_id", F.date_trunc("week", F.col("ts"))
    )
    m = {r["bucket"]: r["estimate"] for r in weekly_merged.collect()}
    d = {r["bucket"]: r["estimate"] for r in weekly_direct.collect()}
    # HLL union is associative: merged state == direct state EXACTLY
    assert m == d
    exact = {
        r["bucket"]: r["n"]
        for r in ev.groupBy(F.date_trunc("week", F.col("ts")).alias("bucket"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(m[k] - n) / n < 0.05


def test_heavy_hitters_matches_bruteforce_with_ties(spark):
    from demv_spark.functions.counting import heavy_hitters

    rows = [(f"k{i % 7}",) for i in range(70)] + [(None,)] * 5
    df = spark.createDataFrame(rows, ["k"])
    got = [(r["k"], r["n"], r["rank"]) for r in
           heavy_hitters(df, ["k"], top_k=3).collect()]
    # all 7 named keys tie at 10 -> ties break by key ascending;
    # NULL group (5 rows) is outside top-3
    assert got == [("k0", 10, 1), ("k1", 10, 2), ("k2", 10, 3)]


def test_heavy_hitters_plan_is_distributed_topk(spark):
    """The top-k must compile to TakeOrderedAndProject, not a global
    sort + single-task window over the whole key census."""
    from demv_spark.functions.counting import heavy_hitters
    from demv_spark.plans.introspect import explain_str

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plan = explain_str(heavy_hitters(df, ["l_suppkey"], 10), "simple")
    assert "TakeOrderedAndProject" in plan


def test_key_skew_profile_exact(spark):
    from demv_spark.functions.counting import key_skew_profile

    rows = [("a",)] * 12 + [("b",)] * 3 + [(None,)] * 5
    df = spark.createDataFrame(rows, ["k"])
    r = key_skew_profile(df, ["k"]).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_n"], r["min_n"]) == (20, 3, 12, 3)


def test_heavy_hitters_null_ties_break_nulls_last(spark):
    """Review r5: Spark's ascending default is NULLS FIRST, SQL's is
    NULLS LAST — the tie-break must pin nulls-last or a NULL group
    tying at the top_k boundary diverges from the oracle."""
    from demv_spark.functions.counting import heavy_hitters

    rows = [(None,)] * 10 + [("a",)] * 10 + [("b",)] * 10
    df = spark.createDataFrame(rows, ["k"])
    got = [(r["k"], r["rank"]) for r in heavy_hitters(df, ["k"], top_k=2).collect()]
    assert got == [("a", 1), ("b", 2)]  # NULL sorts LAST among the tie


def test_key_skew_profile_empty_input_is_zeroes(spark):
    from demv_spark.functions.counting import key_skew_profile

    df = spark.createDataFrame([("a",)], ["k"]).filter(F.lit(False))
    r = key_skew_profile(df, ["k"]).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_n"], r["min_n"]) == (0, 0, 0, 0)


def test_windowed_heavy_hitters_pruning_lossless(spark):
    """The salt-pruned two-phase rank must equal the direct per-bucket
    rank: any global top-k key is top-k within its own salt subset."""
    from demv_spark.functions.counting import windowed_heavy_hitters
    from demv_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    for salt in (1, 4, 64):
        got = sorted(
            (r["bucket_start"], r["event_type"], r["n"], r["rank"])
            for r in windowed_heavy_hitters(
                ev, ["event_type"], "ts", "6 hours", top_k=2,
                prune_salt=salt,
            ).collect()
        )
        if salt == 1:
            base = got
        else:
            assert got == base
    assert len(base) > 0
    assert all(r[3] <= 2 for r in base)


def test_census_cube_and_rollup(spark):
    import pyspark.sql.functions as F

    from demv_spark.functions.counting import census_cube

    df = spark.createDataFrame(
        [("p", None, 1.5), ("p", "q", 2.0), (None, "q", 4.0)],
        "a string, b string, x double",
    )
    cube = {
        (r["a"], r["b"], r["gid"]): (r["n"], r["units"])
        for r in census_cube(df, ["a", "b"], unit_col="x").collect()
    }
    # 2^2 grouping sets; gid disambiguates real NULL vs aggregated
    assert cube[(None, None, 3)] == (3, 7.5)          # grand total
    assert cube[("p", None, 1)] == (2, 3.5)           # a='p' rollup
    assert cube[(None, None, 2)] == (1, 1.5)          # a IS NULL group
    assert cube[("p", None, 0)] == (1, 1.5)           # real (p, NULL) cell
    assert len(cube) == 8
    roll = {
        (r["a"], r["b"], r["gid"])
        for r in census_cube(df, ["a", "b"], sets="rollup").collect()
    }
    # rollup: no b-only set (gid=2 with a aggregated)
    assert all(g != 2 for _, _, g in roll) and (None, None, 3) in roll

    import pytest as _pytest
    with _pytest.raises(ValueError):
        census_cube(df, ["a"], sets="nope")


# ---- salted skew join (round 9, sixth wave) ----

def _skew_fixture(spark):
    import pyspark.sql.functions as F

    rows = [("HOT" if i % 2 == 0 else f"k{i % 5}", i, i * 1.5) for i in range(400)]
    facts = spark.createDataFrame(rows, ["k", "fid", "val"])
    dims = facts.select("k").distinct().withColumn(
        "payload", F.length("k").cast("long")
    )
    return facts, dims


def test_salted_join_equals_plain_join(spark):
    from demv_spark.functions.joins import salted_join

    facts, dims = _skew_fixture(spark)
    plain = sorted(map(tuple, facts.join(dims, "k").collect()))
    for hot in (["HOT"], ["HOT", "k1"], None, []):
        got = sorted(
            map(tuple, salted_join(facts, dims, "k", 8, hot_keys=hot).collect())
        )
        assert got == plain, hot


def test_salted_join_left_preserves_unmatched(spark):
    import pyspark.sql.functions as F

    from demv_spark.functions.joins import salted_join

    facts, dims = _skew_fixture(spark)
    dims_cold_only = dims.filter(F.col("k") != "HOT")
    out = salted_join(facts, dims_cold_only, "k", 4, hot_keys=["HOT"], how="left")
    assert out.count() == facts.count()
    assert (
        out.filter(F.col("payload").isNull()).count()
        == facts.filter(F.col("k") == "HOT").count()
    )


def test_salted_join_replication_is_hot_only(spark):
    """The COST contract, pinned on the replicated dim side itself:
    hot rows appear once per salt, cold rows exactly once (at salt 0)
    — a regression to blanket replication (|dims|·n_salts) fails here
    even though the join RESULT would still be row-identical."""
    import pyspark.sql.functions as F

    from demv_spark.functions.joins import _salted_dims, salted_join

    facts, dims = _skew_fixture(spark)
    n = 8
    rep = _salted_dims(dims, ["k"], n, ["HOT"])
    per_key = {
        r["k"]: (r["n"], r["n_salts"])
        for r in rep.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("__salt").alias("n_salts"))
        .collect()
    }
    assert per_key["HOT"] == (n, n)
    assert all(v == (1, 1) for k, v in per_key.items() if k != "HOT")
    assert rep.count() == n + (dims.count() - 1)
    # and no-pruning mode replicates everything (correct, documented
    # as the expensive fallback)
    assert _salted_dims(dims, ["k"], n, None).count() == dims.count() * n
    # cold-key fact rows always carry salt 0, meeting the single cold
    # replica: plain equality holds at a different salt count too
    got = sorted(map(tuple, salted_join(facts, dims, "k", 3, hot_keys=["HOT"]).collect()))
    assert got == sorted(map(tuple, facts.join(dims, "k").collect()))


def test_salted_join_validation(spark):
    import pytest as _pytest

    from demv_spark.functions.joins import salted_join

    facts, dims = _skew_fixture(spark)
    with _pytest.raises(ValueError, match="inner"):
        salted_join(facts, dims, "k", how="outer")
    with _pytest.raises(ValueError, match="single-column"):
        salted_join(facts, dims, ["k", "fid"], hot_keys=["HOT"])
    with _pytest.raises(ValueError, match="n_salts"):
        salted_join(facts, dims, "k", n_salts=0)
