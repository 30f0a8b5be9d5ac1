import pyspark.sql.functions as F
import pytest

from demv_spark.operators import etl


def test_binarize(spark):
    df = spark.createDataFrame([(1.0,), (33.0,), (50.0,)], ["x"])
    got = [r["x"] for r in etl.binarize(df, "x", 33).collect()]
    assert got == [0, 1, 1]


def test_recode_map_passthrough(spark):
    df = spark.createDataFrame([("a",), ("b",), ("z",)], ["c"])
    got = [r["c"] for r in etl.recode_map(df, "c", {"a": "A", "b": "B"}).collect()]
    assert got == ["A", "B", "z"]


def test_recode_when(spark):
    df = spark.createDataFrame([(1,), (5,), (9,)], ["v"])
    got = [r["v"] for r in etl.recode_when(df, "v", F.col("v") > 4, 0).collect()]
    assert got == [1, 0, 0]


def test_bucketize_pd_cut_semantics(spark):
    df = spark.createDataFrame([(0.5,), (1.0,), (1.5,), (99.0,)], ["x"])
    out = etl.bucketize(df, "x", splits=[0, 1, 2], labels=["lo", "hi"]).collect()
    got = [r["x_bin"] for r in out]
    assert got == ["lo", "lo", "hi", None]  # (0,1], (1,2], out-of-range → NULL


def test_quantile_bucketize_ntile(spark):
    df = spark.createDataFrame([(float(i), i) for i in range(10)], ["x", "id"])
    out = etl.quantile_bucketize(df, "x", 5, tiebreak=["id"]).orderBy("x").collect()
    assert [r["x_q"] for r in out] == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]


def test_quantile_label(spark):
    df = spark.createDataFrame([(float(i), i) for i in range(9)], ["x", "id"])
    out = etl.quantile_label(df, "x", 3, out="y", tiebreak=["id"]).orderBy("x").collect()
    assert [r["y"] for r in out] == [0, 0, 0, 1, 1, 1, 2, 2, 2]


def test_one_hot(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["cat"])
    out = etl.one_hot(df, "cat", values=["a", "b"]).collect()
    assert [(r["cat_a"], r["cat_b"]) for r in out] == [(1, 0), (0, 1), (0, 0)]
    assert "cat" not in etl.one_hot(df, "cat", values=["a"]).columns


def test_label_encode_alphabetical(spark):
    # sklearn LabelEncoder parity: lexicographic order, not frequency
    df = spark.createDataFrame([("b",), ("b",), ("a",), ("c",)], ["s"])
    got = {r["s"]: r["s_enc"] for r in etl.label_encode(df, "s").collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_zscore_sample_std(spark):
    import statistics
    vals = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    out = sorted(r["x"] for r in etl.zscore(df, ["x"]).collect())
    mu, sd = statistics.mean(vals), statistics.stdev(vals)  # ddof=1
    exp = sorted((v - mu) / sd for v in vals)
    assert out == pytest.approx(exp, abs=1e-9)


def test_union_provenance(spark):
    a = spark.createDataFrame([(1.0,)], ["q"])
    b = spark.createDataFrame([(2.0,), (3.0,)], ["q"])
    out = etl.union_provenance(a, b, "type", 0, 1).collect()
    assert sorted((r["q"], r["type"]) for r in out) == [(1.0, 0), (2.0, 1), (3.0, 1)]


def test_drop_string_cols(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], ["a", "b", "c"])
    assert etl.drop_string_cols(df).columns == ["a", "c"]


def test_drop_all_null_cols(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a int, b string")
    assert etl.drop_all_null_cols(df).columns == ["a"]


def test_random_relabel_count(spark):
    df = spark.createDataFrame([(i, 0) for i in range(100)], ["id", "y"])
    out = etl.random_relabel(df, F.col("id") < 50, "y", 1, n=10, seed=1)
    flipped = out.filter(F.col("y") == 1)
    assert flipped.count() == 10
    assert flipped.filter(F.col("id") >= 50).count() == 0  # only matching rows flip


def test_stratified_sample_exact_sizes(spark):
    from demv_spark.operators.etl import stratified_sample

    rows = [(i, "a" if i % 3 == 0 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = stratified_sample(df, ["grp"], 0.25, ["id"], seed=7)
    got = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    # strata sizes: a=34, b=66 -> ceil(0.25*n) = 9, 17
    assert got == {"a": 9, "b": 17}
    # deterministic: same seed -> identical selection
    again = stratified_sample(df, ["grp"], 0.25, ["id"], seed=7)
    assert sorted(r["id"] for r in out.collect()) == sorted(r["id"] for r in again.collect())


def test_json_extract(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "a"}'), (2, '{"tag": "b"}'), (3, None)],
        ["id", "props"],
    )
    got = {r["id"]: r["k"] for r in etl.json_extract(df, "props", "$.k", out="k", cast="int").collect()}
    assert got == {1: 7, 2: None, 3: None}


def test_stratified_sample_full_fraction(spark):
    from demv_spark.operators.etl import stratified_sample

    df = spark.createDataFrame([(i, i % 3) for i in range(30)], ["id", "g"])
    out = stratified_sample(df, ["g"], 1.0, ["id"])
    assert out.count() == 30


def test_profile_columns(spark):
    from demv_spark.operators.etl import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], ["x", "s"]
    )
    got = {(r["column"], r["metric"]): r["value"]
           for r in profile_columns(df, ["x", "s"]).collect()}
    assert got[("x", "n")] == "3"
    assert got[("x", "n_null")] == "0"
    assert got[("x", "n_distinct")] == "2"
    assert got[("x", "min")] == "1" and got[("x", "max")] == "2"
    assert got[("s", "n_null")] == "1"
    assert got[("s", "n_distinct")] == "2"


def test_zorder_key_interleaves(spark):
    from demv_spark.operators.etl import zorder_key

    df = spark.createDataFrame([(0b101, 0b011)], ["x", "y"])
    z = zorder_key(df, ["x", "y"], bits=3).collect()[0]["zorder"]
    # interleave x into even positions, y into odd: x=101, y=011
    # bits (LSB→MSB): x0=1,y0=1,x1=0,y1=1,x2=1,y2=0 -> 0b011011 = 27
    assert z == 0b011011


def test_zorder_locality(spark):
    from demv_spark.operators.etl import zorder_key

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = {(r["x"], r["y"]): r["zorder"] for r in zorder_key(df, ["x", "y"], bits=3).collect()}
    # all keys distinct (bijective on the grid)
    assert len(set(out.values())) == 64
    # neighbors in both dims map closer than distant points on average
    near = abs(out[(0, 0)] - out[(1, 1)])
    far = abs(out[(0, 0)] - out[(7, 7)])
    assert near < far


def test_quantile_bucketize_bucketed_matches_ntile(spark):
    from demv_spark.operators import etl

    # duplicates + a skewed distribution: the decomposed plan must
    # reproduce plain NTILE bit-for-bit (incl. Spark's first-buckets-
    # get-the-extra-row sizing)
    rows = [(i, float((i * 13) % 40)) for i in range(1009)]
    df = spark.createDataFrame(rows, ["id", "v"])
    plain = etl.quantile_bucketize(df, "v", 7, out="q", tiebreak=["id"])
    fast = etl.quantile_bucketize_bucketed(
        df, "v", 7, out="q", tiebreak=["id"], range_buckets=5
    )
    a = {r["id"]: r["q"] for r in plain.collect()}
    b = {r["id"]: r["q"] for r in fast.collect()}
    assert a == b
    sizes = sorted(
        r["n"]
        for r in fast.groupBy("q").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert sizes == [144] * 6 + [145] and len(a) == 1009


def test_quantile_bucketize_bucketed_remainder_semantics(spark):
    from demv_spark.operators import etl

    # N mod n >= 2 is where SQL NTILE (first rem buckets get the extra
    # row) diverges from the even-spread formula (r-1)*n div N + 1 —
    # the ADVICE round-3 bug class. Cover rem=2 (N=10,n=4), rem=5
    # (N=1013,n=7), and N < n (every row its own bucket).
    for n_rows, n_buckets in [(10, 4), (1013, 7), (3, 5)]:
        rows = [(i, float((i * 17) % 50)) for i in range(n_rows)]
        df = spark.createDataFrame(rows, ["id", "v"])
        plain = etl.quantile_bucketize(df, "v", n_buckets, out="q", tiebreak=["id"])
        fast = etl.quantile_bucketize_bucketed(
            df, "v", n_buckets, out="q", tiebreak=["id"], range_buckets=4
        )
        a = {r["id"]: r["q"] for r in plain.collect()}
        b = {r["id"]: r["q"] for r in fast.collect()}
        assert a == b, f"N={n_rows} n={n_buckets}"


def test_quantile_label_bucketed_matches_plain(spark):
    from demv_spark.operators import etl

    rows = [(i, float((i * 31) % 200)) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "v"])
    a = {r["id"]: r["y"] for r in
         etl.quantile_label(df, "v", 5, tiebreak=["id"]).collect()}
    b = {r["id"]: r["y"] for r in
         etl.quantile_label(df, "v", 5, tiebreak=["id"], bucketed=True).collect()}
    assert a == b and set(a.values()) == {0, 1, 2, 3, 4}


def test_grouped_quantiles_matches_numpy(spark):
    import numpy as np
    from demv_spark.operators.etl import grouped_quantiles

    rows = [(("a" if i % 3 else "b"), float(i * 7 % 23)) for i in range(60)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r["k"]: r for r in grouped_quantiles(df, ["k"], "v", probs=(0.25, 0.5, 0.9)).collect()}
    import collections
    vals = collections.defaultdict(list)
    for k, v in rows:
        vals[k].append(v)
    for k, xs in vals.items():
        assert out[k]["p25"] == pytest.approx(np.percentile(xs, 25), abs=1e-12)
        assert out[k]["p50"] == pytest.approx(np.percentile(xs, 50), abs=1e-12)
        assert out[k]["p90"] == pytest.approx(np.percentile(xs, 90), abs=1e-12)


def test_target_encode_matches_exact_fraction(spark):
    """Smoothed and leave-one-out target encodings equal an exact
    Fraction reimplementation — incl. NULL category (its own group,
    null-safe join back) and NULL y (excluded from sums, still
    encoded, contributes no LOO exclusion)."""
    from collections import defaultdict
    from fractions import Fraction

    from demv_spark.operators.etl import target_encode

    rows = [("a", 1), ("a", 0), ("a", 1), ("b", 0), ("b", None),
            ("c", 1), (None, 0), (None, 1)]
    df = spark.createDataFrame(rows, "cat string, y int")
    S = sum(y for _, y in rows if y is not None)
    N = sum(1 for _, y in rows if y is not None)
    s, n = defaultdict(int), defaultdict(int)
    for c, y in rows:
        if y is not None:
            s[c] += y
            n[c] += 1
    for loo in (False, True):
        got = {
            (r["cat"], r["y"]): r["cat_te_fx"]
            for r in target_encode(
                df, "cat", "y", m=3, leave_one_out=loo
            ).collect()
        }
        want = {}
        for c, y in rows:
            if loo:
                sy, ny = s[c] - (y or 0), n[c] - (1 if y is not None else 0)
            else:
                sy, ny = s[c], n[c]
            want[(c, y)] = int(
                Fraction(1_000_000) * (Fraction(sy) * N + 3 * S)
                / (N * (ny + 3))
            )
        assert got == want, loo


def test_target_encode_fused_loo_equals_chained(spark):
    """The one-pass two-variant form (loo_out=) is value-identical to
    chaining a plain call and a leave_one_out call — the round-12
    plan optimization must not move a single integer."""
    from demv_spark.operators.etl import target_encode

    rows = [("a", 1), ("a", 0), ("a", 1), ("b", 0), ("b", None),
            ("c", 1), (None, 0), (None, 1)]
    df = spark.createDataFrame(rows, "cat string, y int")
    fused = target_encode(
        df, "cat", "y", m=3, out="te", loo_out="te_loo"
    ).select("cat", "y", "te", "te_loo")
    chained = target_encode(df, "cat", "y", m=3, out="te")
    chained = target_encode(
        chained, "cat", "y", m=3, leave_one_out=True, out="te_loo"
    ).select("cat", "y", "te", "te_loo")
    key = lambda r: (r["cat"] or "", r["y"] if r["y"] is not None else -1)  # noqa: E731
    assert [tuple(r) for r in sorted(fused.collect(), key=key)] == [
        tuple(r) for r in sorted(chained.collect(), key=key)
    ]


def test_target_encode_guards(spark):
    import pytest as _pytest

    from demv_spark.operators.etl import target_encode

    df = spark.createDataFrame([("a", 1)], "cat string, y int")
    with _pytest.raises(ValueError):
        target_encode(df, "cat", "y", m=0)
    # n=1 with LOO: denominator stays positive via m
    out = target_encode(df, "cat", "y", m=1, leave_one_out=True).collect()
    assert out[0]["cat_te_fx"] == 1_000_000  # (0 + 1*1/1) / (0+1) = 1.0


def test_grouped_mad_and_winsorize(spark):
    from demv_spark.operators.etl import grouped_mad, winsorized_clip

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
         ("b", 5.0), ("b", 5.0)],
        "g string, x double",
    )
    mad = {r["g"]: (r["med"], r["mad"]) for r in grouped_mad(df, ["g"], "x").collect()}
    # a: med=2.5 (interp), |x-2.5| = [1.5, .5, .5, 97.5] → mad=1.0
    assert mad["a"] == (2.5, 1.0)
    assert mad["b"] == (5.0, 0.0)  # constant group: robust zero spread

    w = winsorized_clip(df, ["g"], "x", lo=0.25, hi=0.75)
    rows = {(r["g"], r["x"]): (r["x_w"], r["x_w_clipped"]) for r in w.collect()}
    # a: p25=1.75, p75=27.25 → 1.0 clips up, 100.0 clips down
    assert rows[("a", 1.0)] == (1.75, -1)
    assert rows[("a", 100.0)] == (27.25, 1)
    assert rows[("a", 2.0)] == (2.0, 0)
    assert rows[("b", 5.0)] == (5.0, 0)


def test_mad_winsorize_target_encode_null_keys_and_all_null_targets(spark):
    """NULL group keys are real groups (null-safe join backs), and a
    category whose targets are ALL NULL encodes to the global prior
    rather than NULL."""
    from fractions import Fraction

    from demv_spark.operators.etl import (
        grouped_mad,
        target_encode,
        winsorized_clip,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0)],
        "g string, x double",
    )
    mad = {r["g"]: (r["med"], r["mad"]) for r in grouped_mad(df, ["g"], "x").collect()}
    assert mad[None] == (15.0, 5.0)      # NULL group reported
    assert mad["a"] == (2.0, 1.0)
    w = winsorized_clip(df, ["g"], "x", lo=0.0, hi=1.0)
    assert w.count() == 4                # row-preserving incl. NULL key

    te = spark.createDataFrame(
        [("a", 1), ("a", 0), ("c", None), ("c", None)],
        "cat string, y int",
    )
    got = {
        r["cat"]: r["cat_te_fx"]
        for r in target_encode(te, "cat", "y", m=3).collect()
    }
    # c: s=0, n=0 → prior = S/N = 1/2 → floor(1e6 * (0*2+3*1)/(2*3))
    assert got["c"] == int(Fraction(1_000_000) * 3 / 6)
    # a: s=1, n=2, S=1, N=2 → (1·2 + 3·1)/(2·(2+3)) = 1/2
    assert got["a"] == int(Fraction(1_000_000) * (1 * 2 + 3 * 1) / (2 * 5))


def test_grouped_corr_components_match_numpy(spark):
    import numpy as np

    from demv_spark.operators.etl import grouped_corr

    rows = [("a", float(i), float(2 * i + (i % 3))) for i in range(50)]
    rows += [("b", float(i), float(-i)) for i in range(30)]
    rows += [("a", None, 1.0), ("b", 2.0, None)]     # pairwise-dropped
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in grouped_corr(df, ["g"], "x", "y").collect()}
    # hand reconstruction
    import math
    for g in ("a", "b"):
        pts = [(x, y) for gg, x, y in rows if gg == g and x is not None and y is not None]
        n = len(pts)
        sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts); syy = sum(p[1] * p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        r = got[g]
        assert r["n"] == n
        assert r["sum_x"] == pytest.approx(sx, rel=1e-12)
        assert r["sum_xy"] == pytest.approx(sxy, rel=1e-12)
        # assembled correlation matches numpy corrcoef
        num = n * r["sum_xy"] - r["sum_x"] * r["sum_y"]
        den = math.sqrt((n * r["sum_xx"] - r["sum_x"] ** 2)
                        * (n * r["sum_yy"] - r["sum_y"] ** 2))
        want = np.corrcoef([p[0] for p in pts], [p[1] for p in pts])[0, 1]
        assert num / den == pytest.approx(want, abs=1e-9)
    # b is perfectly anti-correlated
    rb = got["b"]
    numb = rb["n"] * rb["sum_xy"] - rb["sum_x"] * rb["sum_y"]
    assert numb < 0


def test_grouped_corr_deterministic_under_repartition(spark):
    from demv_spark.operators.etl import grouped_corr

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"),
        (F.rand(7) * 100).alias("x"),
        (F.rand(8) * 100).alias("y"),
    ).cache()
    a = sorted(map(tuple, grouped_corr(df, ["g"], "x", "y").collect()))
    b = sorted(map(tuple, grouped_corr(df.repartition(13), ["g"], "x", "y").collect()))
    assert a == b       # bit-identical doubles, not approx


def test_robust_outliers_hand_computed(spark):
    from demv_spark.operators.etl import robust_outliers

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 100]] + \
           [("b", 7.0), ("b", 7.0), ("b", 7.0), ("b", 9.0)] + \
           [("a", None)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {(r["g"], r["x"]): r["is_outlier"] for r in
           robust_outliers(df, ["g"], "x", threshold=3.0).collect()}
    # group a: med 3.5, |x-med| = [2.5,1.5,.5,.5,1.5,96.5], mad 1.5
    # -> only 100 exceeds 4.5
    assert got[("a", 100.0)] is True
    assert all(not got[("a", float(v))] for v in [1, 2, 3, 4, 5])
    assert got[("a", None)] is False              # NULL never flags
    # group b: med 7, mad 0 -> any deviation flags
    assert got[("b", 9.0)] is True and got[("b", 7.0)] is False


def test_robust_outliers_deterministic(spark):
    from demv_spark.operators.etl import robust_outliers

    df = spark.range(500).select(
        (F.col("id") % 5).alias("g"),
        (F.rand(3) * 100).alias("x"),
    ).cache()
    a = sorted(map(tuple, robust_outliers(df, ["g"], "x").collect()))
    b = sorted(map(tuple, robust_outliers(df.repartition(9), ["g"], "x").collect()))
    assert a == b
