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


def _py_pagerank_int(edges, iterations, scale=1_000_000, redistribute=False):
    """Pure-python mirror of the integer recurrence (test oracle)."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    base = scale * 15 // 100
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        incoming = {n: 0 for n in nodes}
        for s, d in e:
            incoming[d] += r[s] // out[s]
        share = (
            sum(r[n] for n in nodes if n not in out) // len(nodes)
            if redistribute else 0
        )
        r = {n: base + (85 * (incoming[n] + share)) // 100 for n in nodes}
    return r


def test_redistribute_dangling_matches_python_reference(spark):
    """VERDICT r6 item 5: the textbook variant splits each
    iteration's dangling mass uniformly. Exact integer parity with a
    pure-python mirror of the recurrence; ranks/scale within the
    integer grid of float textbook PageRank."""
    edges = [("a", "b"), ("b", "c"), ("d", "c"), ("c", "a"), ("e", "c")]
    # c->a makes a cycle; e and d dangle after their single out-edge?
    # no: d and e HAVE out-edges; add a true dangling sink
    edges += [("a", "sink")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank_int"] for r in
           pagerank_integer(df, iterations=4, redistribute_dangling=True).collect()}
    want = _py_pagerank_int(edges, 4, redistribute=True)
    assert got == want

    # float textbook power iteration (same 4 steps, uniform start)
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {}
    for s, _ in edges:
        out.setdefault(s, []).append(_)
    fr = {n: 1.0 for n in nodes}
    for _ in range(4):
        inc = {n: 0.0 for n in nodes}
        for s, d in set(edges):
            inc[d] += fr[s] / len(out[s])
        share = sum(fr[n] for n in nodes if n not in out) / len(nodes)
        fr = {n: 0.15 + 0.85 * (inc[n] + share) for n in nodes}
    for n in nodes:
        assert abs(got[n] / 1e6 - fr[n]) < 1e-3, (n, got[n] / 1e6, fr[n])


def test_redistribute_conserves_total_mass(spark):
    """With redistribution, Σ rank stays ≈ N·scale (lost only to
    integer-division remainders, bounded per iteration)."""
    edges = [("a", "b"), ("b", "sink"), ("c", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    n = 4  # a b c sink
    for it in (1, 3, 5):
        tot = sum(
            r["rank_int"]
            for r in pagerank_integer(
                df, iterations=it, redistribute_dangling=True
            ).collect()
        )
        # per iteration each of N nodes can lose <1 unit to the div
        # 100, plus N to the share div and one per contrib div
        assert n * 1_000_000 - tot < it * (3 * n + len(edges)) * 100
        assert tot <= n * 1_000_000


def test_redistribute_default_off_unchanged(spark):
    df = spark.createDataFrame([("a", "c"), ("b", "c")], ["src", "dst"])
    a = sorted(map(tuple, pagerank_integer(df, iterations=3).collect()))
    b = sorted(map(tuple, pagerank_integer(
        df, iterations=3, redistribute_dangling=False).collect()))
    assert a == b


def test_redistribute_no_python_udf(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    s = plan_stats(pagerank_integer(df, iterations=2, redistribute_dangling=True))
    assert not s["has_python_udf"]


def _py_hits_int(edges, iterations, scale=1_000_000):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}

    def norm(d):
        mx = max(d.values())
        if mx <= 0:
            return d
        return {n: v * scale // mx for n, v in d.items()}

    for _ in range(iterations):
        auth = norm({n: sum(hub[s] for s, d in e if d == n) for n in nodes})
        hub = norm({n: sum(auth[d] for s, d in e if s == n) for n in nodes})
    return auth, hub


def test_hits_matches_python_reference(spark):
    edges = [("h1", "a1"), ("h1", "a2"), ("h1", "a3"),
             ("h2", "a1"), ("h2", "a2"), ("x", "a3"), ("a1", "x")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    from demv_spark.operators.graph import hits_integer

    got = {r["node"]: (r["auth_int"], r["hub_int"])
           for r in hits_integer(df, iterations=4).collect()}
    auth, hub = _py_hits_int(edges, 4)
    assert got == {n: (auth[n], hub[n]) for n in auth}
    # structure: h1 is the best hub, a1/a2 the best authorities
    assert got["h1"][1] == 1_000_000
    assert max(got[n][0] for n in ("a1", "a2")) == 1_000_000
    assert got["h1"][1] > got["x"][1]


def test_hits_duplicate_edges_once_and_deterministic(spark):
    from demv_spark.operators.graph import hits_integer

    single = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    dup = spark.createDataFrame([("a", "b")] * 3 + [("b", "c")], ["src", "dst"])
    a = sorted(map(tuple, hits_integer(single, iterations=3).collect()))
    b = sorted(map(tuple, hits_integer(dup, iterations=3).collect()))
    c = sorted(map(tuple, hits_integer(
        single.repartition(5), iterations=3).collect()))
    assert a == b == c


def test_hits_huge_scale_product_no_overflow(spark):
    """Review r7: the max-normalization product (x·scale) must run in
    DECIMAL — with scale = 2^31 even degree-2 sums overflow a plain
    int64 product. Parity with the arbitrary-precision mirror."""
    from demv_spark.operators.graph import hits_integer

    edges = [("h", "a1"), ("h", "a2"), ("g", "a1"), ("a1", "h")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    big = 1 << 31
    got = {r["node"]: (r["auth_int"], r["hub_int"])
           for r in hits_integer(df, iterations=3, scale=big).collect()}
    auth, hub = _py_hits_int(edges, 3, scale=big)
    assert got == {n: (auth[n], hub[n]) for n in auth}


def test_pagerank_redistribute_empty_graph_returns_empty(spark):
    from demv_spark.operators.graph import pagerank_integer

    empty = spark.createDataFrame([], "src string, dst string")
    out = pagerank_integer(empty, iterations=3, redistribute_dangling=True)
    assert out.count() == 0


# ---- triangle census (round 9, sixth wave) ----

def _brute_triangles(edge_list):
    from itertools import combinations

    E = {tuple(sorted((str(a), str(b)))) for a, b in edge_list if str(a) != str(b)}
    adj = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for n, nbrs in adj.items():
        t = sum(
            1
            for v, w in combinations(sorted(nbrs), 2)
            if tuple(sorted((v, w))) in E
        )
        out[n] = (len(nbrs), t, len(nbrs) * (len(nbrs) - 1))
    return out


def test_triangles_match_brute_force_random_graph(spark):
    import random

    from demv_spark.operators.graph import triangle_census

    rng = random.Random(41)
    edges = [
        (rng.randrange(18), rng.randrange(18)) for _ in range(90)
    ]
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], ["src", "dst"]
    )
    got = {
        r["node"]: (r["degree"], r["triangles"], r["wedges"])
        for r in triangle_census(df).collect()
    }
    assert got == _brute_triangles(edges)


def test_triangles_star_is_triangle_free_and_k4_is_complete(spark):
    from demv_spark.operators.graph import triangle_census

    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(6)], ["src", "dst"]
    )
    got = {r["node"]: r["triangles"] for r in triangle_census(star).collect()}
    assert set(got.values()) == {0}

    from itertools import combinations

    k4 = spark.createDataFrame(
        [(a, b) for a, b in combinations("abcd", 2)], ["src", "dst"]
    )
    rows = {
        r["node"]: (r["degree"], r["triangles"], r["wedges"])
        for r in triangle_census(k4).collect()
    }
    # every node of K4 sits on C(3,2)=3 triangles, degree 3, wedges 6
    assert rows == {n: (3, 3, 6) for n in "abcd"}


def test_triangles_self_loops_dups_and_reversals_collapse(spark):
    from demv_spark.operators.graph import triangle_census

    clean = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"]
    )
    noisy = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
         ("a", "c"), ("a", "c"), ("a", "a")],
        ["src", "dst"],
    )
    a = sorted(map(tuple, triangle_census(clean).collect()))
    b = sorted(map(tuple, triangle_census(noisy).collect()))
    assert a == b and a[0][2] == 1


def test_triangles_empty_graph_returns_empty(spark):
    from demv_spark.operators.graph import triangle_census

    df = spark.createDataFrame([], "src string, dst string")
    assert triangle_census(df).count() == 0


def test_triangles_orientation_bounds_hub_fanout(spark):
    """The degree-orientation scale property: a hot hub contributes
    NO wedges from its own side — every hub edge orients INTO the
    hub (leaves have smaller degree), so the hub's oriented
    out-degree is 0 and wedge volume stays O(m^1.5) on skewed
    graphs. Verified through the public result: the star's hub has
    huge `wedges` (census denominator) but the enumeration cost is
    zero wedge pairs — triangle counts all 0 and the plan contains
    no cartesian product."""
    from demv_spark.operators.graph import triangle_census

    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(50)], ["src", "dst"]
    )
    out = triangle_census(star)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    rows = {r["node"]: r for r in out.collect()}
    assert rows["hub"]["wedges"] == 50 * 49
    assert all(r["triangles"] == 0 for r in rows.values())


def test_kcore_peels_to_the_unique_fixpoint(spark):
    import pyspark.sql.functions as F

    from demv_spark.operators.graph import kcore

    # K5 + a pendant path + a triangle hanging off the K5: the 4-core
    # is exactly the K5 (triangle nodes have degree 2, path degree <=2)
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    extras = [(4, 10), (10, 11), (11, 12), (0, 20), (20, 21), (21, 0)]
    edges = spark.createDataFrame(k5 + extras, "src int, dst int")
    out = sorted(map(tuple, kcore(edges, 4).collect()))
    assert out == [(str(i), 4) for i in range(5)]
    # k=2 keeps the K5 AND the triangle, peels the pendant path
    out2 = {r[0] for r in kcore(edges, 2).collect()}
    assert out2 == {str(i) for i in (0, 1, 2, 3, 4, 20, 21)}
    # cascade: removing the path tail (degree 1) drops 11 to degree 1,
    # then 10 — multi-round peel, same fixpoint regardless of order
    assert "10" not in out2 and "12" not in out2


def test_kcore_duplicate_and_reversed_edges_collapse(spark):
    from demv_spark.operators.graph import kcore

    tri = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (1, 2)]
    out = sorted(map(tuple, kcore(spark.createDataFrame(tri, "src int, dst int"), 2).collect()))
    assert out == [("1", 2), ("2", 2), ("3", 2)]


def test_kcore_empty_core_and_bad_k(spark):
    import pytest

    from demv_spark.operators.graph import kcore

    path = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    assert kcore(path, 3).collect() == []
    with pytest.raises(ValueError, match="k must be"):
        kcore(path, 0)


def test_kcore_releases_session_caches(spark):
    from demv_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(6) if a < b],
        "src int, dst int",
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    kcore(edges, 3).collect()
    # per-round localCheckpoints are ContextCleaner-released on GC
    # (the duplicate_clusters/pagerank intermediate contract — only
    # persist()-without-unpersist pins for the session); a single call
    # may leave at most its own handful of round checkpoints pending
    n = spark.sparkContext._jsc.getPersistentRDDs().size() - before
    assert n <= 4, f"{n} new RDD blocks after one kcore call"


def test_kcore_raises_on_max_iter_exhaustion(spark):
    import pytest

    from demv_spark.operators.graph import kcore

    # a 6-node path at k=2 peels only its two endpoints per round:
    # needs 3 rounds to empty — max_iter=2 must RAISE, not silently
    # return the partially-peeled set (round-10 ADVICE finding)
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src int, dst int"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(path, 2, max_iter=2)
    # enough rounds: converges to the empty core, no raise
    assert kcore(path, 2, max_iter=10).collect() == []
