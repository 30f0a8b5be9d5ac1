import pytest
import pyspark.sql.functions as F

from demv_spark.operators.linkage import blocked_fuzzy_join, first_token_block


@pytest.fixture(scope="module")
def catalogs(spark):
    left = spark.createDataFrame(
        [(1, "golden lace ribbon"), (2, "silver spring coil"),
         (3, "golden lace ribbons"), (4, None)],
        "lid long, lname string",
    )
    right = spark.createDataFrame(
        [(10, "golden lace ribbo"),      # dist 2 from lid=1, 3 from lid=3... (see test)
         (11, "silver spring coil"),     # exact dup of lid=2
         (12, "crimson velvet rope"),    # no block match
         (13, None)],
        "rid long, rname string",
    )
    return left, right


def test_blocked_fuzzy_join_matches_within_block(catalogs):
    left, right = catalogs
    out = blocked_fuzzy_join(left, right, "lname", "rname", max_dist=2)
    pairs = {(r["lid"], r["rid"]): r["edit_dist"] for r in out.collect()}
    # lid=1 "golden lace ribbon" vs rid=10 "golden lace ribbo": 1 deletion
    assert pairs[(1, 10)] == 1
    # lid=3 "...ribbons" vs rid=10 "...ribbo": 2 deletions
    assert pairs[(3, 10)] == 2
    assert pairs[(2, 11)] == 0
    # NULLs never match; rid=12 has no block partner
    assert all(l is not None and r is not None for l, r in pairs)
    assert set(pairs) == {(1, 10), (3, 10), (2, 11)}


def test_blocked_fuzzy_join_recall_bounded_by_block(spark):
    # same string, different first token -> unreachable by design
    left = spark.createDataFrame([(1, "alpha beta")], "lid long, lname string")
    right = spark.createDataFrame([(2, "alphaX beta")], "rid long, rname string")
    assert blocked_fuzzy_join(left, right, "lname", "rname", 5).count() == 0
    # char-prefix block recovers it
    pref = lambda c: F.substring(F.lower(F.trim(c)), 1, 4)
    out = blocked_fuzzy_join(left, right, "lname", "rname", 5, block_fn=pref)
    assert out.count() == 1


def test_blocked_fuzzy_join_validates(catalogs):
    left, right = catalogs
    with pytest.raises(ValueError, match="disjoint"):
        blocked_fuzzy_join(left, left, "lname", "lname", 1)
    with pytest.raises(ValueError, match="max_dist"):
        blocked_fuzzy_join(left, right, "lname", "rname", -1)


def test_blocked_fuzzy_join_no_allpairs_plan(catalogs):
    # the physical plan must join on the block key — never a cross/
    # broadcast-nested-loop over all pairs
    left, right = catalogs
    from demv_spark.plans.introspect import explain_str

    out = blocked_fuzzy_join(left, right, "lname", "rname", 2)
    plan = explain_str(out, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
