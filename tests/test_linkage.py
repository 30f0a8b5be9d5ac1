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


def test_best_match_resolves_one_winner_per_right_key(spark):
    from demv_spark.operators.linkage import best_match

    pairs = spark.createDataFrame(
        [(1, "a", 10, "x", 2), (2, "b", 10, "x", 1), (3, "c", 10, "x", 1),
         (7, "g", 20, "y", 0)],
        "pk_a long, name_a string, pk_b long, name_b string, edit_dist int",
    )
    out = {r["pk_b"]: r for r in best_match(pairs).collect()}
    assert len(out) == 2
    # pk_b=10: dist-1 candidates are pk_a 2 and 3 -> smaller key wins
    assert out[10]["pk_a"] == 2 and out[10]["edit_dist"] == 1
    assert out[10]["name_a"] == "b" and out[10]["name_b"] == "x"
    assert out[20]["pk_a"] == 7 and out[20]["edit_dist"] == 0


def test_best_match_deterministic_under_partitioning(spark):
    from demv_spark.operators.linkage import best_match
    import random

    rng = random.Random(7)
    # unique (pk_a, pk_b) with payloads a pure function of the pair —
    # the blocked_fuzzy_join output shape (see best_match contract)
    seen = set()
    rows = []
    for _ in range(500):
        pk_a, pk_b = rng.randint(0, 50), rng.randint(0, 30)
        if (pk_a, pk_b) in seen:
            continue
        seen.add((pk_a, pk_b))
        rows.append((pk_a, f"l{pk_a}", pk_b, "r", (pk_a * 7 + pk_b) % 5))
    pairs = spark.createDataFrame(
        rows, "pk_a long, name_a string, pk_b long, name_b string, edit_dist int")
    a = sorted(map(tuple, best_match(pairs).collect()))
    b = sorted(map(tuple, best_match(pairs.repartition(17)).collect()))
    assert a == b
    # brute force
    want = {}
    for pk_a, name_a, pk_b, name_b, d in rows:
        cur = want.get(pk_b)
        if cur is None or (d, pk_a) < (cur[4], cur[0]):
            want[pk_b] = (pk_a, name_a, pk_b, name_b, d)
    got = {
        r["pk_b"]: (r["pk_a"], r["name_a"], r["pk_b"], r["name_b"], r["edit_dist"])
        for r in best_match(pairs).collect()
    }
    assert got == want


def test_best_match_validates_columns(spark):
    from demv_spark.operators.linkage import best_match

    pairs = spark.createDataFrame([(1, 2, 0)], "pk_a long, pk_b long, edit_dist int")
    with pytest.raises(ValueError, match="name_x"):
        best_match(pairs, dist_col="name_x")


def test_blocked_fuzzy_join_rejects_internal_name_collisions(spark):
    from demv_spark.operators.linkage import blocked_fuzzy_join

    left = spark.createDataFrame(
        [(1, "a b", 0)], "lid long, lname string, edit_dist int"
    )
    right = spark.createDataFrame([(2, "a c")], "rid long, rname string")
    with pytest.raises(ValueError, match="edit_dist"):
        blocked_fuzzy_join(left, right, "lname", "rname", 2)
    blk = spark.createDataFrame([(2, "a c", "x")],
                                "rid long, rname string, __blk string")
    with pytest.raises(ValueError, match="__blk"):
        blocked_fuzzy_join(left.drop("edit_dist"), blk, "lname", "rname", 2)


# ---- Soundex blocking (round 9, sixth wave) ----

def test_soundex_matches_spark_builtin(spark):
    """Parity with Spark's F.soundex on the canonical NARA examples
    (incl. the hard rules: Pfister's first-letter merge, Tymczak's
    vowel-separated double-coding, H/W transparency in Ashcraft) and
    a real word corpus — our RE2-safe chain exists so the ORACLE can
    recompute the code, but it must be the same Soundex."""
    import pyspark.sql.functions as F

    from demv_spark.operators.linkage import soundex_code

    names = [
        "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
        "Pfister", "Honeyman", "Bob", "White", "PHP", "Jackson",
        "Washington", "Lee", "Gutierrez", "AAAA", "Euler", "Gauss",
        "Hilbert", "Knuth", "Lloyd", "Lukasiewicz", "Wachs",
        "O'Brien", "", "W", "H", "A",
        # the punctuation/digit semantics the round-9 review caught:
        # non-letters BREAK runs (unlike NARA-strip implementations),
        # H/W stay transparent, a non-letter first char returns the
        # input unchanged
        "B-B", "B--B", "B7B", "B1B", "b-h-b", "B-HB", "BH-B",
        "Kirk-Cohen", "Mc Donald", "a1b", "-Bob", "3Bob", "x--",
        "--", "1234", "J  R",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    rows = df.select(
        "name",
        soundex_code(F.col("name")).alias("mine"),
        F.soundex("name").alias("builtin"),
    ).collect()
    diffs = [(r["name"], r["mine"], r["builtin"])
             for r in rows if r["mine"] != r["builtin"]]
    assert diffs == []
    got = {r["name"]: r["mine"] for r in rows}
    # the published NARA examples, pinned independently of the builtin
    assert got["Robert"] == got["Rupert"] == "R163"
    assert got["Ashcraft"] == got["Ashcroft"] == "A261"
    assert got["Tymczak"] == "T522"
    assert got["Pfister"] == "P236"
    assert got["Honeyman"] == "H555"


def test_soundex_on_part_words_matches_builtin(spark):
    import pyspark.sql.functions as F

    from demv_spark.operators.linkage import soundex_code

    p = spark.read.parquet("/root/testdata/sf0.001/part.parquet").select(
        F.element_at(F.split("p_name", " "), 1).alias("w")
    )
    assert (
        p.filter(soundex_code(F.col("w")) != F.soundex("w")).count() == 0
    )


def test_soundex_blocks_sound_alike_variants(spark):
    """The linkage use: misspelled sound-alike variants land in the
    SAME block, so blocked_fuzzy_join compares them."""
    import pyspark.sql.functions as F

    from demv_spark.operators.linkage import soundex_code

    pairs = [("Smith", "Smyth"), ("Catherine", "Kathryn"),
             ("Meier", "Meyer"), ("Schmidt", "Schmitt")]
    df = spark.createDataFrame(pairs, ["a", "b"])
    same = df.select(
        (soundex_code(F.col("a")) == soundex_code(F.col("b"))).alias("s")
    ).collect()
    # Catherine/Kathryn differ on the first LETTER (C vs K) — soundex
    # keeps the letter, so they do NOT block together (documented
    # limitation of first-letter soundex); the rest do
    assert [r["s"] for r in same] == [True, False, True, True]
