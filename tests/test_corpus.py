"""Mixture sampler invariants: budget arithmetic, admission rule,
determinism under repartitioning, and the report's exact shares."""

import pyspark.sql.functions as F
import pytest

from demv_spark.operators import corpus


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


MIX = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def _unit_totals(df, unit_col):
    rows = df.groupBy("source").agg(F.sum(unit_col).alias("u")).collect()
    return {r["source"]: r["u"] for r in rows}


def test_unit_budgets_hit_within_one_row(spark, docs):
    out = corpus.mixture_sample(
        docs, "source", MIX, key_cols=["doc_id"], unit_col="n_chars"
    )
    avail = _unit_totals(docs.filter(F.col("source").isin(list(MIX))), "n_chars")
    n = min(int(avail[g] / w) for g, w in MIX.items())
    got = _unit_totals(out, "n_chars")
    max_chars = (
        docs.filter(F.col("source").isin(list(MIX)))
        .agg(F.max("n_chars"))
        .collect()[0][0]
    )
    for g, w in MIX.items():
        target = int(w * n)
        # admission while exclusive running sum < target: never more
        # than one row past target, never under while rows remained
        assert target <= got[g] < target + max_chars
    assert set(got) == set(MIX)


def test_row_mode_is_exact(spark, docs):
    out = corpus.mixture_sample(docs, "source", MIX, key_cols=["doc_id"])
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n = min(int(avail[g] / w) for g, w in MIX.items())
    assert counts == {g: int(w * n) for g, w in MIX.items()}


def test_fixed_total_budget(spark, docs):
    out = corpus.mixture_sample(
        docs, "source", MIX, key_cols=["doc_id"], total=40
    )
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"src0": 20, "src1": 12, "src2": 8}


def test_deterministic_across_partitioning(spark, docs):
    a = corpus.mixture_sample(docs, "source", MIX, key_cols=["doc_id"])
    b = corpus.mixture_sample(
        docs.repartition(7, "lang"), "source", MIX, key_cols=["doc_id"]
    )
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b


def test_zero_weight_groups_dropped(spark, docs):
    out = corpus.mixture_sample(
        docs, "source", {"src0": 1.0, "src1": 0.0}, key_cols=["doc_id"]
    )
    assert {r["source"] for r in out.select("source").distinct().collect()} == {"src0"}
    with pytest.raises(ValueError):
        corpus.mixture_sample(docs, "source", {"src0": 0.0}, key_cols=["doc_id"])


def test_report_shares_sum_to_one(spark, docs):
    out = corpus.mixture_sample(
        docs, "source", MIX, key_cols=["doc_id"], unit_col="n_chars"
    )
    rep = corpus.mixture_report(out, "source", "n_chars").collect()
    total = sum(r["share"] for r in rep)
    assert abs(float(total) - 1.0) < 1e-9
    # achieved mix tracks the target within the one-row overshoot
    shares = {r["source"]: float(r["share"]) for r in rep}
    for g, w in MIX.items():
        assert abs(shares[g] - w) < 0.05


def test_mixture_epochs_upsamples_to_exact_targets(spark):
    from demv_spark.operators.corpus import mixture_sample_epochs

    rows = [(f"{g}-{i}", g) for g in ("a", "b", "c") for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "src"])
    # N = 30 rows; targets: a=15 (1.5 epochs), b=9, c=6
    out = mixture_sample_epochs(
        df, "src", {"a": 0.5, "b": 0.3, "c": 0.2}, key_cols=["id"]
    )
    census = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert census == {"a": 15, "b": 9, "c": 6}
    # group a: every row appears at least once (full epoch) and
    # exactly 5 rows twice
    per_row = [
        r["k"]
        for r in out.filter(F.col("src") == "a")
        .groupBy("id").agg(F.count(F.lit(1)).alias("k")).collect()
    ]
    assert sorted(per_row) == [1] * 5 + [2] * 5
    # epoch ids are dense per copy count
    eps = {
        r["epoch"]
        for r in out.filter(F.col("src") == "a").select("epoch").collect()
    }
    assert eps == {0, 1}


def test_mixture_epochs_max_epochs_cap(spark):
    from demv_spark.operators.corpus import mixture_sample_epochs

    rows = [("a0", "a")] + [(f"b{i}", "b") for i in range(9)]
    df = spark.createDataFrame(rows, ["id", "src"])
    # a wants 0.5*10 = 5 copies of its single row; cap at 2 epochs
    out = mixture_sample_epochs(
        df, "src", {"a": 0.5, "b": 0.5}, key_cols=["id"], max_epochs=2.0
    )
    census = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert census == {"a": 2, "b": 5}


def test_mixture_epochs_deterministic(spark, docs):
    from demv_spark.operators.corpus import mixture_sample_epochs

    kw = dict(
        group_col="source",
        proportions={"src0": 0.6, "src1": 0.4},
        key_cols=["doc_id"],
        unit_col="n_chars",
        max_epochs=4.0,
    )
    a = mixture_sample_epochs(docs, **kw).collect()
    b = mixture_sample_epochs(docs.repartition(7), **kw).collect()
    key = lambda r: (r["doc_id"], r["epoch"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_quality_weighted_sample(spark):
    from demv_spark.operators.corpus import quality_weighted_sample

    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, 0)        # never admitted
        .when(F.col("id") % 4 == 1, 1000)      # always admitted
        .when(F.col("id") % 4 == 2, 500)       # ~half admitted
        .otherwise(F.lit(None).cast("long"))   # NULL → flagged 0
        .alias("q"),
    )
    out = quality_weighted_sample(df, "q").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q"], []).append(r["admitted"])
    assert set(by_q[0]) == {0}
    assert set(by_q[1000]) == {1}
    assert set(by_q[None]) == {0}
    rate = sum(by_q[500]) / len(by_q[500])
    assert 0.40 < rate < 0.60  # 500/1000 admission probability

    # deterministic under repartitioning
    again = {
        r["doc_id"]: r["admitted"]
        for r in quality_weighted_sample(df.repartition(13), "q").collect()
    }
    assert again == {r["doc_id"]: r["admitted"] for r in out}

    # map-only plan
    from demv_spark.plans.introspect import plan_stats

    s = plan_stats(quality_weighted_sample(df, "q"))
    assert s["n_broadcasts"] == 0 and not s["has_python_udf"]


def test_temperature_mixture_flattens_distribution(spark):
    """alpha=0.5 up-weights small sources: the small group's admitted
    SHARE must exceed its raw share, and all integer invariants hold
    (target = T*q div S, admitted units overshoot each target by at
    most one row)."""
    rows = [("big", i, 10) for i in range(900)] + [
        ("small", 10_000 + i, 10) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    out = corpus.temperature_mixture(
        df, "source", key_cols=["doc_id"], alpha=0.5, unit_col="n_chars"
    )
    got = {r["source"]: r["u"] for r in
           out.groupBy("source").agg(F.sum("n_chars").alias("u")).collect()}
    tot = sum(got.values())
    # raw small share = 10%; sqrt weights = sqrt(9000):sqrt(1000) = 3:1
    # -> expected small share = 25%
    assert got["small"] / tot > 0.2
    assert got["small"] <= 1000  # never exceeds availability
    assert got["big"] <= 9000


def test_temperature_mixture_no_int64_wrap(spark):
    """ADVICE r5 (medium): with avail ~ 1e12 units per group the
    products avail*S and T*q exceed 2^63 and, before the DECIMAL(19,0)
    widening, wrapped SILENTLY under non-ANSI Spark — producing
    negative targets that admit nothing. The exact targets are
    computable by hand: q = sqrt(avail)*1e6 exactly for square
    avails, so feasible T = min(avail*S div q) and
    target_g = T*q_g div S."""
    avails = {"a": 10**12, "b": 4 * 10**12, "c": 10**12}
    df = spark.createDataFrame(
        [(g, i, u) for i, (g, u) in enumerate(avails.items())],
        ["g", "k", "u"],
    )
    out = corpus.temperature_mixture(df, "g", ["k"], alpha=0.5, unit_col="u")
    # exact integer twin: q_a=q_c=1e12, q_b=2e12, S=4e12, T=4e12
    # targets: a,c -> 1e12 (== avail, row admitted); b -> 2e12 > 0
    # (its single 4e12-unit row starts at __before=0 < target)
    assert sorted(r["g"] for r in out.collect()) == ["a", "b", "c"]


def test_temperature_mixture_deterministic(spark, docs):
    a = sorted(
        r["doc_id"] for r in corpus.temperature_mixture(
            docs.select("doc_id", "source", "n_chars"), "source",
            key_cols=["doc_id"], unit_col="n_chars").collect()
    )
    b = sorted(
        r["doc_id"] for r in corpus.temperature_mixture(
            docs.select("doc_id", "source", "n_chars").repartition(13), "source",
            key_cols=["doc_id"], unit_col="n_chars").collect()
    )
    assert a == b and len(a) > 0


def test_temperature_mixture_excludes_null_and_zero_groups(spark):
    """Review r5: a tiny NULL-source group must not poison the
    feasible budget T (it clamped the whole mixture to ~nothing), and
    a zero-unit group must not divide-by-zero under ANSI mode."""
    rows = (
        [("big", i, 10) for i in range(100)]
        + [(None, 1000 + i, 10) for i in range(2)]
        + [("empty", 2000 + i, 0) for i in range(3)]
    )
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    out = corpus.temperature_mixture(
        df, "source", key_cols=["doc_id"], unit_col="n_chars"
    ).collect()
    srcs = {r["source"] for r in out}
    assert srcs == {"big"}          # NULL and zero-unit groups excluded
    assert len(out) == 100          # budget NOT clamped by the NULL group


def test_shard_assignment_contiguous_and_balanced(docs):
    out = corpus.shard_assignment(docs.select("doc_id"), ["doc_id"], 8)
    rows = out.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    assert set(by_shard) == set(range(8))
    # positions are exactly 1..n per shard
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # hash balance: no shard more than 2x the mean
    sizes = [len(ps) for ps in by_shard.values()]
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))


def test_shard_assignment_stable_under_growth_and_partitioning(spark, docs):
    base = docs.select("doc_id").filter("doc_id < 300")
    grown = docs.select("doc_id")
    a = {r["doc_id"]: r["shard"] for r in
         corpus.shard_assignment(base, ["doc_id"], 8).collect()}
    b = {r["doc_id"]: r["shard"] for r in
         corpus.shard_assignment(grown, ["doc_id"], 8).collect()}
    # growing the corpus never moves an existing row's SHARD
    assert all(b[k] == v for k, v in a.items())
    c = sorted(map(tuple,
        corpus.shard_assignment(grown.repartition(13), ["doc_id"], 8).collect()))
    d = sorted(map(tuple, corpus.shard_assignment(grown, ["doc_id"], 8).collect()))
    assert c == d


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, fp string")


def test_corpus_diff_all_verdicts(spark):
    old = _snap(spark, [(1, "a"), (2, "b"), (3, "c"), (4, None)])
    new = _snap(spark, [(2, "b"), (3, "X"), (4, None), (5, "e")])
    got = {r["doc_id"]: r["verdict"]
           for r in corpus.corpus_diff(old, new, ["doc_id"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged",  # NULL fp both sides = unchanged
                   5: "added"}


def test_corpus_diff_null_fp_present_not_absent(spark):
    # present-with-NULL-fp on one side only is CHANGED, never added/removed
    old = _snap(spark, [(1, None)])
    new = _snap(spark, [(1, "x")])
    rows = corpus.corpus_diff(old, new, ["doc_id"]).collect()
    assert rows[0]["verdict"] == "changed"


def test_corpus_diff_census_counts(spark):
    old = _snap(spark, [(i, f"v{i}") for i in range(10)])
    new = _snap(spark, [(i, f"v{i}" if i % 3 else "mod") for i in range(2, 12)])
    got = {r["verdict"]: r["n"]
           for r in corpus.corpus_diff_census(old, new, ["doc_id"]).collect()}
    # removed: 0,1; added: 10,11; changed among 2..9: i%3==0 -> 3,6,9
    assert got == {"removed": 2, "added": 2, "changed": 3, "unchanged": 5}
    with pytest.raises(ValueError):
        corpus.corpus_diff(old, new, [])


def test_corpus_diff_properties_random_snapshots(spark):
    # seeded random snapshot pair: the verdicts must partition the
    # key union, diff(a, a) must be all-unchanged, and swapping the
    # sides must map added<->removed and keep changed/unchanged
    import random

    rng = random.Random(99)
    old_rows = [(i, f"v{rng.randint(0, 5)}") for i in range(200) if rng.random() < 0.8]
    new_rows = [(i, f"v{rng.randint(0, 5)}") for i in range(200) if rng.random() < 0.8]
    old = _snap(spark, old_rows)
    new = _snap(spark, new_rows)
    fwd = {r["doc_id"]: r["verdict"]
           for r in corpus.corpus_diff(old, new, ["doc_id"]).collect()}
    assert set(fwd) == {i for i, _ in old_rows} | {i for i, _ in new_rows}
    rev = {r["doc_id"]: r["verdict"]
           for r in corpus.corpus_diff(new, old, ["doc_id"]).collect()}
    flip = {"added": "removed", "removed": "added",
            "changed": "changed", "unchanged": "unchanged"}
    assert rev == {k: flip[v] for k, v in fwd.items()}
    self_diff = corpus.corpus_diff(old, old, ["doc_id"]).collect()
    assert all(r["verdict"] == "unchanged" for r in self_diff)


def test_assign_sequences_hand_computed(spark):
    """Single shard: offsets are exact prefix sums in portable-hash
    order; docs span sequence boundaries; empty docs occupy nothing."""
    from demv_spark.operators.corpus import assign_sequences
    from demv_spark.functions.compat import portable_hash

    df = spark.createDataFrame(
        [(1, 6), (2, 3), (3, 0), (4, 10)], "doc_id long, n_tokens long"
    )
    out = assign_sequences(df, "n_tokens", seq_len=8, key_cols=["doc_id"]).collect()
    # reconstruct the hash order driver-side
    order = [
        r["doc_id"]
        for r in df.select(
            "doc_id",
            portable_hash(
                F.concat_ws(":", F.lit("pack42"), F.col("doc_id").cast("string"))
            ).alias("h"),
        ).orderBy("h", "doc_id").collect()
    ]
    toks = {1: 6, 2: 3, 3: 0, 4: 10}
    offset, want = 0, {}
    for d in order:
        nt = toks[d]
        last = offset + nt - 1 if nt > 0 else offset
        want[d] = (offset, offset // 8, last // 8, offset % 8)
        offset += nt
    got = {
        r["doc_id"]: (r["token_offset"], r["seq_first"], r["seq_last"],
                      r["offset_in_seq"])
        for r in out
    }
    assert got == want
    # total stream length: 19 tokens -> last sequence id is 2
    assert max(r["seq_last"] for r in out) == (19 - 1) // 8


def test_assign_sequences_multi_shard_deterministic(spark):
    from demv_spark.operators.corpus import assign_sequences

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17 + 1).alias("n_tokens")
    )
    a = sorted(map(tuple, assign_sequences(
        df, "n_tokens", 128, ["doc_id"], n_shards=4).collect()))
    b = sorted(map(tuple, assign_sequences(
        df.repartition(7), "n_tokens", 128, ["doc_id"], n_shards=4).collect()))
    assert a == b
    # per-shard offsets are dense prefix sums: within a shard, sorting
    # by token_offset gives consecutive non-overlapping spans
    from collections import defaultdict
    by_shard = defaultdict(list)
    for r in assign_sequences(df, "n_tokens", 128, ["doc_id"], n_shards=4).collect():
        by_shard[r["shard"]].append((r["token_offset"], r["n_tokens"]))
    for rows in by_shard.values():
        rows.sort()
        pos = 0
        for off, nt in rows:
            assert off == pos
            pos += nt


def test_assign_sequences_guards(spark):
    from demv_spark.operators.corpus import assign_sequences

    df = spark.createDataFrame([(1, 2)], "doc_id long, n_tokens long")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="seq_len"):
        assign_sequences(df, "n_tokens", 0, ["doc_id"])
    with _pytest.raises(ValueError, match="n_shards"):
        assign_sequences(df, "n_tokens", 8, ["doc_id"], n_shards=0)


# ---- DSIR importance weights (round 9) ----

def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs drawn from the target slice must average a higher
    weight_bits than the rest of the corpus (the whole point of
    importance resampling), and the weights are deterministic under
    repartitioning."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    target = docs.filter(F.lower("source").isin("src1", "src3"))
    w = corpus.dsir_weights(docs, target, n_buckets=512, seed=7)
    joined = w.join(
        docs.select(
            "doc_id", F.lower("source").isin("src1", "src3").alias("is_t")
        ),
        "doc_id",
    )
    means = {
        r["is_t"]: r["m"]
        for r in joined.groupBy("is_t")
        .agg(F.avg("weight_bits").alias("m"))
        .collect()
    }
    assert means[True] > means[False]
    again = corpus.dsir_weights(
        docs.repartition(13), target.repartition(7), n_buckets=512, seed=7
    )
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, again.collect()))


def test_dsir_weights_python_mirror(spark):
    """Hand-computed mirror on a tiny corpus: featurization
    (unigrams + bigrams), bucket censuses, bitlen-log2 weights."""
    import hashlib

    rows = [
        (1, "spark joins tables"),
        (2, "spark joins"),
        (3, "cats purr loudly"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    target = df.filter(F.col("doc_id").isin(1, 2))
    m = 64
    got = {
        r["doc_id"]: (r["n_feats"], r["weight_bits"])
        for r in corpus.dsir_weights(df, target, n_buckets=m, seed=7).collect()
    }

    def feats(text):
        t = (text or "").strip().lower().split()
        t = [w for w in t if w != ""]
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(f):
        h = int(hashlib.md5(f"dsir7:{f}".encode()).hexdigest()[:15], 16)
        return h % m

    from collections import Counter
    q_census, t_census = Counter(), Counter()
    per_doc = {}
    for doc_id, text in rows:
        c = Counter(bucket(f) for f in feats(text))
        per_doc[doc_id] = c
        q_census.update(c)
        if doc_id in (1, 2):
            t_census.update(c)
    T, Q = sum(t_census.values()), sum(q_census.values())
    norm = (Q + m).bit_length() - (T + m).bit_length()
    for doc_id, c in per_doc.items():
        n = sum(c.values())
        fb = sum(
            k_c * ((t_census[b] + 1).bit_length() - (q_census[b] + 1).bit_length())
            for b, k_c in c.items()
        )
        assert got[doc_id] == (n, fb + n * norm), doc_id
    assert got[4] == (0, 0)   # NULL text: no features, flag-not-filter


def test_budget_waterfill_three_regimes(spark):
    """Hand-checked water-filling closed form: mixed capped/uncapped
    (the redistribution case mixture_sample_epochs' truncation
    misses), budget above all caps (everyone capped), and tiny budget
    (pure proportional floors)."""
    from demv_spark.operators.corpus import budget_waterfill

    census = spark.createDataFrame(
        [("a", 100, 1), ("b", 1000, 1), ("c", 10000, 2)],
        "source string, tokens long, weight long",
    )
    out = sorted(map(tuple, budget_waterfill(
        census, 5000, max_epochs=2).collect()))
    # a capped at 200; remaining 4800 splits 1:2 between b and c
    assert out == [("a", 100, 1, 200, 200), ("b", 1000, 1, 2000, 1600),
                   ("c", 10000, 2, 20000, 3200)], out
    out2 = sorted(map(tuple, budget_waterfill(
        census, 10**9, max_epochs=2).collect()))
    assert [r[4] for r in out2] == [200, 2000, 20000]
    out3 = sorted(map(tuple, budget_waterfill(
        census, 100, max_epochs=2).collect()))
    assert [r[4] for r in out3] == [25, 25, 50]
    # allocation never exceeds the budget or any cap
    for rows, budget in ((out, 5000), (out2, 10**9), (out3, 100)):
        assert sum(r[4] for r in rows) <= budget
        assert all(r[4] <= r[3] for r in rows)
