"""duplicate_clusters (large-star/small-star connected components)
and canonical_filter invariants, checked against a driver-side
union-find brute force."""

import random

import pyspark.sql.functions as F
import pytest

from demv_spark.operators import dedup


def _clusters(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = dedup.duplicate_clusters(df)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label every node by component minimum
    comp = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def test_chain_closes_transitively(spark):
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_components_and_cycle(spark):
    got = _clusters(spark, [(10, 11), (11, 12), (12, 10), (20, 21)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_needs_multiple_rounds(spark):
    # diameter 32: naive flooding would need 32 rounds; star rounds
    # are logarithmic, so this must converge well under max_iter
    pairs = [(i, i + 1) for i in range(1, 33)]
    random.Random(7).shuffle(pairs)
    got = _clusters(spark, pairs)
    assert got == {i: 1 for i in range(1, 34)}


def test_duplicate_and_reversed_pairs_are_harmless(spark):
    got = _clusters(spark, [(2, 1), (1, 2), (2, 3), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(100, 200))
    pairs = [tuple(rng.sample(nodes, 2)) for _ in range(80)]
    got = _clusters(spark, pairs)
    assert got == _union_find(pairs)


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup.duplicate_clusters(df)
    assert out.count() == 0
    assert out.columns == ["doc_id", "cluster_id"]


def test_null_and_self_pairs_dropped(spark):
    got = _clusters(spark, [(1, 1), (None, 5), (2, None), (2, 3)])
    assert got == {2: 2, 3: 2}


def test_canonical_filter_keeps_one_per_cluster(spark):
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("d"), F.col("doc_id"))
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    clusters = dedup.duplicate_clusters(pairs)
    kept = dedup.canonical_filter(docs, clusters)
    kept_ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    # 2,3 collapse into 1; 8 collapses into 7; everything unpaired stays
    assert kept_ids == [0, 1, 4, 5, 6, 7, 9]


def test_lsh_pipeline_composes(spark, request):
    # end to end on real near-dup pairs: every cluster member must be
    # connected to its root through the pair graph
    rows = [(i, "the quick brown fox jumps over the lazy dog " + str(i % 3))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16)
    clusters = dedup.duplicate_clusters(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    want = _union_find([(r["id_a"], r["id_b"]) for r in pairs.collect()])
    assert got == want


def test_incremental_admission_verdicts(spark):
    from demv_spark.operators.dedup import incremental_admission

    store = spark.createDataFrame([("a",), ("b",)], "fp string")
    batch = spark.createDataFrame(
        [(1, "a"), (2, "c"), (3, "c"), (4, None), (5, None), (6, "b")],
        "doc_id long, fp string",
    )
    got = {r["doc_id"]: r["verdict"]
           for r in incremental_admission(batch, store).collect()}
    assert got == {
        1: "dup_corpus",          # fp in store
        2: "admitted",            # first of the new fp within batch
        3: "dup_batch",           # second of the same new fp
        4: "admitted",            # NULL never matches store; first NULL wins
        5: "dup_batch",
        6: "dup_corpus",
    }


def test_incremental_admission_non_unique_store_never_fans_out(spark):
    from demv_spark.operators.dedup import incremental_admission

    store = spark.createDataFrame([("a",), ("a",), ("a",)], "fp string")
    batch = spark.createDataFrame([(1, "a"), (2, "x")], "doc_id long, fp string")
    out = incremental_admission(batch, store)
    assert out.count() == 2       # one output row per batch row, always


def test_incremental_admission_idempotent_across_reruns(spark):
    from demv_spark.operators.dedup import incremental_admission

    store = spark.createDataFrame([("a",)], "fp string")
    batch = spark.createDataFrame(
        [(1, "a"), (2, "c"), (3, "c")], "doc_id long, fp string"
    )
    first = incremental_admission(batch, store)
    admitted = first.filter("verdict = 'admitted'").select("fp")
    # appending the admitted fps and re-running the SAME batch must
    # admit nothing new (ingest idempotency)
    store2 = store.union(admitted)
    second = incremental_admission(batch, store2)
    assert second.filter("verdict = 'admitted'").count() == 0
