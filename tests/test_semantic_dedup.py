"""SemDeDup pipeline: whitening inverse + the whiten→bucket→prune
composition (operators/similarity.py).

The driver row q_sim_semantic_e2e value-checks the full census against
a DuckDB replay (recursive-CTE Gauss-Jordan + list folds); these tests
pin the pieces an oracle mismatch would not localize: the inverse is a
true matrix inverse, the pipeline catches planted duplicates and keeps
exactly one representative per component, the neighbor cap bounds
candidate volume without touching the planted contract, and degenerate
(qaa = 0) rows are excluded rather than NaN-ordered.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from demv_spark.operators.similarity import (
    semantic_dedup,
    whitening_inverse,
)


def _toy_embeddings(spark, n=120, d=8, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d)) * rng.uniform(0.5, 2.0, size=d)
    rows = [
        (int(i), [float(x) for x in base[i]], int(i % 3)) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_whitening_inverse_is_an_inverse(spark):
    df = _toy_embeddings(spark, n=200, d=8)
    mu, minv, n = whitening_inverse(df, dim=8, ridge=1e-6)
    assert n == 200 and len(mu) == 8
    # rebuild Σ + ridge·I exactly as the operator saw it (float32
    # parquet → double) and check M(Σ+ridge·I) ≈ I
    pdf = df.toPandas()
    X = np.array([np.asarray(v, dtype=np.float64)[:8] for v in pdf["embedding"]])
    S = np.cov(X, rowvar=False, ddof=1) + 1e-6 * np.eye(8)
    resid = np.abs(np.array(minv) @ S - np.eye(8)).max()
    # decimal(28,6) sum truncation makes Σ agree to ~1e-6 per entry,
    # so the inverse residual is small but not machine-eps
    assert resid < 1e-3, resid


def test_whitening_inverse_rejects_degenerate(spark):
    one = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="need >= 2"):
        whitening_inverse(one, dim=2)


def test_semantic_dedup_catches_planted_copies(spark):
    df = _toy_embeddings(spark, n=150, d=8)
    planted = df.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x: (x.cast("double") * 1.001).cast("float"),
        ).alias("embedding"),
        "label",
    )
    n_planted = planted.count()
    out = semantic_dedup(
        df.unionByName(planted), dim=8, n_clusters=3, tau=0.99, seed=42
    ).collect()
    assert sum(r.n_members for r in out) == 150 + n_planted
    # every planted copy pairs with its original inside some cluster
    # and exactly the copy (the larger id) is dropped
    assert sum(r.n_dropped for r in out) == n_planted
    assert sum(r.n_kept for r in out) == 150
    assert all(r.n_kept + r.n_dropped == r.n_members for r in out)


def test_semantic_dedup_no_dups_keeps_everything(spark):
    df = _toy_embeddings(spark, n=80, d=8, seed=9)
    out = semantic_dedup(df, dim=8, n_clusters=2, tau=0.9999).collect()
    assert sum(r.n_members for r in out) == 80
    assert sum(r.n_dropped for r in out) == 0
    assert all(r.n_dup_pairs == 0 for r in out)


def test_semantic_dedup_transitive_component_keeps_one(spark):
    # three scaled copies of the same vector: the dup graph is a
    # triangle (or at least a path) — keep-one must keep exactly the
    # minimum id, not one per pair
    base = _toy_embeddings(spark, n=60, d=8, seed=5)

    def _scaled(s):
        # NB: a two-arg lambda would make F.transform pass the array
        # INDEX as the second argument — close over s instead
        return lambda x: (x.cast("double") * F.lit(s)).cast("float")

    copies = []
    for scale, off in ((1.0005, 500), (1.001, 600)):
        copies.append(
            base.filter(F.col("vec_id") == 7).select(
                (F.col("vec_id") + off).alias("vec_id"),
                F.transform(F.col("embedding"), _scaled(scale)).alias(
                    "embedding"
                ),
                "label",
            )
        )
    corpus = base.unionByName(copies[0]).unionByName(copies[1])
    out = semantic_dedup(corpus, dim=8, n_clusters=2, tau=0.99).collect()
    assert sum(r.n_members for r in out) == 62
    assert sum(r.n_dropped for r in out) == 2  # both copies, one keeper


def test_semantic_dedup_max_cluster_cap_bounds_neighbors(spark):
    df = _toy_embeddings(spark, n=100, d=8, seed=11)
    planted = df.filter(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x: (x.cast("double") * 1.001).cast("float"),
        ).alias("embedding"),
        "label",
    )
    corpus = df.unionByName(planted)
    exact = semantic_dedup(corpus, dim=8, n_clusters=2, tau=0.99)
    capped = semantic_dedup(
        corpus, dim=8, n_clusters=2, tau=0.99, max_cluster=10**6
    )
    # a cap larger than any cluster is a no-op — same census
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, capped.collect())
    )
    # a tight cap can only shrink the candidate set (never grow it)
    tight = semantic_dedup(
        corpus, dim=8, n_clusters=2, tau=0.99, max_cluster=8
    ).collect()
    assert sum(r.n_dup_pairs for r in tight) <= sum(
        r.n_dup_pairs for r in exact.collect()
    )


def test_semantic_dedup_default_is_capped_and_exact_below_cap(spark):
    """Round 12 (VERDICT r11 item 5): the API default is the CAPPED
    linear prune (max_cluster=256) — at 100 TB a bare
    semantic_dedup() must not pick the quadratic plan. Below the cap
    the capped prune keeps every neighbor, so on a small corpus the
    default census equals the explicit uncapped opt-out exactly."""
    import inspect

    sig = inspect.signature(semantic_dedup)
    assert sig.parameters["max_cluster"].default == 256
    df = _toy_embeddings(spark, n=100, d=8, seed=11)
    default_out = sorted(
        map(tuple, semantic_dedup(df, dim=8, n_clusters=2, tau=0.99).collect())
    )
    uncapped = sorted(
        map(
            tuple,
            semantic_dedup(
                df, dim=8, n_clusters=2, tau=0.99, max_cluster=None
            ).collect(),
        )
    )
    assert default_out == uncapped


def test_semantic_dedup_empty_input_returns_empty_census(spark):
    """Zero valid rows AFTER whitening (every row identical → every
    centered vector is exactly μ, qaa = 0, excluded) used to make the
    literal-fold assignment build F.array() — an array<null> whose
    struct-field access fails analysis (ADVICE r11). Now: an empty
    census with the standard schema. (All-NULL inputs trip
    whitening_inverse's own no-valid-vectors guard before this path.)"""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]),
         (1, [1.0, 2.0, 3.0, 4.0]),
         (2, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(df, dim=4, n_clusters=2, tau=0.99)
    assert out.columns == [
        "cluster", "n_members", "n_dup_pairs", "n_kept", "n_dropped"
    ]
    assert out.count() == 0


def test_semantic_dedup_symmetric_cluster_skips_degenerate_lloyd(spark):
    """A perfectly symmetric corpus recomputes every Lloyd centroid
    at exactly μ (__qcc = 0, filtered) — the refinement round is
    skipped, keeping the seed assignment, instead of folding an
    empty centroid array (ADVICE r11)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [-1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 2.0, 0.0, 0.0]),
        (3, [0.0, -2.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(
        df, dim=4, n_clusters=1, tau=0.99, lloyd_iters=2
    ).collect()
    assert sum(r.n_members for r in out) == 4
    assert sum(r.n_dropped for r in out) == 0


def test_semantic_dedup_excludes_zero_qaa_rows(spark):
    # a corpus whose mean IS one of the rows: that row's centered
    # vector can be ~0; build it explicitly — two mirrored vectors
    # and their exact midpoint repeated
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [-1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, -1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),  # the mean: z == 0, qaa == 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, dim=4, n_clusters=2, tau=0.99, ridge=1e-6)
    assert sum(r.n_members for r in out.collect()) == 4  # mean row excluded


def test_semantic_dedup_releases_session_caches(spark):
    # rows/assigned persists are released on return via the eager-
    # checkpoint-then-unpersist pattern (triangle_census precedent;
    # round-10 ADVICE): after a call no persist()-pinned blocks
    # survive — only the census checkpoint, which ContextCleaner
    # releases on GC
    df = _toy_embeddings(spark, n=80, d=8)
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = semantic_dedup(df, dim=8, n_clusters=2, tau=0.99)
    n_rows = sum(r.n_members for r in out.collect())
    assert n_rows == 80
    n = spark.sparkContext._jsc.getPersistentRDDs().size() - before
    assert n <= 2, f"{n} new RDD blocks pinned after semantic_dedup"
