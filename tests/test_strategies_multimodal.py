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
