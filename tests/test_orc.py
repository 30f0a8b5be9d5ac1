"""ORC interchange round-trip: Spark's native distributed ORC
writer/reader must preserve complex types (array<float>) exactly,
including the degenerate shapes the embeddings sweep plants (NULL
array, empty array, wrong-dim array). The driver row
``q_corpus_orc_roundtrip`` value-checks the real embeddings table;
this pins the planted edge cases and full row-level identity."""

import pyspark.sql.functions as F


def _content_fx(col="embedding"):
    # floor(x * 2^20): power-of-two scale, exact in binary64 —
    # the same signature the driver oracle uses
    return F.aggregate(
        F.transform(
            col,
            lambda x: F.floor(x.cast("double") * F.lit(1048576.0)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )


def test_orc_roundtrip_identity_with_degenerate_arrays(spark, tmp_path):
    rows = [
        (1, [0.5, -0.25, 0.125], 0),
        (2, [], 0),            # empty array: aggregate folds to init 0
        (3, None, 0),          # NULL array: stays NULL, SUM-skips
        (4, [1.5], 1),         # wrong-dim: still round-trips
        (5, [float("inf"), -0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    path = str(tmp_path / "orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    a = sorted(
        (r["vec_id"], r["embedding"]) for r in back.collect()
    )
    b = sorted((i, e) for i, e, _ in rows)
    assert a == b
    # == treats -0.0 == 0.0, so pin the sign bit explicitly: the
    # inf/-0.0 row must come back with copysign intact
    import math

    neg_zero = dict(a)[5][1]
    assert neg_zero == 0.0 and math.copysign(1.0, neg_zero) == -1.0

    # the census signature is write-order invariant and NULL-safe
    got = {
        tuple(r)
        for r in back.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("embedding")).cast("long").alias("dims"),
        )
        .collect()
    }
    assert got == {(0, 3, 3 + 0), (1, 2, 1 + 2)}


def test_orc_roundtrip_overwrite_replaces(spark, tmp_path):
    path = str(tmp_path / "orc")
    spark.range(100).write.mode("overwrite").orc(path)
    spark.range(7).write.mode("overwrite").orc(path)
    assert spark.read.orc(path).count() == 7
