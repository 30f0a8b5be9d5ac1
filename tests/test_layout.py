"""Z-order keys: hand-computed interleave, SQL-twin parity, pruning
census narrowness vs a single-column layout."""

import duckdb
import pyspark.sql.functions as F
import pytest

from demv_spark.operators.layout import (
    zorder_key,
    zorder_key_sql,
    zorder_pruning_stats,
)
from demv_spark.plans.introspect import plan_stats


def test_hand_computed_interleave(spark):
    # x=0b11, y=0b01, 2 bits: key bits = y1 x1 y0 x0 = 0 1 1 1 = 7
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    got = df.select(
        zorder_key([F.col("x"), F.col("y")], 2).alias("z")
    ).collect()[0]["z"]
    assert got == 0b0111
    # x=0b10, y=0b11 -> y1 x1 y0 x0 = 1 1 1 0 = 14
    df2 = spark.createDataFrame([(2, 3)], "x long, y long")
    got2 = df2.select(
        zorder_key([F.col("x"), F.col("y")], 2).alias("z")
    ).collect()[0]["z"]
    assert got2 == 0b1110


def test_sql_twin_bit_parity(spark):
    rows = [(i, (i * 37) % 1024, (i * 101) % 1024) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", zorder_key([F.col("a"), F.col("b")], 10).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    expr = zorder_key_sql(["a", "b"], 10)
    want = {
        i: con.execute(f"SELECT {expr} FROM (SELECT {a} a, {b} b)").fetchone()[0]
        for i, a, b in rows[:50]
    }
    for i, z in want.items():
        assert got[i] == z


def test_out_of_range_bits_masked_not_corrupt(spark):
    # value 4 with bits=2: bit 2 is dropped, key = interleave(0, y)
    df = spark.createDataFrame([(4, 1)], "x long, y long")
    got = df.select(zorder_key([F.col("x"), F.col("y")], 2).alias("z")).collect()
    assert got[0]["z"] == 0b0010  # only y's bit 0 at position 1


def test_key_width_guard():
    with pytest.raises(ValueError, match="63"):
        zorder_key([F.lit(1), F.lit(1), F.lit(1)], 22)
    with pytest.raises(ValueError, match="no columns"):
        zorder_key([], 8)


def test_pruning_census_is_narrower_than_single_sort(spark):
    """The point of the curve: bucket by z-prefix and BOTH dims have
    narrow ranges; bucket by one dim's prefix and the other dim's
    range stays full-width."""
    rows = [((i * 37) % 256, (i * 101) % 256) for i in range(4096)]
    df = spark.createDataFrame(rows, "a long, b long")
    stats = zorder_pruning_stats(df, ["a", "b"], bits=8, prefix_bits=4).collect()
    assert sum(r["n"] for r in stats) == 4096
    # each of the 16 z-buckets spans at most a quarter of each dim
    for r in stats:
        assert r["max_a"] - r["min_a"] <= 64
        assert r["max_b"] - r["min_b"] <= 64
    # contrast: bucketing by a's top 4 bits leaves b full-range
    by_a = (
        df.groupBy(F.shiftrightunsigned(F.col("a"), 4).alias("bucket"))
        .agg(F.min("b").alias("min_b"), F.max("b").alias("max_b"))
        .collect()
    )
    assert any(r["max_b"] - r["min_b"] > 128 for r in by_a)


def test_map_only_no_shuffle_no_udf(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    s = plan_stats(df.select(zorder_key([F.col("a"), F.col("b")], 8).alias("z")))
    assert not s["has_python_udf"]
    assert s.get("n_exchanges", 0) == 0


def test_zorder_write_narrows_per_file_ranges(spark, tmp_path):
    """End-to-end: range-partition by the z-key and write parquet —
    every FILE's min/max range on BOTH dims must be narrower than a
    single-dim layout achieves on its neglected dim (this is the
    footer-stats pruning the operator exists for)."""
    import glob
    import os

    rows = [((i * 37) % 256, (i * 101) % 256) for i in range(4096)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = zorder_key([F.col("a"), F.col("b")], 8)

    zdir = str(tmp_path / "zorder")
    (df.withColumn("z", z).repartitionByRange(16, "z")
       .sortWithinPartitions("z").write.parquet(zdir))
    adir = str(tmp_path / "bya")
    (df.repartitionByRange(16, "a").sortWithinPartitions("a")
       .write.parquet(adir))

    def file_ranges(d):
        out = []
        for p in glob.glob(os.path.join(d, "part-*.parquet")):
            pdf = spark.read.parquet(p).agg(
                F.min("a"), F.max("a"), F.min("b"), F.max("b")
            ).collect()[0]
            out.append((pdf[1] - pdf[0], pdf[3] - pdf[2]))
        return out

    zr = file_ranges(zdir)
    ar = file_ranges(adir)
    # z-order: every file narrow on BOTH dims (quarter-width here)
    assert all(wa <= 96 and wb <= 96 for wa, wb in zr), zr
    # single-dim: b stays full-width in most files
    assert sum(1 for _, wb in ar if wb > 128) >= len(ar) // 2, ar
