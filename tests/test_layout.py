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


# ---- Hilbert curve (round 9, sixth wave) ----

def _xy2d_reference(n, x, y):
    """The classic Wikipedia xy→d walk — the public reference the
    operator must reproduce bit-for-bit."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_bijective_adjacent(spark):
    from demv_spark.operators.layout import hilbert_key_2d

    bits = 4
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], ["x", "y"]
    )
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in hilbert_key_2d(grid, "x", "y", bits).collect()
    }
    assert got == {
        (x, y): _xy2d_reference(n, x, y) for x in range(n) for y in range(n)
    }
    inv = {d: xy for xy, d in got.items()}
    assert sorted(inv) == list(range(n * n))  # bijection
    # THE Hilbert property: consecutive keys are Manhattan neighbors
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(n * n - 1)
    )


def test_hilbert_beats_zorder_locality_on_grid(spark):
    """The reason to prefer Hilbert: bucketing a full grid by key
    prefix gives per-bucket coordinate ranges no wider than Z-order's
    (strictly tighter in aggregate) — the file min/max bounds a
    pruned scan consults."""
    from demv_spark.operators.layout import (
        hilbert_pruning_stats,
        zorder_pruning_stats,
    )

    bits = 5
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], ["a", "b"]
    )

    def spread(rows):
        return sum(
            (r["max_a"] - r["min_a"] + 1) * (r["max_b"] - r["min_b"] + 1)
            for r in rows
        )

    hs = spread(hilbert_pruning_stats(grid, "a", "b", bits, 4).collect())
    zs = spread(zorder_pruning_stats(grid, ["a", "b"], bits, 4).collect())
    # both partitions cover the grid; Hilbert's bounding boxes are
    # exact quadrants here too, but never WORSE
    assert hs <= zs


def test_hilbert_plan_is_map_only_no_udf(spark):
    from demv_spark.operators.layout import hilbert_key_2d
    from demv_spark.plans.introspect import plan_stats

    grid = spark.createDataFrame([(1, 2)], ["x", "y"])
    stats = plan_stats(hilbert_key_2d(grid, "x", "y", 10))
    assert stats["n_exchanges"] == 0
    assert not stats["has_python_udf"]


def test_hilbert_validation(spark):
    import pytest as _pytest

    from demv_spark.operators.layout import (
        hilbert_key_2d,
        hilbert_pruning_stats,
    )

    grid = spark.createDataFrame([(1, 2)], ["x", "y"])
    with _pytest.raises(ValueError, match="bits"):
        hilbert_key_2d(grid, "x", "y", 0)
    with _pytest.raises(ValueError, match="prefix_bits"):
        hilbert_pruning_stats(grid, "x", "y", 4, 9)
