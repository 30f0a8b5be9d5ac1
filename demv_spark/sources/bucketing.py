"""Bucketed table layout — shuffle-free co-located joins and
aggregations for tables that are joined on the same key repeatedly.

At warehouse scale the dominant cost of a big join is shuffling both
sides on the join key. Spark's bucketed tables pay that shuffle ONCE
at write time: `bucketBy(n, key)` hash-partitions rows into n files
per partition and records the layout in the catalog, so later
joins/aggregations on the bucket key reuse the stored distribution —
the physical plan has NO Exchange on the bucketed side (Catalyst
matches HashClusteredDistribution against the table's bucket spec).

This is the layout you'd give the two 100 TB fact tables of a
training pipeline (documents ⋈ scores, events ⋈ sessions): bucket
both by the join key with the SAME bucket count, sortBy the key to
make the merge phase a linear zip. The tests assert the contract on
the physical plan itself (zero Exchange in a bucketed-bucketed join),
not just on output equality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Both sides of a future co-located join must use the SAME
    ``num_buckets`` and bucket columns — Spark only elides the
    shuffle when the distributions match exactly."""
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> dict | None:
    """The table's bucket layout from the catalog (None if not
    bucketed): {"num_buckets": n, "bucket_cols": [...], "sort_cols":
    [...]} — check two tables agree before relying on a co-located
    plan."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        return None

    def _cols(v: str | None) -> list[str]:
        if not v:
            return []
        return [c.strip().strip("`") for c in v.strip("[]").split(",") if c.strip()]

    return {
        "num_buckets": int(info["Num Buckets"]),
        "bucket_cols": _cols(info.get("Bucket Columns")),
        "sort_cols": _cols(info.get("Sort Columns")),
    }


def colocated_join(
    spark: SparkSession, left: str, right: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key, checking
    the layouts actually line up (same bucket count and columns) so a
    silent mismatch doesn't quietly reintroduce the shuffle."""
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    for name, s in ((left, ls), (right, rs)):
        if s is None:
            raise ValueError(f"table {name} is not bucketed")
        if s["bucket_cols"] != list(on):
            raise ValueError(
                f"table {name} is bucketed by {s['bucket_cols']}, not {list(on)}"
            )
    if ls["num_buckets"] != rs["num_buckets"]:
        raise ValueError(
            f"bucket counts differ: {left}={ls['num_buckets']} "
            f"{right}={rs['num_buckets']} — the shuffle would come back"
        )
    return spark.table(left).join(spark.table(right), list(on), how)
