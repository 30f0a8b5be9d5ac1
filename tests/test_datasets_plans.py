import pyspark.sql.functions as F
import pytest

from demv_spark.plans.introspect import assert_no_python_udf, explain_str, plan_stats
from demv_spark.sources.datasets import DatasetSpec, load


@pytest.fixture(scope="module")
def cmc_like(spark):
    """cmc-loader-shaped raw table (getdataset.py:86-124 recipe shape)."""
    rows = [
        (24, 2, 3, 3, 1, 1, 2, 3, 0, 1),
        (45, 1, 3, 10, 1, 1, 3, 4, 0, 1),
        (43, 2, 3, 7, 1, 1, 3, 4, 0, 3),
        (42, 3, 2, 9, 1, 1, 3, 3, 0, 2),
        (36, 3, 3, 8, 1, 1, 3, 2, 0, 3),
        (19, 4, 4, 0, 1, 0, 3, 3, 0, 2),
        (38, 2, 3, 6, 1, 1, 3, 2, 0, 3),
        (21, 3, 3, 1, 1, 0, 3, 2, 0, 2),
        (27, 2, 3, 3, 1, 1, 3, 4, 0, 1),
        (45, 1, 1, 8, 1, 1, 2, 4, 1, 1),
    ]
    cols = ["wife_age", "wife_edu", "hus_edu", "num_child", "wife_religion",
            "wife_work", "hus_occ", "living", "media", "y"]
    return spark.createDataFrame(rows, cols)


def test_dataset_spec_cmc_shape(cmc_like):
    spec = DatasetSpec(
        binarize={"wife_age": 33},                     # getdataset.py:98-101 pattern
        recodes={"y": {1: 0, 2: 1, 3: 2}},             # label recode
        one_hot={"hus_occ": [1, 2, 3, 4]},
        sensitive=["wife_religion", "wife_work"],
        label="y",
    )
    out = load(cmc_like, spec)
    rows = out.collect()
    assert all(r["wife_age"] in (0, 1) for r in rows)
    assert all(r["y"] in (0, 1, 2) for r in rows)
    assert "hus_occ_1" in out.columns and "hus_occ" not in out.columns


def test_dataset_spec_filter_and_quantile_label(cmc_like):
    spec = DatasetSpec(
        filter_sql="num_child > 0",
        quantile_label=("wife_age", 3),
        drop=["media"],
    )
    out = load(cmc_like, spec)
    assert out.filter(F.col("num_child") <= 0).count() == 0
    assert set(r["y"] for r in out.collect()) <= {0, 1, 2}
    assert "media" not in out.columns


def test_single_pass_recipe_plan(cmc_like):
    """The whole recipe (filter+recode+binarize+one-hot) must compile
    to a scan-side projection: no shuffle exchanges at all."""
    spec = DatasetSpec(
        filter_sql="num_child >= 0",
        binarize={"wife_age": 33},
        recodes={"y": {1: 0, 2: 1, 3: 2}},
        one_hot={"hus_occ": [1, 2, 3, 4]},
    )
    out = load(cmc_like, spec)
    stats = plan_stats(out)
    assert stats["n_exchanges"] == 0
    assert not stats["has_python_udf"]


def test_plan_stats_detects_pushdown(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = df.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    stats = plan_stats(q)
    assert any("l_quantity" in p for p in stats["pushed_filters"])
    assert any("l_orderkey" in s and "l_returnflag" not in s for s in stats["read_schemas"])


def test_assert_no_python_udf_fires(spark):
    from pyspark.sql.functions import udf

    bad = udf(lambda x: x + 1)
    df = spark.range(5).select(bad("id").alias("x"))
    with pytest.raises(AssertionError):
        assert_no_python_udf(df)


def test_engine_hot_paths_have_no_python_udf(query_df):
    """Every SQL-oracled query must stay JVM-side end-to-end."""
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    for name in oracles:
        assert_no_python_udf(query_df(name))


def test_bucketed_join_is_exchange_free(spark):
    """Bucketed layout → co-located join with no shuffle (the write-
    side lever for repeated large joins at scale)."""
    import shutil
    from demv_spark.sources.sinks import is_exchange_free_join, write_bucketed
    from demv_spark.sources.readers import read_table

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 4,
    )
    assert is_exchange_free_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])

    # sanity: same join on the raw (unbucketed) frames needs a shuffle
    from demv_spark.plans.introspect import plan_stats
    raw = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    assert plan_stats(raw)["n_exchanges"] > 0 or plan_stats(raw)["n_broadcasts"] > 0


def test_write_partitioned_prunes(spark, tmp_path):
    from demv_spark.sources.sinks import write_partitioned
    from demv_spark.sources.readers import read_table
    from demv_spark.plans.introspect import explain_str

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["o_orderstatus"])
    back = spark.read.parquet(path).filter("o_orderstatus = 'F'")
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()
    # partition filter appears as such in the scan, not a data filter
    assert "PartitionFilters" in explain_str(back, "formatted")


def test_read_csv_semicolon(spark, tmp_path):
    from demv_spark.sources.readers import read_csv_semicolon

    p = str(tmp_path / "wine.csv")
    with open(p, "w") as f:
        f.write("a;b;c\n1;2.5;x\n3;4.5;y\n")
    df = read_csv_semicolon(spark, p)
    assert df.columns == ["a", "b", "c"]
    assert df.count() == 2
    assert df.filter(F.col("a") == 1).collect()[0]["b"] == 2.5


def test_write_metrics_csv(spark, tmp_path):
    import csv

    from demv_spark.ml.evaluation import write_metrics_csv

    df = spark.createDataFrame([(0, 0.9), (1, 0.8)], ["fold", "acc"])
    p = str(tmp_path / "metrics.csv")
    write_metrics_csv(df, p)
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert {r["fold"]: float(r["acc"]) for r in rows} == {"0": 0.9, "1": 0.8}
