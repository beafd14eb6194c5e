"""Co-located join via bucketing: the write-once-shuffle-never contract.

The value assertion (join result == unbucketed join) and the plan
assertion (NO Exchange anywhere in the bucketed join) together prove the
bucket layout is both correct and actually used by the planner.
"""

import pytest
from pyspark.sql import functions as F

from ha_sqllite_2_influxdb_spark.sources.bucketed import (
    read_bucketed, write_bucketed,
)
from ha_sqllite_2_influxdb_spark.sources.tables import load_table
from tests.test_plans import explain_str


@pytest.fixture
def bucketed_pair(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    write_bucketed(li, "b_lineitem", str(tmp_path / "li"), "l_orderkey", 8)
    write_bucketed(orders, "b_orders", str(tmp_path / "ord"), "l_orderkey", 8)
    yield li, orders
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_pair):
    # merge hint: at fixture scale AQE would broadcast the tiny side; the
    # scenario bucketing exists for is two tables too big to broadcast
    j = read_bucketed(spark, "b_lineitem").join(
        read_bucketed(spark, "b_orders").hint("merge"), "l_orderkey"
    )
    j.collect()
    final = explain_str(j).split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final
    assert "SortMergeJoin" in final, final


def test_bucketed_agg_has_no_exchange(spark, sf_dir, bucketed_pair):
    agg = (
        read_bucketed(spark, "b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    agg.collect()
    final = explain_str(agg).split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    li, orders = bucketed_pair
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucketed = (
        read_bucketed(spark, "b_lineitem")
        .join(read_bucketed(spark, "b_orders"), "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, bucketed.collect()))


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Date-partitioned layout + a date filter → the scan's PartitionFilters
    prune whole directories; only matching partitions are listed/read."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "orders_by_month")
    orders.write.partitionBy("order_month").mode("overwrite").parquet(path)

    df = spark.read.parquet(path).filter(F.col("order_month") == "1996-03")
    plan = explain_str(df)
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "order_month" in pf, plan
    # pruning must be semantically lossless
    expected = orders.filter(F.col("order_month") == "1996-03").count()
    assert df.count() == expected and expected > 0
