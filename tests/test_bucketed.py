"""Bucketed co-located joins: the write-once-shuffle-never strategy.

Pins the property that matters at 100 TB: joining two tables bucketed
on the join key with equal bucket counts produces a plan with NO
Exchange (shuffle) operator — the join runs entirely on the write-time
layout.
"""

import pytest
from pyspark.sql import functions as F

from ftm_lakehouse_spark.sources.bucketed import bucketed_join, write_bucketed
from ftm_lakehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # forbid broadcast so the co-location property itself is what's
    # tested (broadcast would also avoid a shuffle, trivially)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    plain = (
        load_table(spark, SF, "orders")
        .select("o_orderkey")
        .join(
            load_table(spark, SF, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .count()
    )
    assert (
        bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey").count()
        == plain
    )


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key also reuses the write-time layout."""
    agg = (
        spark.table("t_lineitem_b")
        .groupBy("o_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,4)")).alias("q"))
    )
    assert "Exchange" not in _plan(agg)
