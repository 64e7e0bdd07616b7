"""Bucketed co-located join: the write-once-shuffle-never pattern.
Verifies the physical plan contains no Exchange under the join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lynx_spark.sources.bucketing import (
    bucketed_join,
    bucketize,
    plan_has_no_join_exchange,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    bucketize(li, "li_bucketed", "l_orderkey", 8)
    bucketize(orders, "orders_bucketed", "o_orderkey", 8)
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "l_orderkey", "o_orderkey")
    joined.collect()  # force AQE to finalize the plan
    assert plan_has_no_join_exchange(joined), (
        "bucketed join must not shuffle:\n"
        + joined._jdf.queryExecution().executedPlan().toString()[:2000]
    )


def test_bucketed_join_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "l_orderkey", "o_orderkey")
    n_bucketed = joined.count()
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    n_plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert n_bucketed == n_plain


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join over plain parquet shuffles (otherwise
    the no-Exchange assertion above proves nothing)."""
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    joined = li.join(
        orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
