"""Salted aggregation / join correctness: results must equal the plain
(unsalted) equivalents on a deliberately skewed dataset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lynx_spark.operators.skew import salted_agg, salted_broadcast_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0; the rest spread over 50 keys
    hot = spark.range(9000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        (F.col("id") % 50 + 1).alias("k"), (F.col("id") % 31).cast("double").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r["k"]: (r["total"], r["n"], r["vmin"], r["vmax"])
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["total"], r["n"], r["vmin"], r["vmax"])
        for r in salted_agg(skewed, "k", "v").collect()
    }
    assert salted == plain


def test_salted_agg_avg(spark, skewed):
    plain = {r["k"]: r["a"] for r in skewed.groupBy("k").agg(F.avg("v").alias("a")).collect()}
    salted = {r["k"]: r["vavg"] for r in salted_agg(skewed, "k", "v").collect()}
    for k in plain:
        assert abs(salted[k] - plain[k]) < 1e-9


def test_salted_broadcast_join_matches_plain(spark, skewed):
    dim = spark.range(51).select(
        F.col("id").alias("dk"), F.concat(F.lit("name_"), F.col("id")).alias("dname")
    )
    plain = (
        skewed.join(dim, skewed["k"] == dim["dk"])
        .groupBy("k")
        .count()
        .collect()
    )
    plain_counts = {r["k"]: r["count"] for r in plain}
    salted = (
        salted_broadcast_join(skewed, dim, "k", "dk")
        .groupBy("k")
        .count()
        .collect()
    )
    salted_counts = {r["k"]: r["count"] for r in salted}
    assert salted_counts == plain_counts
    # every joined row carries the right dim attribute
    sample = salted_broadcast_join(skewed, dim, "k", "dk").filter(
        F.col("k") == 0
    ).select("dname").distinct().collect()
    assert [r["dname"] for r in sample] == ["name_0"]
