"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    input arrives under-partitioned (e.g. one small parquet file).

    Operators that EXPAND data per row (shingle explode, hyperplane
    folds, signature hashing) do their heavy work in the stage that
    reads the input; if that stage has one partition the whole cluster
    waits on one core. Repartitioning the small pre-expansion input is
    cheap; at 100 TB inputs arrive well-partitioned and this is a
    no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
