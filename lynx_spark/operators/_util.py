"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_bands(df: DataFrame, id_col: str, band_cols: list[str]) -> DataFrame:
    """(id, band_no, bh) rows from one row per id with N band/bucket
    columns — the shared candidate-generation shape for every LSH
    operator (MinHash bands, hyperplane buckets): candidates then meet
    by equality on the composite (band_no, bh) key, one join instead
    of one join per band."""
    bands = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("band_no"), F.col(c).alias("bh"))
                for i, c in enumerate(band_cols)
            ]
        )
    ).alias("bb")
    return df.select(F.col(id_col).alias("_id"), bands).select(
        F.col("_id").alias(id_col), "bb.band_no", "bb.bh"
    )


def banded_self_pairs(
    df: DataFrame, id_col: str, band_cols: list[str]
) -> DataFrame:
    """Distinct (a_id, b_id) pairs (a < b) agreeing on at least one
    band — the self-join form used by the dedup operators."""
    banded = explode_bands(df, id_col, band_cols)
    a = banded.select(
        F.col(id_col).alias("a_id"), F.col("band_no"), F.col("bh")
    )
    b = banded.select(
        F.col(id_col).alias("b_id"), F.col("band_no"), F.col("bh")
    )
    return (
        a.join(b, ["band_no", "bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


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
