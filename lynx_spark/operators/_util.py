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
    df: DataFrame,
    id_col: str,
    band_cols: list[str],
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct (a_id, b_id) pairs (a < b) agreeing on at least one
    band — the self-join form used by the dedup operators.

    ``max_bucket`` bounds the quadratic hole of LSH candidate
    generation: a bucket of k near-identical documents yields k²/2
    pairs (10⁶ copies of one boilerplate page → 5·10¹¹ pairs from a
    single bucket). Buckets larger than ``max_bucket`` switch to the
    star pattern — every member pairs with the bucket's minimum id
    only — which keeps the duplicate cluster connected (any member
    reaches any other through the representative) at linear cost.
    There are at most N/max_bucket oversized buckets, so their key
    set broadcasts; the common-case join never shuffles twice."""
    banded = explode_bands(df, id_col, band_cols)
    star = None
    if max_bucket is not None:
        # The oversized-bucket key set is small by construction (at
        # most N/max_bucket buckets exceed the cap), so it travels as
        # a broadcast: the cap costs one map-side-combined aggregate
        # inside the main job — no extra materialization pass. (For a
        # pathological corpus where even N/max_bucket is too large to
        # broadcast, lower the cap or pre-dedup exact copies first —
        # exact dedup is upstream in the curation pipeline anyway.)
        big = (
            banded.groupBy("band_no", "bh")
            .agg(F.count("*").alias("_c"), F.min(id_col).alias("_rep"))
            .filter(F.col("_c") > max_bucket)
            .select("band_no", "bh", "_rep")
        )
        big = F.broadcast(big)
        star = (
            banded.join(big, ["band_no", "bh"])
            .filter(F.col(id_col) > F.col("_rep"))
            .select(F.col("_rep").alias("a_id"), F.col(id_col).alias("b_id"))
        )
        # same broadcast object on both joins -> one exchange, reused
        banded = banded.join(big, ["band_no", "bh"], "left_anti")
    a = banded.select(
        F.col(id_col).alias("a_id"), F.col("band_no"), F.col("bh")
    )
    b = banded.select(
        F.col(id_col).alias("b_id"), F.col("band_no"), F.col("bh")
    )
    pairs = (
        a.join(b, ["band_no", "bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


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
