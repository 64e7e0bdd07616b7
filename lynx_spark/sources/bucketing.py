"""Bucketed (pre-shuffled) tables: co-located fact-fact joins.

At 100 TB the dominant cost of a lineitem ⋈ orders style join is
shuffling both facts on the join key for every query. Bucketing pays
that shuffle ONCE at write time: both tables are hash-partitioned into
the same number of buckets on the join key and sorted within buckets,
so Catalyst plans a SortMergeJoin with NO Exchange on either side —
each task zips bucket i with bucket i.

This is the Spark-native answer to a workload the reference cannot
express at all (multi-table joins are unreachable there — only the
first FROM table is registered, SURVEY §2B). Kept out of the default
query path because bucketed tables are a materialized layout choice;
`bucketize()` is the one-time ETL, `bucketed_join()` the beneficiary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
) -> None:
    """One-time ETL: write df as a bucketed+sorted managed table.
    The shuffle happens here, once, instead of in every later join."""
    (
        df.write.bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With aligned
    bucket counts Catalyst emits SortMergeJoin WITHOUT Exchange.

    The merge hint pins the 100 TB-regime plan: on toy data the
    planner would rather broadcast the small side (and note
    'Bucketed: false — disabled by query planner'), which is correct
    locally but hides the property this layout exists for.

    Join keys are qualified per side, so tables bucketed on the SAME
    column name join without an ambiguous-reference error."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])


def plan_has_no_join_exchange(df: DataFrame) -> bool:
    """True when the physical plan's join reads bucketed scans directly
    (no Exchange feeding the SortMergeJoin) — the property bucketing
    buys. Used by tests; handy for .explain spot checks."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE wraps the plan; look at the final plan string: an Exchange
    # anywhere under the join means the co-location was lost
    return "Exchange" not in plan
