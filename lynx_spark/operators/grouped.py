"""Grouped imperative analytics via applyInPandas.

Demonstrates the third UDF tier (after pandas_udf scalar and
mapInPandas): per-group imperative logic with a whole group in memory.
Used where the DataFrame API could express the semantics only through
layered window tricks (gaps-and-islands) — the DuckDB oracle runs
exactly that SQL formulation, so the two paradigms hash-verify each
other.

Scale notes: applyInPandas shuffles by the grouping key and holds ONE
group per Arrow batch — safe while single-group cardinality is bounded
(events per user here). The groupBy key is the natural partitioner, so
no extra repartition is needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join_cogroup(left: DataFrame, right: DataFrame) -> DataFrame:
    """As-of join via cogrouped applyInPandas + pandas merge_asof:
    for each left event, the most recent right event of the same user
    strictly before it.

    This is the cogroup tier of the pandas API (two DataFrames
    co-partitioned by key, one pandas call per key pair) — the natural
    home for pandas' merge_asof, which Spark has no built-in for. The
    declarative twin (conditional running max, q19) is the oracle.

    left:  user_id, event_id, ts        right: user_id, click_ts
    out:   event_id, user_id, ts, last_click_ts (timestamps stay
    timestamps — string formatting happens Spark-side so rendering
    matches the SQL surface exactly).
    """

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values("ts")
        rpdf = rpdf.sort_values("click_ts")
        merged = pd.merge_asof(
            lpdf,
            rpdf[["click_ts"]],
            left_on="ts",
            right_on="click_ts",
            direction="backward",
            allow_exact_matches=False,  # strictly before, like 1 PRECEDING
        )
        return merged[["event_id", "user_id", "ts", "click_ts"]].rename(
            columns={"click_ts": "last_click_ts"}
        )

    return (
        left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="event_id long, user_id long, ts timestamp, "
            "last_click_ts timestamp",
        )
    )


def longest_event_streaks(df: DataFrame) -> DataFrame:
    """Per user: length of the longest run of consecutive events with
    the same event_type (ordered by ts, event_id), plus the event count.

    Output: user_id long, max_streak long, n_events long.
    """

    def streaks(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        types = pdf["event_type"].to_numpy()
        best = run = 1
        for i in range(1, len(types)):
            run = run + 1 if types[i] == types[i - 1] else 1
            best = max(best, run)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "max_streak": [best],
                "n_events": [len(pdf)],
            }
        )

    return (
        df.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandas(streaks, schema="user_id long, max_streak long, n_events long")
    )
