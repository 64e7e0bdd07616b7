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
