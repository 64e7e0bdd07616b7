"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming surface at all; this is the stateful
tier of the streaming superset (SURVEY §2B): user-defined per-key state
that survives across micro-batches — the Spark-native way to express
operators that neither tumbling windows nor watermarked aggregations
cover (running counters, session carriers, online sketches).

``running_ingest_counters`` keeps, per (namespace, measurement), the
lifetime write count and the maximum event timestamp seen — the live
ingest telemetry a TSDB operator dashboard wants. State is a single
struct row per key; each micro-batch emits the updated totals
(output mode: update).

Scale notes: state is partitioned by the grouping key across the
cluster and checkpointed to the stream's checkpoint location; the
per-key payload here is constant-size, so state growth is bounded by
key cardinality, not event volume.

Operational gotchas (verified live):
- checkpoint RECOVERY needs a recovery-capable sink (foreachBatch,
  kafka, files) — the memory sink refuses to resume from a checkpoint;
- with foreachBatch the writer must set ``outputMode("update")``
  explicitly; the Append default rejects this operator.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "namespace string, measurement string, n_writes long, max_ts timestamp"
)
STATE_SCHEMA = "n_writes long, max_ts timestamp"


def _update_counters(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_writes, max_ts = state.get
    else:
        n_writes, max_ts = 0, None
    for pdf in pdfs:
        n_writes += len(pdf)
        batch_max = pdf["ts"].max()  # skipna; NaT only if all-null
        # guard: storing NaT would poison max() forever (NaT compares
        # False against everything)
        if not pd.isna(batch_max):
            max_ts = batch_max if max_ts is None or pd.isna(max_ts) else max(
                max_ts, batch_max
            )
    state.update((n_writes, max_ts))
    yield pd.DataFrame(
        {
            "namespace": [key[0]],
            "measurement": [key[1]],
            "n_writes": [n_writes],
            "max_ts": [max_ts],
        }
    )


def running_ingest_counters(parsed: DataFrame) -> DataFrame:
    """Per-(namespace, measurement) lifetime write count + max event
    time, carried across micro-batches in keyed state."""
    return parsed.groupBy("namespace", "measurement").applyInPandasWithState(
        _update_counters,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
