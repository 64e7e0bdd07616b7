"""Parquet table loaders for the driver testdata (TESTDATA.md).

The reference has no file-format connectors at all (SURVEY §2A #1-6:
HTTP JSON in, WAL binary on disk); Spark's parquet/json/csv readers are
a deliberate superset. These loaders are the batch/cold-tier entry for
the analytics surface.

Scale notes:
- scans stay declarative (``spark.read.parquet``) so Catalyst pushes
  filters and prunes columns into the scan — verify with
  ``.explain``'s PushedFilters/ReadSchema;
- ``events.ts`` is parquet TIMESTAMP(NANOS), which the Spark reader
  rejects ([PARQUET_TYPE_ILLEGAL]); we flip the documented escape hatch
  ``spark.sql.legacy.parquet.nanosAsLong`` and convert to a microsecond
  timestamp (``timestamp_micros(ts div 1000)``) — the same floor
  truncation DuckDB applies when casting TIMESTAMP_NS to TIMESTAMP, so
  oracle comparisons line up exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# small dimension tables that should broadcast in every join
BROADCAST_TABLES = {"region", "nation", "supplier", "part"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes events.ts to a microsecond
    timestamp."""
    if name == "events":
        # runtime-settable; required to read TIMESTAMP(NANOS) parquet
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes)["ts"] == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events_between(
    spark: SparkSession,
    sf_dir: str,
    lo: str | None = None,
    hi: str | None = None,
) -> DataFrame:
    """events with a time-range predicate that actually reaches the
    parquet scan. The ``timestamp_micros(ts div 1000)`` conversion in
    load_table blocks pushdown of predicates on the derived ``ts``
    column, so range bounds are applied to the RAW nanosecond long
    BEFORE the conversion — ``.explain`` then shows the bounds in
    PushedFilters. At 100 TB this is the difference between scanning
    a day and scanning the archive (alongside the cold tier's day=
    partition pruning)."""
    from datetime import datetime, timezone

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw_is_long = dict(df.dtypes)["ts"] == "bigint"

    def ns(bound: str) -> int:
        dt = datetime.fromisoformat(bound).replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000) * 1000

    if raw_is_long:
        if lo is not None:
            df = df.filter(F.col("ts") >= ns(lo))
        if hi is not None:
            df = df.filter(F.col("ts") < ns(hi))
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # fallback: engine already reads real timestamps
    if lo is not None:
        df = df.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
    if hi is not None:
        df = df.filter(F.col("ts") < F.lit(hi).cast("timestamp"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (the deliberate
    superset of the reference's one-table-per-query registration,
    SURVEY §7 step 5)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
