"""SparkSession factory tuned for the lynx_spark engine.

One long-lived session per process (the reference holds one DataFusion
``SessionContext`` for the engine's lifetime, ``src/lynx.rs:38,55``).

The configs below are the 100 TB-minded defaults: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for the
Python<->JVM boundary, UTC session time so timestamp semantics match the
reference's UTC-everywhere model (``src/buffer.rs:22-28``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "lynx_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- correctness-critical ---
        # The reference's timestamps are microseconds-since-epoch UTC
        # (wal.rs:24, buffer.rs:22-28); pin the session to UTC so
        # date_trunc/to_date agree with its daily PartitionKey.
        .config("spark.sql.session.timeZone", "UTC")
        # --- Python<->JVM boundary ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # --- scale-minded planning ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # 128 MiB scan splits — the parquet-side default that holds at
        # 100 TB; AQE coalesces the small local case back down.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # broadcast threshold: dims (region/nation/supplier/part at any
        # SF ratio) should broadcast rather than shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # bucketed tables (sources/bucketing.py) land here, not in cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/lynx_spark_warehouse"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
