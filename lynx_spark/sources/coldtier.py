"""Tiered storage: hot in-memory buffer + cold date-partitioned parquet.

The reference keeps everything in memory forever and rebuilds the full
Arrow table per query (src/lynx.rs:86-139); its daily partitions
(buffer.rs:8-11) are never used for pruning. This module is the
deliberate 100 TB superset (SURVEY §7 step 6):

- ``flush(namespace)`` drains the namespace's buffer into parquet laid
  out as ``<cold>/<namespace>/<table>/day=YYYY-MM-DD/``, so lynx's
  partition key becomes a REAL partition column Catalyst prunes
  (PartitionFilters) — what the reference's partitions never did;
- after a flush the WAL is rotated and fully-flushed segments are
  deleted (the reference never truncates, wal.rs:175 keeps ids only);
  replay after restart only sees post-flush segments, so nothing is
  double counted;
- ``query()`` serves the union of the hot snapshot and the cold tier
  (``unionByName(allowMissingColumns=True)`` absorbs tag-schema drift
  between flushes; the cold read uses ``mergeSchema`` for the same
  reason).

Durability invariant preserved from the reference (lynx.rs:31-33):
rows are either in a WAL segment on disk or in the cold parquet —
never only in memory. flush orders: write parquet -> clear buffer ->
delete old segments.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lynx_spark.buffer import Measurements
from lynx_spark.engine import LynxEngine, measurements_to_arrow, select_days
from lynx_spark.sqlutil import parse_table_name
from lynx_spark.wal import DEFAULT_MAX_SEGMENT_SIZE, read_segment


class TieredEngine(LynxEngine):
    """LynxEngine + cold parquet tier."""

    def __init__(
        self,
        spark: SparkSession,
        wal_dir: str | Path,
        cold_dir: str | Path,
        max_segment_size: int = DEFAULT_MAX_SEGMENT_SIZE,
    ) -> None:
        super().__init__(spark, wal_dir, max_segment_size)
        self.cold_dir = Path(cold_dir)
        self.cold_dir.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------ flush

    def flush(self, namespace: str) -> int:
        """Drain one namespace's hot buffer into the cold tier; returns
        rows flushed. Afterwards the WAL is compacted: flushed records
        are dropped and survivors (other namespaces) are rewritten, so
        a restart replays exactly the unflushed rows — never a
        duplicate of what parquet already holds. (WAL truncation is
        absent in the reference, wal.rs:175.)

        Ordering under the write lock (writers are blocked throughout,
        engine.py write()):
          1. snapshot the namespace (buffer untouched)
          2. STAGE every partition as a .tmp file (invisible to
             readers), then COMMIT them all by rename — a failure
             while staging leaves only .tmp litter: buffer and WAL are
             intact, no cold row becomes visible, a retry overwrites
             the stale .tmp files
          3. clear the namespace from the buffer
          4. rewrite the WAL without the flushed namespace's records
        A crash BETWEEN the renames of step 2 (process death mid-loop)
        can commit a prefix of the partitions and duplicate them on
        retry — closing that window needs a manifest/commit log, noted
        as future work; every single-fault path short of that is safe.
        """
        with self._wal_lock:
            tables = self.buffer.tables(namespace)  # snapshot, not pop
            if tables is None:
                return 0
            rows = 0
            staged: list[tuple[Path, Path]] = []
            for table, partitions in tables.items():
                for day in sorted(partitions):
                    n, tmp, final = self._stage_partition(
                        namespace, table, day, partitions[day]
                    )
                    rows += n
                    staged.append((tmp, final))
            for tmp, final in staged:  # commit phase: cheap renames
                tmp.rename(final)
            self.buffer.clear_namespace(namespace)
            self._compact_wal(drop_namespace=namespace)
            return rows

    def _compact_wal(self, drop_namespace: str) -> None:
        """Rewrite the WAL without records of the flushed namespace.
        Called under _wal_lock. Survivor records (still hot in the
        buffer) are appended to the fresh active segment; old segments
        are deleted only after the rewrite."""
        self.wal.rotate()  # close the active segment too
        old_ids = list(self.wal.closed_segments)
        # stream survivors into the fresh active segment in original
        # order, then drop the old segment files
        for seg_id in old_ids:
            seg_path = self.wal.directory / f"{seg_id}.wal"
            if not seg_path.exists():
                continue
            for req in read_segment(seg_path):
                if req.namespace != drop_namespace:
                    self.wal.write(req)
            seg_path.unlink()
        self.wal.closed_segments = [
            s for s in self.wal.closed_segments if s not in old_ids
        ]

    def _stage_partition(
        self, namespace: str, table: str, day: str, m: Measurements
    ) -> tuple[int, Path, Path]:
        """Write one day's rows to a .tmp file under the hive-style
        ``day=`` directory (pyarrow writer: driver-side, no Spark job —
        the hot slice is small by design; executors read it back).
        Returns (rows, tmp_path, final_path); the caller renames after
        ALL partitions staged successfully."""
        batch = measurements_to_arrow([m])
        out_dir = self.cold_dir / namespace / table / f"day={day}"
        out_dir.mkdir(parents=True, exist_ok=True)
        n_existing = len(list(out_dir.glob("*.parquet")))
        tmp = out_dir / f".tmp-part-{n_existing:05d}"
        pq.write_table(batch, tmp)  # overwrites stale .tmp from a retry
        return batch.num_rows, tmp, out_dir / f"part-{n_existing:05d}.parquet"

    # ------------------------------------------------------------ query

    def _cold_table(self, namespace: str, table: str) -> DataFrame | None:
        path = self.cold_dir / namespace / table
        # a directory with no parquet files (e.g. an aborted flush's
        # empty day= dir) is "no cold data", not a read error
        if not path.exists() or not any(path.rglob("*.parquet")):
            return None
        return self.spark.read.option("mergeSchema", "true").parquet(str(path))

    def query(self, namespace: str, sql: str) -> DataFrame | None:
        """Union of hot snapshot and cold tier. Unknown namespace/table
        in BOTH tiers -> None (404), preserving main.rs:83 semantics.

        The hot snapshot and the cold file listing are taken under the
        SAME lock a flush holds: without it, a flush racing between the
        two reads would surface its rows in both tiers (double count).
        ``spark.read.parquet`` lists files eagerly, so the DataFrame is
        pinned to the files visible at lock time; flush never deletes
        parquet, so execution later is safe."""
        table_name = parse_table_name(sql)
        with self._wal_lock:
            tables = self.buffer.tables(namespace)
            hot = None
            if tables is not None and table_name in tables:
                partitions = tables[table_name]
                batch = measurements_to_arrow(
                    [partitions[day] for day in select_days(partitions, sql)]
                )
                # day as DATE to line up with the inferred type of the
                # cold tier's hive partition column
                hot = self.spark.createDataFrame(batch).withColumn(
                    "day", F.to_date("timestamp")
                )
            cold = self._cold_table(namespace, table_name)
        if hot is None and cold is None:
            return None  # unknown in both tiers -> 404 (main.rs:83)
        if hot is None:
            df = cold
        elif cold is None:
            df = hot
        else:
            df = cold.unionByName(hot, allowMissingColumns=True)
        with self._query_lock:
            df.createOrReplaceTempView(table_name)
            return self.spark.sql(sql)
