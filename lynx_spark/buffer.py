"""Hierarchical in-memory buffer: namespace -> table -> daily partition.

Re-creates the reference's ``MemBuffer`` (``src/buffer.rs``):

- the store is a 3-level sorted mapping ending in columnar vectors
  (``BTreeMap<Namespace, BTreeMap<Table, BTreeMap<PartitionKey,
  Measurements>>>``, buffer.rs:38-42);
- partitioning is by day (UTC), fixed and non-configurable
  (buffer.rs:8-11); the key is ``"%Y-%m-%d"`` (buffer.rs:11,22-28);
- ``Measurements`` is structure-of-arrays: parallel ``timestamps``,
  ``metadata``, ``values`` vectors (lynx.rs:21-26), appended one element
  each per insert (buffer.rs:96-99);
- reads take a point-in-time snapshot: a deep copy of the namespace's
  subtree under the lock (buffer.rs:109-115).

At lynx scale the deep-copy snapshot is cheap; at 100 TB the hot buffer
only ever holds the most recent unflushed slice (see sources/coldtier),
so the copy stays bounded — the big data lives in date-partitioned
parquet where Catalyst prunes it.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from lynx_spark.model import TagValue, WriteRequest

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)

# chrono's DateTime::from_timestamp_micros accepts roughly
# +/- 262,000 years; out-of-range panics (buffer.rs:24-25). We enforce
# datetime's own range and raise, matching "invalid timestamp" behavior.


#: day-number -> "%Y-%m-%d" memo. strftime was the write path's
#: hottest single call (34% of buffer.insert in the w0 profile);
#: ingest timestamps cluster on a handful of days, so the formatted
#: string is computed once per distinct UTC day. Floor division
#: matches the UTC day boundary for negative timestamps too
#: (-1 µs // day = day -1, i.e. 1969-12-31 — same as the datetime
#: arithmetic it replaces).
_DAY_US = 86_400_000_000
_DAY_KEYS: dict[int, str] = {}


def partition_key(timestamp_us: int) -> str:
    """Microseconds since epoch -> "%Y-%m-%d" UTC day key
    (buffer.rs:8-28). Raises ValueError when out of range (the
    reference panics, buffer.rs:24-25)."""
    day = timestamp_us // _DAY_US
    key = _DAY_KEYS.get(day)
    if key is None:
        try:
            dt = _EPOCH + timedelta(days=day)
        except OverflowError as e:
            raise ValueError(
                f"invalid timestamp (out of range): {timestamp_us}"
            ) from e
        key = dt.strftime("%Y-%m-%d")
        _DAY_KEYS[day] = key
    return key


@dataclass
class Measurements:
    """Columnar (structure-of-arrays) storage for one daily partition
    (lynx.rs:21-26)."""

    timestamps: list[int] = field(default_factory=list)
    metadata: list[dict[str, TagValue]] = field(default_factory=list)
    values: list[str] = field(default_factory=list)

    def append(self, req: WriteRequest) -> None:
        self.timestamps.append(req.timestamp)
        self.metadata.append(req.metadata)
        self.values.append(req.value)

    def __len__(self) -> int:
        return len(self.timestamps)

    def copy(self) -> "Measurements":
        return Measurements(
            timestamps=list(self.timestamps),
            metadata=[dict(m) for m in self.metadata],
            values=list(self.values),
        )


# namespace -> table -> day-key -> Measurements
Tables = dict[str, dict[str, Measurements]]


class MemBuffer:
    """Thread-safe hierarchical buffer (buffer.rs:38-42). Plain dicts +
    sorted() at iteration time stand in for BTreeMap's sorted order."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._store: dict[str, Tables] = {}
        # O(1) per-namespace hot-row counter, maintained by insert /
        # clear_namespace — the TieredEngine's auto-flush watermark
        # reads it on every write, so it must never walk the tree
        self._rows: dict[str, int] = {}
        # namespace -> monotonic time of its oldest unflushed insert
        self._first_insert: dict[str, float] = {}

    def insert(self, req: WriteRequest) -> None:
        """3-level upsert then columnar append (buffer.rs:51-107)."""
        key = partition_key(req.timestamp)
        with self._lock:
            tables = self._store.setdefault(req.namespace, {})
            partitions = tables.setdefault(req.measurement, {})
            partitions.setdefault(key, Measurements()).append(req)
            self._rows[req.namespace] = self._rows.get(req.namespace, 0) + 1
            # wall-clock of the namespace's OLDEST unflushed row —
            # the age-watermark trigger reads it; reset by
            # clear_namespace so each flush epoch starts fresh
            self._first_insert.setdefault(req.namespace, time.monotonic())

    def row_count(self, namespace: str) -> int:
        """Hot rows currently buffered for one namespace (0 if absent)."""
        with self._lock:
            return self._rows.get(namespace, 0)

    def namespaces(self) -> list[str]:
        with self._lock:
            return sorted(self._store)

    def oldest_insert_age(self, namespace: str) -> float | None:
        """Seconds since the namespace's oldest unflushed insert
        (None if nothing buffered)."""
        with self._lock:
            t0 = self._first_insert.get(namespace)
            return None if t0 is None else time.monotonic() - t0

    def tables(self, namespace: str) -> Tables | None:
        """Point-in-time snapshot of one namespace: deep copy under the
        lock (buffer.rs:109-115). None for an unknown namespace — the
        caller turns that into HTTP 404 (main.rs:83)."""
        with self._lock:
            tables = self._store.get(namespace)
            if tables is None:
                return None
            return {
                tbl: {day: m.copy() for day, m in parts.items()}
                for tbl, parts in tables.items()
            }

    # --- introspection used by tests (mirrors buffer.rs test helpers) ---

    def namespace_count(self) -> int:
        with self._lock:
            return len(self._store)

    def table_count(self, namespace: str) -> int:
        with self._lock:
            return len(self._store.get(namespace, {}))

    def partition_count(self, namespace: str, table: str) -> int:
        with self._lock:
            return len(self._store.get(namespace, {}).get(table, {}))

    def clear_namespace(self, namespace: str) -> Tables | None:
        """Remove and return a namespace's tables (used by the cold-tier
        flush; no reference equivalent — lynx never evicts)."""
        with self._lock:
            self._rows.pop(namespace, None)
            self._first_insert.pop(namespace, None)
            return self._store.pop(namespace, None)
