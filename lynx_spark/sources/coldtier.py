"""Tiered storage: hot in-memory buffer + cold date-partitioned parquet.

The reference keeps everything in memory forever and rebuilds the full
Arrow table per query (src/lynx.rs:86-139); its daily partitions
(buffer.rs:8-11) are never used for pruning. This module is the
deliberate 100 TB superset (SURVEY §7 step 6):

- ``flush(namespace)`` drains the namespace's buffer into parquet laid
  out as ``<cold>/<namespace>/<table>/day=YYYY-MM-DD/``, so lynx's
  partition key becomes a REAL partition column Catalyst prunes
  (PartitionFilters) — what the reference's partitions never did;
- ``auto_flush_rows=N`` / ``auto_flush_age_s=T`` arm per-namespace
  watermarks: when a namespace's hot-row count crosses N, or its
  oldest unflushed row has waited T seconds (the trickle-rate case —
  a slow namespace must not pin WAL segments against compaction
  forever), a background thread runs the same ``flush()`` (same
  commit log, same WAL truncation, same exactly-once guarantees —
  flush serializes on the write lock), so driver memory and WAL
  retention stay bounded under any ingest shape with no
  /api/v1/flush caller;
- ``auto_optimize_files=K`` (r13, VERDICT r12 task 2) is the
  symmetric DATA-file watermark: every flush checks whether any
  (table, day) partition of the namespace now holds ≥ K visible
  files, and if so schedules a background ``optimize()`` through the
  same one-in-flight-per-namespace scheduler — without it the age
  watermark's trickle flushes accumulate unbounded small parquet
  files between manual /api/v1/optimize calls, degrading every
  cold-tier scan (the commit LOG already self-compacts; this bounds
  the data files the same way). The pack groups by day partition
  regardless of writer, so a namespace receiving BOTH flushes and
  stream batches has its streaming files bounded too; a PURELY
  streaming namespace (zero flushes) has no trigger — rewrites need
  single-writer exclusion (two concurrent packs replacing the same
  files would double data), which only the engine's write lock
  provides, so such namespaces pack via /api/v1/optimize on the
  engine that owns the directory. Tombstone deletion stays manual
  (``vacuum`` is a retention decision — an in-flight query may still
  hold replaced files);
- after a flush the WAL is compacted: the flushed namespace's records
  are dropped segment-by-segment (each rewrite is an atomic rename),
  so replay after restart only restores unflushed rows;
- ``query()`` serves the union of the hot snapshot and the cold tier
  (``unionByName(allowMissingColumns=True)`` absorbs tag-schema drift
  between flushes; the cold read uses ``mergeSchema`` for the same
  reason). The cold scan is pruned to the WHERE clause's day range
  (extract_time_bounds), so timestamp predicates reach the hive
  partitions without exposing any extra column.

Exactly-once commit protocol (the commit log closes every crash
window the round-1 two-phase rename left open):

- Visibility of a cold parquet file = membership in a commit file
  under ``<cold>/_commits/``. Data files are written/renamed FIRST and
  are invisible until the single commit JSON is atomically renamed
  into place — the rename is the one commit point. A crash anywhere
  before it leaves only invisible orphans (garbage-collected at the
  next flush); a crash anywhere after it is recovered from the commit.
- Each flush commit records a per-namespace WAL watermark: the id of
  the fresh active segment after the pre-flush rotate. Because flush
  holds the write lock, every record of the namespace sits in segments
  below the watermark, and replay skips exactly those — a crash
  between commit and WAL compaction can no longer double-count
  (the restored buffer never re-holds flushed rows).
- Compaction rewrites each closed segment in place (survivors ->
  ``<id>.wal.compact`` -> atomic rename over ``<id>.wal``; empty ->
  unlink), so a crash mid-compaction leaves every segment either
  original (flushed records skipped via the watermark) or compacted —
  survivor records are never duplicated.

The streaming sink (streaming/ingest.py) writes the same commit log
with batch-id-keyed entries, giving it exactly-once semantics through
the identical mechanism.

Schema parity: by default the registered view has the reference's
schema [timestamp, value, *tags] — the hive ``day`` column stays
internal (pruning still happens via timestamp bounds). Construct with
``expose_day=True`` to surface it for explicit ``WHERE day = ...``
queries (a flagged superset; reserved names ``_commits``/``_staging``
cannot be namespaces then).
"""

from __future__ import annotations

import itertools
import json
import os
import re
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lynx_spark.buffer import Measurements, partition_key
from lynx_spark.engine import LynxEngine, measurements_to_arrow, select_days
from lynx_spark.sqlutil import (
    extract_time_bounds,
    parse_table_name,
    referenced_tables,
)
from lynx_spark.wal import (
    DEFAULT_MAX_SEGMENT_SIZE,
    WAL_HEADER,
    encode_write_request,
    read_segment,
)

COMMITS_DIR = "_commits"
RESERVED_DIRS = frozenset({COMMITS_DIR, "_staging"})

#: per-process sequence for writer-unique snapshot filenames
_FOLD_SEQ = itertools.count()


def atomic_write_json(path: Path, payload: dict) -> None:
    """Write JSON durably: tmp file, fsync, atomic rename. The rename
    is the commit point for everything that references ``path``."""
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.parent / (path.name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


#: file names only commit-log-era writers produce — never legacy data.
#: part-flushNNNNNN-NNNNN is the engine's flush naming (introduced WITH
#: the commit log); part-mNNNNNN-NNNNN was the earliest commit-log
#: revision's flush naming (still engine-owned and never-visible, the
#: same files _gc_flush_orphans sweeps); part-<sink>-<9-digit
#: batch>-NNNNN is the streaming sink's. Excluding all three from
#: adoption means an in-flight or crash-torn (uncommitted, invisible)
#: flush/batch racing an adoption retry can never be made visible
#: early (r3 review: the part-m form was missing, so a pre-rename
#: crash orphan could have been adopted).
_COMMIT_ERA_FILE = re.compile(
    r"part-flush\d{6}-\d{5}\.parquet$"
    r"|part-m\d{6}-\d{5}\.parquet$"
    r"|part-opt\d{6}-\d{5}\.parquet$"
    r"|part-.+-\d{9}-\d{5}\.parquet$"
)


def adopt_legacy_layout(cold_dir: Path) -> None:
    """Adopt a cold directory written before the commit log existed:
    if there is parquet but no commit files at all, register every
    present pre-commit-log data file in one bootstrap commit so
    previously queryable rows stay visible after the upgrade (no
    watermarks — the old flush compacted the WAL synchronously, so
    those rows are not in it). Called by BOTH the engine and the
    streaming sink before they create the marker — whichever touches
    the directory first must not orphan the legacy data for the other.

    ADVICE r2: a bare ``_commits/`` directory is NOT proof of adoption
    — atomic_write_json mkdirs it before the bootstrap commit's
    rename, so a crash in that window leaves the marker without the
    commit. Adoption is therefore retried whenever no ``*.json``
    commit exists yet; commit-log-era file names (which are invisible
    precisely because no commit lists them) are excluded so the retry
    cannot adopt another writer's uncommitted in-flight files."""
    cold_dir = Path(cold_dir)
    cdir = cold_dir / COMMITS_DIR
    if cdir.exists() and any(cdir.glob("*.json")):
        return
    legacy = [
        str(p.relative_to(cold_dir))
        for p in sorted(cold_dir.rglob("*.parquet"))
        if p.relative_to(cold_dir).parts[0] not in RESERVED_DIRS
        and not _COMMIT_ERA_FILE.search(p.name)
    ]
    if legacy:
        atomic_write_json(
            cdir / "legacy-000000.json",
            {"files": legacy, "watermarks": {}},
        )


def committed_stream_batch(
    cold_dir: Path, sink_id: str, batch_id: int
) -> bool:
    """Has this (sink, batch) already committed? True when its commit
    file exists OR a snapshot has folded it (snapshots record each
    sink's max committed batch id; micro-batches commit in order, so
    max implies all-below). The streaming sink's replay-skip check.

    A snapshot read can race a concurrent snapshot replacement (listed
    file unlinked before read): answering False then would re-execute
    a committed batch and unlink VISIBLE files, so a vanished-file
    read retries the whole check. ADVICE r2: if retries exhaust
    without a clean listing, this RAISES rather than answering False —
    a wrong False makes write_batch unlink visible committed files,
    while an exception just makes foreachBatch retry the micro-batch
    with every committed file intact."""
    cdir = Path(cold_dir) / COMMITS_DIR
    for _ in range(10):
        if (cdir / f"{sink_id}-{batch_id:09d}.json").exists():
            return True
        if not cdir.exists():
            return False
        retry = False
        for p in cdir.glob("snapshot-*.json"):
            try:
                snap = json.loads(p.read_text())
            except FileNotFoundError:
                retry = True  # folded away mid-check; re-list
                break
            except (OSError, json.JSONDecodeError):
                continue
            if snap.get("stream_batches", {}).get(sink_id, -1) >= batch_id:
                return True
        if not retry:
            return False
    raise RuntimeError(
        f"commit-log snapshot listing unstable after 10 retries for "
        f"({sink_id}, batch {batch_id}); refusing to answer 'not "
        f"committed' — retry the micro-batch"
    )


def compact_commits(
    cold_dir: Path,
    threshold: int,
    cache: dict[str, dict] | None = None,
) -> None:
    """Fold accumulated commits into one snapshot so the per-query
    commit listing stays O(1) across thousands of flushes AND
    long-lived streaming sinks (both the engine's flush and the sink's
    write_batch call this). Stream commits fold too: the snapshot
    records each sink's max committed batch id (micro-batches commit
    in order, so max means all-below), and the sink's replay-skip
    check consults it alongside the file existence check.

    Safe against concurrent readers AND concurrent folds: the snapshot
    is renamed in before anything is unlinked, every reader unions
    whatever set of files it lists (snapshot ⊇ merged), a commit file
    another fold already consumed is skipped (its contents live in
    that fold's snapshot, which this fold did not list and therefore
    does not delete), and unlinks tolerate already-gone files."""
    cdir = Path(cold_dir) / COMMITS_DIR
    if not cdir.exists():
        return
    mergeable = list(cdir.glob("*.json"))
    if len(mergeable) < threshold:
        return
    files: set[str] = set()
    replaced: set[str] = set()
    watermarks: dict[str, int] = {}
    flush_ids: dict[str, int] = {}
    opt_ids: dict[str, int] = {}
    stream_batches: dict[str, int] = {}
    snap_id = 0
    merged: list[Path] = []
    for p in sorted(mergeable):
        commit = (cache or {}).get(p.name)
        if commit is None:
            try:
                commit = json.loads(p.read_text())
            except (OSError, json.JSONDecodeError):
                continue  # consumed by a concurrent fold; skip
        merged.append(p)
        files.update(commit.get("files", []))
        replaced.update(commit.get("replaced", []))
        for ns, oid in commit.get("opt_ids", {}).items():
            opt_ids[ns] = max(opt_ids.get(ns, 0), oid)
        for ns, seg in commit.get("watermarks", {}).items():
            watermarks[ns] = max(watermarks.get(ns, -1), seg)
        for ns, fid in commit.get("flush_ids", {}).items():
            flush_ids[ns] = max(flush_ids.get(ns, 0), fid)
        for sid, bid in commit.get("stream_batches", {}).items():
            stream_batches[sid] = max(stream_batches.get(sid, -1), bid)
        name = p.name.removesuffix(".json")
        tail = name.rsplit("-", 1)[-1]
        if name.startswith("flush-"):
            ns = name[len("flush-") : -(len(tail) + 1)]
            if tail.isdigit():
                flush_ids[ns] = max(flush_ids.get(ns, 0), int(tail))
        elif name.startswith("optimize-"):
            ns = name[len("optimize-") : -(len(tail) + 1)]
            if tail.isdigit():
                opt_ids[ns] = max(opt_ids.get(ns, 0), int(tail))
        elif name.startswith("snapshot-"):
            sid_part = name.split("-")[1] if "-" in name else ""
            if sid_part.isdigit():
                snap_id = max(snap_id, int(sid_part))
        elif not name.startswith("legacy"):  # a stream batch commit
            sid = name[: -(len(tail) + 1)]
            if tail.isdigit() and sid:
                stream_batches[sid] = max(
                    stream_batches.get(sid, -1), int(tail)
                )
    if not merged:
        return
    # writer-unique filename: two uncoordinated folds (engine flush +
    # streaming sink are separate threads/processes) must never
    # REPLACE each other's snapshot — a replaced snapshot whose source
    # commits were already unlinked would lose visibility. Unique
    # names make concurrent snapshots additive; the next fold merges
    # them into one.
    snap = cdir / (
        f"snapshot-{snap_id + 1:06d}-p{os.getpid()}-{next(_FOLD_SEQ)}.json"
    )
    # fold the rewrite subtraction eagerly (visible = files − replaced;
    # a replaced name is never re-added, so subtracting early is safe)
    # but KEEP the replaced names: vacuum needs them to find deletable
    # physical files, and un-folded optimize commits must keep
    # subtracting against older snapshots' file lists
    atomic_write_json(
        snap,
        {
            "files": sorted(files - replaced),
            "replaced": sorted(replaced),
            "watermarks": watermarks,
            "flush_ids": flush_ids,
            "opt_ids": opt_ids,
            "stream_batches": stream_batches,
        },
    )
    if cache is not None:
        cache[snap.name] = json.loads(snap.read_text())
    for p in merged:
        if p.name != snap.name:
            p.unlink(missing_ok=True)
            if cache is not None:
                cache.pop(p.name, None)


class TieredEngine(LynxEngine):
    """LynxEngine + cold parquet tier with an exactly-once commit log."""

    def __init__(
        self,
        spark: SparkSession,
        wal_dir: str | Path,
        cold_dir: str | Path,
        max_segment_size: int = DEFAULT_MAX_SEGMENT_SIZE,
        expose_day: bool = False,
        multi_table: bool = False,
        auto_flush_rows: int | None = None,
        auto_flush_age_s: float | None = None,
        auto_optimize_files: int | None = None,
    ) -> None:
        import threading

        # set before super().__init__: replay consults the commit log
        self.cold_dir = Path(cold_dir)
        self.cold_dir.mkdir(parents=True, exist_ok=True)
        self.expose_day = expose_day
        self._commit_cache: dict[str, dict] = {}
        adopt_legacy_layout(self.cold_dir)
        # the directory's existence marks "managed by a commit-log
        # writer": created eagerly so a crash before the FIRST commit
        # leaves the marker, and its orphan files are never mistaken
        # for adoptable legacy data on restart
        (self.cold_dir / COMMITS_DIR).mkdir(exist_ok=True)
        # auto-flush watermark (VERDICT r11 task 5): without it the
        # hot buffer grows unboundedly in driver memory until an
        # operator calls /api/v1/flush — the last driver-side
        # bottleneck in the 100 TB ingest posture. When a namespace's
        # hot-row count crosses the watermark, a background flush
        # fires through the SAME flush()/commit/WAL-truncation path
        # the HTTP route uses (exactly-once guarantees unchanged —
        # flush serializes against writes and queries on _wal_lock).
        # ADVICE r12: normalize falsy/non-positive watermarks to None
        # here rather than in every caller — an explicit
        # ``--auto-flush-rows 0`` used to pass 0 through, making
        # ``row_count >= 0`` always true (a flush thread per write);
        # an explicit ``--auto-flush-age-s 0`` armed a 0.5 s ticker.
        # "0/unset disables" now holds on every construction path.
        if auto_flush_rows is not None and auto_flush_rows <= 0:
            auto_flush_rows = None
        if auto_flush_age_s is not None and auto_flush_age_s <= 0:
            auto_flush_age_s = None
        self.auto_flush_rows = auto_flush_rows
        # AGE watermark: a namespace whose oldest unflushed row has
        # been sitting longer than this many seconds flushes even if
        # it never reaches the row watermark — a trickle-rate
        # namespace must not hold the WAL hostage (its records pin
        # every segment they touch against compaction) nor sit
        # non-durable-in-parquet forever. Checked by a daemon ticker
        # (period = age/4, floor 0.5 s) through the same
        # _schedule_autoflush path, so the one-in-flight-per-
        # namespace marker and the exactly-once flush contract are
        # shared with the row trigger.
        self.auto_flush_age_s = auto_flush_age_s
        # auto-OPTIMIZE watermark (r13, VERDICT r12 task 2): once any
        # (table, day) partition of a namespace holds this many
        # VISIBLE files, a background optimize() bin-packs it. < 2 is
        # normalized to None: optimize(min_files=1) would rewrite a
        # single-file day into a new single file on every pass —
        # infinite churn with no benefit.
        if auto_optimize_files is not None and auto_optimize_files < 2:
            auto_optimize_files = None
        self.auto_optimize_files = auto_optimize_files
        self._autoflush_lock = threading.Lock()
        self._autoflush_pending: set[str] = set()
        self._autooptimize_pending: set[str] = set()
        self._autoflush_stop = threading.Event()
        super().__init__(spark, wal_dir, max_segment_size, multi_table)
        if auto_flush_rows is not None:
            # WAL replay may have restored an over-watermark backlog
            for ns in self.buffer.namespaces():
                if self.buffer.row_count(ns) >= auto_flush_rows:
                    self._schedule_autoflush(ns)
        if auto_optimize_files is not None:
            # a restart may land on a cold tier already over the file
            # watermark (e.g. the process died between flush and pack)
            with self._wal_lock:
                committed = self._committed_files()
            for ns in {rel.split("/", 1)[0] for rel in committed}:
                if self._over_optimize_watermark(ns, committed):
                    self._schedule_autooptimize(ns)
        if auto_flush_age_s is not None:
            threading.Thread(
                target=self._age_ticker,
                name="lynx-autoflush-age",
                daemon=True,
            ).start()

    # -------------------------------------------------------- auto-flush

    def write(self, req) -> None:
        super().write(req)
        n = self.auto_flush_rows
        if n is not None and self.buffer.row_count(req.namespace) >= n:
            self._schedule_autoflush(req.namespace)

    def _schedule_autoflush(self, namespace: str) -> None:
        """At most one in-flight background flush per namespace: the
        pending marker is set before the thread starts and cleared
        after flush() returns, and every write that still (or again)
        sees an over-watermark count re-arms it. ADVICE r12: flush()
        releases _wal_lock before the runner's ``finally`` clears the
        marker, so a write landing in that window sees the marker set
        and skips re-arming — the runner therefore re-checks the row
        watermark AFTER clearing the marker and reschedules itself if
        the namespace is (still or again) over, closing the
        strand-without-a-flush window even when no age ticker runs."""
        import threading

        with self._autoflush_lock:
            if namespace in self._autoflush_pending:
                return
            self._autoflush_pending.add(namespace)
        threading.Thread(
            target=self._autoflush_run,
            args=(namespace,),
            name=f"lynx-autoflush-{namespace}",
            daemon=True,
        ).start()

    def _autoflush_run(self, namespace: str) -> None:
        import sys

        flushed = False
        try:
            self.flush(namespace)
            flushed = True
        except Exception as e:  # noqa: BLE001 — must clear the marker
            print(f"auto-flush({namespace}) failed: {e!r}", file=sys.stderr)
        finally:
            with self._autoflush_lock:
                self._autoflush_pending.discard(namespace)
        # close the marker-clear race (see _schedule_autoflush): writes
        # between flush() returning and the discard above saw the
        # marker and skipped re-arming. Only on the success path — a
        # FAILED flush leaves rows over the watermark by definition,
        # and rescheduling then would spin a hot retry loop; failures
        # keep the old contract (the next write or age tick re-arms).
        if flushed:
            n = self.auto_flush_rows
            if n is not None and self.buffer.row_count(namespace) >= n:
                self._schedule_autoflush(namespace)

    def autoflush_idle(self) -> bool:
        """True when no background flush is in flight (test/ops hook)."""
        with self._autoflush_lock:
            return not self._autoflush_pending

    # ----------------------------------------------------- auto-optimize

    def _over_optimize_watermark(
        self, namespace: str, committed: set[str] | None = None
    ) -> bool:
        """Does any (table, day) partition of the namespace hold ≥
        auto_optimize_files visible files? O(#committed files) over the
        cached commit log — no filesystem walk."""
        k = self.auto_optimize_files
        if k is None:
            return False
        if committed is None:
            committed = self._committed_files()
        counts: dict[str, int] = {}
        for rel in committed:
            parts = rel.split("/")
            if len(parts) == 4 and parts[0] == namespace:
                day_dir = "/".join(parts[:3])
                counts[day_dir] = counts.get(day_dir, 0) + 1
                if counts[day_dir] >= k:
                    return True
        return False

    def _maybe_autooptimize(self, namespace: str) -> None:
        """Called at the end of flush() (under _wal_lock, commit cache
        warm): schedule a background pack if the flush pushed any day
        partition over the file watermark."""
        if self.auto_optimize_files is not None and (
            self._over_optimize_watermark(namespace)
        ):
            self._schedule_autooptimize(namespace)

    def notify_external_commit(self, namespace: str) -> None:
        """File-count watermark check for commits this engine did NOT
        write — the streaming sink commits into the same cold dir from
        its own micro-batch thread, so a namespace fed exclusively by
        a sink never passes through flush() and (before r14) escaped
        the auto-optimize watermark until a manual /api/v1/optimize.
        The sink calls this after each commit (streaming/ingest.py);
        takes _wal_lock because the commit-cache refresh mutates
        shared state, unlike the flush-path caller which already
        holds it."""
        if self.auto_optimize_files is None:
            return
        with self._wal_lock:
            over = self._over_optimize_watermark(namespace)
        if over:
            self._schedule_autooptimize(namespace)

    def _schedule_autooptimize(self, namespace: str) -> None:
        """Same one-in-flight-per-namespace contract as
        _schedule_autoflush, with its own pending set (a flush and a
        pack of the same namespace may overlap in wall time — they
        serialize on _wal_lock, not on the markers)."""
        import threading

        with self._autoflush_lock:
            if namespace in self._autooptimize_pending:
                return
            self._autooptimize_pending.add(namespace)
        threading.Thread(
            target=self._autooptimize_run,
            args=(namespace,),
            name=f"lynx-autooptimize-{namespace}",
            daemon=True,
        ).start()

    def _autooptimize_run(self, namespace: str) -> None:
        import sys

        packed = False
        try:
            # min_files = the watermark itself: only over-watermark
            # day partitions are rewritten, so a day that just crossed
            # is packed to 1 file and then left alone until it crosses
            # again — no churn on small days
            self.optimize(namespace, min_files=self.auto_optimize_files)
            packed = True
        except Exception as e:  # noqa: BLE001 — must clear the marker
            print(
                f"auto-optimize({namespace}) failed: {e!r}", file=sys.stderr
            )
        finally:
            with self._autoflush_lock:
                self._autooptimize_pending.discard(namespace)
        # marker-clear race, same shape as _autoflush_run: flushes
        # landing between optimize() returning and the discard above
        # saw the marker and skipped re-arming (success path only —
        # a persistent failure must not spin a hot retry loop). The
        # commit-log read takes _wal_lock: the cache is only mutated
        # under it everywhere else.
        if packed:
            with self._wal_lock:
                over = self._over_optimize_watermark(namespace)
            if over:
                self._schedule_autooptimize(namespace)

    def autooptimize_idle(self) -> bool:
        """True when no background pack is in flight (test/ops hook)."""
        with self._autoflush_lock:
            return not self._autooptimize_pending

    def _age_ticker(self) -> None:
        import time

        age = float(self.auto_flush_age_s)
        period = max(0.5, age / 4.0)
        while not self._autoflush_stop.wait(period):
            for ns in self.buffer.namespaces():
                a = self.buffer.oldest_insert_age(ns)
                if a is not None and a >= age:
                    self._schedule_autoflush(ns)

    def close_autoflush(self) -> None:
        """Stop the age ticker (tests; daemon threads die with the
        process anyway)."""
        self._autoflush_stop.set()

    # ------------------------------------------------------- commit log

    def _load_commits(self) -> dict[str, dict]:
        """All committed entries (cached: commit files are immutable;
        only new filenames are read). The streaming sink may add
        commits — and its compact_commits may FOLD them away —
        concurrently: a commit unlinked between the glob and the read
        (FileNotFoundError) restarts the listing, which then sees the
        fold's snapshot (renamed in before its sources are unlinked,
        so a re-list always sees a superset). ADVICE r2: never
        silently skip a vanished commit — an under-approximated
        committed set would let _gc_flush_orphans delete committed
        files. Stale cache entries for folded-away commits are
        harmless: their contents are a subset of the snapshot's."""
        cdir = self.cold_dir / COMMITS_DIR
        if cdir.exists():
            for _ in range(50):
                try:
                    for p in sorted(cdir.glob("*.json")):
                        if p.name not in self._commit_cache:
                            self._commit_cache[p.name] = json.loads(
                                p.read_text()
                            )
                    break
                except FileNotFoundError:
                    continue  # folded away mid-listing; re-list
            else:
                raise RuntimeError(
                    "commit log listing unstable after 50 retries; "
                    "refusing to return a possibly-partial committed set"
                )
        return self._commit_cache

    def _committed_files(self) -> set[str]:
        """VISIBLE files: every committed file minus every file a
        rewrite (optimize) commit replaced. The subtraction is
        order-free because file names are writer-unique and never
        reused: a name in any ``replaced`` list is permanently dead."""
        files: set[str] = set()
        replaced: set[str] = set()
        for commit in self._load_commits().values():
            files.update(commit.get("files", []))
            replaced.update(commit.get("replaced", []))
        return files - replaced

    def _replaced_files(self) -> set[str]:
        """Tombstoned files: replaced by an optimize rewrite, invisible
        to queries, but retained on disk until ``vacuum`` — an
        in-flight query planned before the rewrite may still hold them
        in its pinned file list."""
        return {
            rel
            for commit in self._load_commits().values()
            for rel in commit.get("replaced", [])
        }

    def _protected_files(self) -> set[str]:
        """Files the orphan GC must never touch: visible ∪ tombstoned
        (tombstones die via vacuum, not via the GC)."""
        files: set[str] = set()
        for commit in self._load_commits().values():
            files.update(commit.get("files", []))
            files.update(commit.get("replaced", []))
        return files

    def _watermarks(self) -> dict[str, int]:
        """Per-namespace flush watermark: records of ns in WAL segments
        with id < watermark are already committed to parquet."""
        out: dict[str, int] = {}
        for commit in self._load_commits().values():
            for ns, seg_id in commit.get("watermarks", {}).items():
                out[ns] = max(out.get(ns, -1), seg_id)
        return out

    def _next_flush_id(self, namespace: str) -> int:
        highest = 0
        for name, commit in self._load_commits().items():
            if name.startswith(f"flush-{namespace}-"):
                tail = name.removesuffix(".json").rsplit("-", 1)[-1]
                if tail.isdigit():
                    highest = max(highest, int(tail))
            # snapshots remember the highest id they folded in
            highest = max(
                highest, commit.get("flush_ids", {}).get(namespace, 0)
            )
        return highest + 1

    #: compact the commit log once this many flush commits accumulate
    COMMIT_COMPACT_THRESHOLD = 64

    def _maybe_compact_commits(self) -> None:
        """Engine-side trigger for the shared commit-log compaction
        (see module-level compact_commits). Called under _wal_lock."""
        compact_commits(
            self.cold_dir, self.COMMIT_COMPACT_THRESHOLD, self._commit_cache
        )

    # ------------------------------------------------------------ replay

    def _replay_wal(self, wal_dir: Path) -> tuple[int, list[int]]:
        """Watermark-aware WAL replay: skip records the commit log
        proves are in parquet (crash-after-commit recovery), and sweep
        compaction temp files a crash may have left."""
        watermarks = self._watermarks()
        highest = 0
        observed: list[int] = []
        for entry in Path(wal_dir).iterdir():
            if entry.is_dir():
                continue
            if entry.name.endswith(".compact"):
                entry.unlink()  # crashed mid-compaction; original intact
                continue
            segment_id = int(entry.stem)
            observed.append(segment_id)
            highest = max(highest, segment_id)
            for req in read_segment(entry):
                wm = watermarks.get(req.namespace)
                if wm is not None and segment_id < wm:
                    continue  # already durable in the cold tier
                self.buffer.insert(req)
        return highest, observed

    # ------------------------------------------------------------ flush

    def flush(self, namespace: str) -> int:
        """Drain one namespace's hot buffer into the cold tier; returns
        rows flushed. Exactly-once under any single crash (see module
        docstring): the atomic commit-file rename is the only commit
        point; before it a retry re-stages everything, after it replay
        skips the flushed records via the WAL watermark.

        Ordering under the write lock (writers blocked throughout):
          1. GC invisible orphans from crashed earlier flushes
          2. rotate the WAL -> watermark = fresh active segment id
             (every record of the namespace is now below it)
          3. write every partition file (invisible: not committed)
          4. COMMIT: atomically rename the commit JSON into _commits/
          5. clear the namespace from the buffer
          6. compact the WAL (atomic per segment)
        """
        with self._wal_lock:
            tables = self.buffer.tables(namespace)  # snapshot, not pop
            if tables is None:
                return 0
            self._gc_flush_orphans(namespace, self._protected_files())
            self.wal.rotate()
            watermark = self.wal.active_segment.id
            fid = self._next_flush_id(namespace)
            rows = 0
            rels: list[str] = []
            for table, partitions in tables.items():
                for day in sorted(partitions):
                    n, final = self._write_partition(
                        namespace, table, day, partitions[day], fid
                    )
                    rows += n
                    rels.append(str(final.relative_to(self.cold_dir)))
            atomic_write_json(
                self.cold_dir / COMMITS_DIR / f"flush-{namespace}-{fid:06d}.json",
                {"files": rels, "watermarks": {namespace: watermark}},
            )
            self.buffer.clear_namespace(namespace)
            self._compact_wal(drop_namespace=namespace)
            self._maybe_compact_commits()
            self._maybe_autooptimize(namespace)
            return rows

    def _write_partition(
        self, namespace: str, table: str, day: str, m: Measurements, fid: int
    ) -> tuple[int, Path]:
        """Write one day's rows (pyarrow writer: driver-side, no Spark
        job — the hot slice is small by design; executors read it
        back). The file is named by flush id, so it is unique across
        committed flushes; an uncommitted leftover with the same name
        was GC'd at flush start and would be overwritten anyway."""
        batch = measurements_to_arrow([m])
        out_dir = self.cold_dir / namespace / table / f"day={day}"
        out_dir.mkdir(parents=True, exist_ok=True)
        tmp = out_dir / f".tmp-flush{fid:06d}"
        pq.write_table(batch, tmp)
        # "flush" prefix is reserved (the streaming sink rejects sink
        # ids that could collide), so the orphan GC's glob below can
        # never match another writer's files
        final = out_dir / f"part-flush{fid:06d}-00000.parquet"
        tmp.rename(final)  # still invisible: not in any commit yet
        return batch.num_rows, final

    def _gc_flush_orphans(self, namespace: str, protected: set[str]) -> None:
        """Delete invisible engine-written leftovers (crash before
        commit): flush-named (part-flush*/.tmp-flush*) and
        optimize-named (part-opt*/.tmp-opt*) files not in the
        ``protected`` set (visible ∪ tombstoned — tombstones are
        vacuum's to delete, not the GC's). Streaming files
        (part-<sink>-*, sink ids validated to never start with 'flush'
        or 'opt') are the streaming sink's to manage."""
        ns_dir = self.cold_dir / namespace
        if not ns_dir.exists():
            return
        for p in ns_dir.rglob("part-flush*.parquet"):
            if str(p.relative_to(self.cold_dir)) not in protected:
                p.unlink()
        for p in ns_dir.rglob(".tmp-flush*"):
            p.unlink()
        for p in ns_dir.rglob("part-opt*.parquet"):
            if (
                re.fullmatch(r"part-opt\d{6}-\d{5}\.parquet", p.name)
                and str(p.relative_to(self.cold_dir)) not in protected
            ):
                p.unlink()
        for p in ns_dir.rglob(".tmp-opt*"):
            if re.fullmatch(r"\.tmp-opt\d{6}(-\d{5})?", p.name):
                p.unlink()
        # one-time sweep of the pre-rename flush patterns (part-mNNNNNN
        # / .tmp-mNNNNNN): equally engine-owned, never visible, and no
        # longer produced — the exact-width match cannot touch a
        # streaming sink's part-<sink>- files
        for p in ns_dir.rglob("part-m*.parquet"):
            if (
                re.fullmatch(r"part-m\d{6}-\d{5}\.parquet", p.name)
                and str(p.relative_to(self.cold_dir)) not in protected
            ):
                p.unlink()
        for p in ns_dir.rglob(".tmp-m*"):
            if re.fullmatch(r"\.tmp-m\d{6}", p.name):
                p.unlink()

    # --------------------------------------------------------- optimize

    def _next_optimize_id(self, namespace: str) -> int:
        highest = 0
        for name, commit in self._load_commits().items():
            if name.startswith(f"optimize-{namespace}-"):
                tail = name.removesuffix(".json").rsplit("-", 1)[-1]
                if tail.isdigit():
                    highest = max(highest, int(tail))
            highest = max(
                highest, commit.get("opt_ids", {}).get(namespace, 0)
            )
        return highest + 1

    def optimize(self, namespace: str, table: str | None = None, min_files: int = 2) -> int:
        """Bin-pack small committed files: rewrite every day partition
        holding ≥ ``min_files`` visible files into one file, and commit
        the swap as a single rewrite entry ``{"files": [new],
        "replaced": [old]}`` — the small-file compaction every
        flush-per-minute or streaming deployment needs (a day that
        accumulated 1 000 micro-batch files costs 1 000 opens + footer
        reads per scan and starves row-group pruning).

        Protocol properties (same commit log as flush):
        - The rewrite commit's atomic rename is the ONE commit point:
          before it the new part-opt files are invisible orphans (GC'd
          at the next flush); after it visibility flips atomically for
          the whole group.
        - Replaced files become invisible but stay on DISK until
          ``vacuum`` — an already-planned query holds a pinned file
          list, and the "committed parquet is never deleted" invariant
          extends to tombstones (the Delta/Iceberg retention model).
        - Visibility is ``∪files − ∪replaced`` across commits: order-
          free because names are writer-unique and never reused, so
          the log needs no sequence numbers and folds freely.

        Returns the number of files replaced. Runs under the write
        lock (mutual exclusion with flush/query listing). The rewrite
        itself streams through the driver here — day slices arrive
        flush-sized in this single-node shell; on a cluster the same
        commit protocol wraps an executor-side rewrite job, the log
        does not care who wrote the bytes. Rows are re-sorted by
        timestamp so the packed file's row-group min/max stats support
        range pruning within the day."""
        with self._wal_lock:
            visible = self._committed_files()
            groups: dict[str, list[str]] = {}
            for rel in sorted(visible):
                parts = rel.split("/")
                if len(parts) != 4 or parts[0] != namespace:
                    continue
                if table is not None and parts[1] != table:
                    continue
                groups.setdefault("/".join(parts[:3]), []).append(rel)
            fid = self._next_optimize_id(namespace)
            new_rels: list[str] = []
            old_rels: list[str] = []
            seq = 0
            for day_dir, rels in sorted(groups.items()):
                if len(rels) < min_files:
                    continue
                merged = pa.concat_tables(
                    [pq.read_table(self.cold_dir / rel) for rel in rels],
                    promote_options="permissive",  # tag-schema drift
                ).sort_by("timestamp")
                out_dir = self.cold_dir / day_dir
                tmp = out_dir / f".tmp-opt{fid:06d}-{seq:05d}"
                pq.write_table(merged, tmp)
                final = out_dir / f"part-opt{fid:06d}-{seq:05d}.parquet"
                tmp.rename(final)  # invisible until the commit below
                new_rels.append(str(final.relative_to(self.cold_dir)))
                old_rels.extend(rels)
                seq += 1
            if not old_rels:
                return 0
            atomic_write_json(
                self.cold_dir
                / COMMITS_DIR
                / f"optimize-{namespace}-{fid:06d}.json",
                {"files": new_rels, "replaced": old_rels},
            )
            self._maybe_compact_commits()
            return len(old_rels)

    def vacuum(self, namespace: str | None = None) -> int:
        """Physically delete tombstoned (replaced-by-optimize) files.
        Separate from optimize so the caller controls the retention
        window: run it once no query planned before the rewrite can
        still be executing (the single-process twin of Delta's VACUUM
        retention). Tombstone NAMES stay in the log forever — they are
        what keeps ``∪files − ∪replaced`` correct — but they fold into
        snapshots, so the log's size stays bounded. Idempotent: files
        already gone are skipped. Returns files deleted."""
        with self._wal_lock:
            deleted = 0
            for rel in sorted(self._replaced_files()):
                if namespace is not None and not rel.startswith(namespace + "/"):
                    continue
                p = self.cold_dir / rel
                if p.exists():
                    p.unlink()
                    deleted += 1
            return deleted

    def _compact_wal(self, drop_namespace: str) -> None:
        """Rewrite each closed segment without the flushed namespace's
        records — in place, via atomic rename, so every segment is at
        all times either its original or its compacted self. Survivor
        records keep their segment id (their own namespaces' watermarks
        stay meaningful). Called under _wal_lock, after the commit: if
        this never runs, replay skips the flushed records anyway."""
        for seg_id in list(self.wal.closed_segments):
            seg_path = self.wal.directory / f"{seg_id}.wal"
            if not seg_path.exists():
                self.wal.closed_segments.remove(seg_id)
                continue
            survivors = [
                r for r in read_segment(seg_path)
                if r.namespace != drop_namespace
            ]
            if not survivors:
                seg_path.unlink()
                self.wal.closed_segments.remove(seg_id)
                continue
            tmp = seg_path.parent / (seg_path.name + ".compact")
            with open(tmp, "wb") as f:
                f.write(WAL_HEADER)
                for r in survivors:
                    f.write(encode_write_request(r))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, seg_path)

    # ------------------------------------------------------------ query

    def _cold_table(
        self,
        namespace: str,
        table: str,
        committed: set[str] | None = None,
    ) -> DataFrame | None:
        """Committed cold files for (namespace, table) as one DataFrame
        — explicit file list (visibility = the commit log), basePath so
        the hive ``day`` partition column is still derived and
        prunable. Pass the already-computed committed set when calling
        in a loop (query does) to avoid re-reading the commit log per
        table."""
        if committed is None:
            committed = self._committed_files()
        prefix = f"{namespace}/{table}/"
        files = [
            str(self.cold_dir / rel)
            for rel in sorted(committed)
            if rel.startswith(prefix)
        ]
        if not files:
            return None
        return (
            self.spark.read.option("mergeSchema", "true")
            .option("basePath", str(self.cold_dir / namespace / table))
            .parquet(*files)
        )

    def query(self, namespace: str, sql: str) -> DataFrame | None:
        """Union of hot snapshot and cold tier. Unknown namespace/table
        in BOTH tiers -> None (404), preserving main.rs:83 semantics.

        The hot snapshot and the commit-log read happen under the SAME
        lock a flush holds: without it, a flush racing between the two
        reads would surface its rows in both tiers (double count). The
        cold DataFrame is pinned to the files committed at lock time;
        committed parquet is never deleted, so execution later is safe.

        The cold scan is day-pruned from the WHERE clause's timestamp
        bounds (the same bounds that prune the hot buffer), then the
        internal ``day`` column is dropped unless expose_day — SELECT *
        returns exactly the reference's [timestamp, value, *tags]."""
        table_name = self._target_table(sql)
        with self._wal_lock:
            tables = self.buffer.tables(namespace) or {}
            committed = self._committed_files()
            cold_tables = {
                rel.split("/", 2)[1]
                for rel in committed
                if rel.split("/", 2)[0] == namespace
            }
            candidates = set(tables) | cold_tables
            if table_name is not None and table_name not in candidates:
                return None  # unknown in both tiers -> 404 (main.rs:83)
            if self.multi_table:
                names = referenced_tables(sql, candidates)
                if table_name is not None:
                    names |= {table_name}
                if not names:
                    return None
            else:
                names = {table_name}
            views = {
                name: self._tiered_table_df(
                    namespace, name, tables, sql, committed
                )
                for name in sorted(names)
            }
        with self._query_lock:
            for name, df in views.items():
                df.createOrReplaceTempView(name)
            if self.multi_table:
                self._drop_stale_views(keep=names)
            return self.spark.sql(sql)

    def _tiered_table_df(
        self,
        namespace: str,
        table_name: str,
        tables: dict,
        sql: str,
        committed: set[str] | None = None,
    ) -> DataFrame:
        """hot ∪ cold for one table (caller holds _wal_lock and knows
        at least one tier has it)."""
        hot = None
        if table_name in tables:
            partitions = tables[table_name]
            batch = measurements_to_arrow(
                [partitions[day] for day in select_days(partitions, sql)]
            )
            hot = self.spark.createDataFrame(batch)
            if self.expose_day:
                # day as DATE to line up with the inferred type of
                # the cold tier's hive partition column
                hot = hot.withColumn("day", F.to_date("timestamp"))
        cold = self._cold_table(namespace, table_name, committed)
        if cold is not None:
            lo, hi = extract_time_bounds(sql)
            if lo is not None:
                cold = cold.filter(
                    F.col("day") >= F.lit(partition_key(lo)).cast("date")
                )
            if hi is not None:
                cold = cold.filter(
                    F.col("day") <= F.lit(partition_key(hi)).cast("date")
                )
            if not self.expose_day:
                cold = cold.drop("day")
        if hot is None:
            return cold
        if cold is None:
            return hot
        return cold.unionByName(hot, allowMissingColumns=True)
