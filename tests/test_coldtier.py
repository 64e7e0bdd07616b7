"""Tiered-engine tests: flush to date-partitioned parquet, tiered
queries, WAL truncation, partition pruning (SURVEY §7 step 6)."""

from __future__ import annotations

import io

import pytest

from lynx_spark.model import WriteRequest
from lynx_spark.sources.coldtier import TieredEngine

DAY_US = 86_400_000_000


@pytest.fixture()
def tiered(spark, tmp_path):
    return TieredEngine(
        spark, tmp_path / "wal", tmp_path / "cold", max_segment_size=1024
    )


def _write(eng, value, ts, tags=None, table="cpu", ns="ns"):
    eng.write(WriteRequest(ns, table, value, tags or {}, ts))


def test_flush_and_query_cold(tiered, tmp_path):
    _write(tiered, "1", 1)
    _write(tiered, "2", DAY_US)
    assert tiered.flush("ns") == 2
    # buffer drained; data served from the cold tier
    assert tiered.buffer.tables("ns") is None
    df = tiered.query("ns", "SELECT * FROM cpu")
    assert sorted(r["value"] for r in df.collect()) == ["1", "2"]
    # hive layout: one day= dir per partition
    days = sorted(p.name for p in (tmp_path / "cold/ns/cpu").iterdir())
    assert days == ["day=1970-01-01", "day=1970-01-02"]


def test_union_hot_and_cold(tiered):
    _write(tiered, "cold_row", 1)
    tiered.flush("ns")
    _write(tiered, "hot_row", 2)
    df = tiered.query("ns", "SELECT * FROM cpu")
    assert sorted(r["value"] for r in df.collect()) == ["cold_row", "hot_row"]


def test_wal_truncated_after_full_flush(tiered):
    for i in range(50):  # force several 1 KiB segments
        _write(tiered, str(i), i)
    wal_dir = tiered.wal.directory
    assert len(list(wal_dir.glob("*.wal"))) > 1
    tiered.flush("ns")
    # only the fresh active segment remains
    remaining = list(wal_dir.glob("*.wal"))
    assert remaining == [tiered.wal.active_segment.path]


def test_restart_after_flush_no_double_count(spark, tmp_path):
    eng = TieredEngine(spark, tmp_path / "wal", tmp_path / "cold", 1024)
    _write(eng, "a", 1)
    _write(eng, "b", 2)
    eng.flush("ns")
    _write(eng, "c", 3)
    eng.wal.close()
    # restart: replay must restore ONLY the unflushed row
    eng2 = TieredEngine(spark, tmp_path / "wal", tmp_path / "cold", 1024)
    df = eng2.query("ns", "SELECT * FROM cpu")
    assert sorted(r["value"] for r in df.collect()) == ["a", "b", "c"]
    m = eng2.buffer.tables("ns")["cpu"]["1970-01-01"]
    assert m.values == ["c"]


def test_tag_schema_drift_across_flushes(tiered):
    _write(tiered, "1", 1, {"host": "a"})
    tiered.flush("ns")
    _write(tiered, "2", DAY_US, {"region": "eu"})
    tiered.flush("ns")
    _write(tiered, "3", 2 * DAY_US, {"host": "b", "core": 7})
    df = tiered.query("ns", "SELECT * FROM cpu ORDER BY timestamp")
    rows = df.collect()
    assert {"timestamp", "value", "host", "region", "core", "day"} <= set(df.columns)
    assert rows[0]["host"] == "a" and rows[0]["region"] is None
    assert rows[1]["region"] == "eu"
    assert rows[2]["core"] == "7"


def test_partition_pruning_on_day(tiered):
    for d in range(5):
        _write(tiered, str(d), d * DAY_US)
    tiered.flush("ns")
    df = tiered.query("ns", "SELECT * FROM cpu WHERE day = DATE'1970-01-03'")
    assert [r["value"] for r in df.collect()] == ["2"]
    # Catalyst must prune the cold scan to one day= directory
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "1970-01-03" in plan


def test_partial_namespace_flush_no_double_count_after_restart(spark, tmp_path):
    """Flushing ONE namespace while another holds data must compact the
    WAL so a restart replays only unflushed rows (the flushed
    namespace's rows live solely in parquet)."""
    eng = TieredEngine(spark, tmp_path / "wal", tmp_path / "cold", 1024)
    _write(eng, "a1", 1, ns="ns_a")
    _write(eng, "b1", 2, ns="ns_b")
    _write(eng, "a2", 3, ns="ns_a")
    assert eng.flush("ns_a") == 2
    eng.wal.close()

    eng2 = TieredEngine(spark, tmp_path / "wal", tmp_path / "cold", 1024)
    # ns_a: only in cold, exactly once
    vals_a = sorted(
        r["value"] for r in eng2.query("ns_a", "SELECT * FROM cpu").collect()
    )
    assert vals_a == ["a1", "a2"]
    # ns_b: replayed from the compacted WAL into the hot buffer
    vals_b = [r["value"] for r in eng2.query("ns_b", "SELECT * FROM cpu").collect()]
    assert vals_b == ["b1"]
    assert eng2.buffer.tables("ns_a") is None


def test_flush_failure_leaves_buffer_and_wal_intact(tiered, monkeypatch):
    """A parquet write failure mid-flush must not lose visibility of
    the rows (buffer cleared only after all partitions are written)."""
    _write(tiered, "1", 1)
    _write(tiered, "2", DAY_US)

    def boom(*args, **kwargs):
        raise OSError("disk full")

    monkeypatch.setattr(
        "lynx_spark.sources.coldtier.pq.write_table", boom
    )
    with pytest.raises(OSError):
        tiered.flush("ns")
    monkeypatch.undo()
    # rows still served from the hot buffer; WAL untouched
    df = tiered.query("ns", "SELECT * FROM cpu")
    assert sorted(r["value"] for r in df.collect()) == ["1", "2"]
    assert tiered.flush("ns") == 2  # retry succeeds


def test_unknown_is_404_in_both_tiers(tiered):
    _write(tiered, "1", 1)
    tiered.flush("ns")
    assert tiered.query("nope", "SELECT * FROM cpu") is None
    assert tiered.query("ns", "SELECT * FROM gpu") is None
