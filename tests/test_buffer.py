"""Buffer tests, ported from the reference's inline suites
(src/lynx.rs:182-311, src/buffer.rs:156-212)."""

from __future__ import annotations

import pytest

from lynx_spark.buffer import MemBuffer, partition_key
from lynx_spark.model import WriteRequest


def req(ns="my_namespace", meas="cpu", value="100", metadata=None, ts=1):
    return WriteRequest(ns, meas, value, metadata or {}, ts)


def test_write_multiple_requests_same_namespace():
    # lynx.rs:182-227 — two same-day writes land in one partition
    buf = MemBuffer()
    buf.insert(req(value="100", ts=1))
    buf.insert(req(value="200", ts=2))
    assert buf.namespace_count() == 1
    tables = buf.tables("my_namespace")
    assert list(tables) == ["cpu"]
    parts = tables["cpu"]
    assert len(parts) == 1
    m = parts["1970-01-01"]
    assert m.values == ["100", "200"]
    assert m.timestamps == [1, 2]
    assert len(m.metadata) == 2


def test_write_multiple_namespaces():
    # lynx.rs:229-262 — namespace isolation
    buf = MemBuffer()
    buf.insert(req(ns="ns_one"))
    buf.insert(req(ns="ns_two"))
    assert buf.namespace_count() == 2
    assert buf.table_count("ns_one") == 1
    assert buf.tables("ns_three") is None


def test_partition_by_day():
    # lynx.rs:264-311 — 2023-11-14 vs 2023-11-15 -> two partitions
    ts_nov_14 = 1_699_920_000_000_000  # 2023-11-14T00:00:00Z in us
    ts_nov_15 = ts_nov_14 + 86_400_000_000
    buf = MemBuffer()
    buf.insert(req(ts=ts_nov_14, value="1"))
    buf.insert(req(ts=ts_nov_15, value="2"))
    parts = buf.tables("my_namespace")["cpu"]
    assert sorted(parts) == ["2023-11-14", "2023-11-15"]
    assert parts["2023-11-14"].values == ["1"]
    assert parts["2023-11-15"].values == ["2"]


def test_partition_key_format():
    assert partition_key(1) == "1970-01-01"
    assert partition_key(86_400_000_000) == "1970-01-02"
    assert partition_key(-1) == "1969-12-31"  # pre-epoch lands previous day


def test_partition_key_out_of_range():
    with pytest.raises(ValueError):
        partition_key(2**200)


def test_snapshot_is_deep_copy():
    # buffer.rs:109-115 — mutating the snapshot must not affect the store
    buf = MemBuffer()
    buf.insert(req())
    snap = buf.tables("my_namespace")
    snap["cpu"]["1970-01-01"].values.append("mutant")
    assert buf.tables("my_namespace")["cpu"]["1970-01-01"].values == ["100"]


def test_buffer_ops_interleaved():
    # buffer.rs:156-212 — counts across interleaved writes
    buf = MemBuffer()
    buf.insert(req(ns="a", meas="cpu", ts=1))
    buf.insert(req(ns="a", meas="mem", ts=1))
    buf.insert(req(ns="b", meas="cpu", ts=1))
    buf.insert(req(ns="a", meas="cpu", ts=86_400_000_000))
    assert buf.namespace_count() == 2
    assert buf.table_count("a") == 2
    assert buf.table_count("b") == 1
    assert buf.partition_count("a", "cpu") == 2
    assert buf.partition_count("a", "mem") == 1
