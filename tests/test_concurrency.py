"""Concurrency storm: interleaved writers and flushers must never
lose, duplicate, or tear rows (the locking contract of engine.write +
TieredEngine.flush/query)."""

from __future__ import annotations

import threading

from lynx_spark.model import WriteRequest
from lynx_spark.sources.coldtier import TieredEngine


def test_concurrent_writes_and_flushes_exact(spark, tmp_path):
    eng = TieredEngine(
        spark, tmp_path / "wal", tmp_path / "cold", max_segment_size=512
    )
    errors: list[str] = []

    def writer(lo: int, hi: int) -> None:
        try:
            for i in range(lo, hi):
                eng.write(WriteRequest("ns", "cpu", str(i), {}, i))
        except Exception as e:  # noqa: BLE001
            errors.append(f"write: {e!r}")

    def flusher(n: int) -> None:
        try:
            for _ in range(n):
                eng.flush("ns")
        except Exception as e:  # noqa: BLE001
            errors.append(f"flush: {e!r}")

    threads = [
        threading.Thread(target=writer, args=(k * 100, (k + 1) * 100))
        for k in range(4)
    ]
    threads += [threading.Thread(target=flusher, args=(5,)) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    eng.flush("ns")

    assert errors == []
    row = eng.query(
        "ns", "SELECT count(*) AS n, count(DISTINCT value) AS dv FROM cpu"
    ).collect()[0]
    assert (row["n"], row["dv"]) == (400, 400)
