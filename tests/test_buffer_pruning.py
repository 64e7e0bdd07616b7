"""In-memory day-bucket pruning from WHERE-clause timestamp bounds
(SURVEY §4 — the pruning the reference's daily partitions never got).
Both halves matter: pruning HAPPENS for bounded queries, and never
changes results; pruning is REFUSED for every unsound shape."""

from __future__ import annotations

from lynx_spark.buffer import Measurements
from lynx_spark.engine import select_days
from lynx_spark.model import WriteRequest
from lynx_spark.sqlutil import extract_time_bounds

DAY_US = 86_400_000_000


def test_extract_bounds_basic():
    lo, hi = extract_time_bounds(
        "SELECT * FROM cpu WHERE timestamp >= '1970-01-02' AND timestamp < '1970-01-04'"
    )
    assert lo == DAY_US
    assert hi == 3 * DAY_US - 1  # strict < becomes inclusive -1


def test_extract_bounds_keyword_literal_and_reversed():
    lo, hi = extract_time_bounds(
        "SELECT * FROM cpu WHERE timestamp >= TIMESTAMP '1970-01-02'"
    )
    assert (lo, hi) == (DAY_US, None)
    lo, hi = extract_time_bounds(
        "SELECT * FROM cpu WHERE '1970-01-02' > timestamp"
    )
    assert (lo, hi) == (None, DAY_US - 1)


def test_extract_bounds_equality():
    lo, hi = extract_time_bounds(
        "SELECT * FROM cpu WHERE timestamp = '1970-01-02 12:00:00'"
    )
    assert lo == hi == DAY_US + 12 * 3_600_000_000


def test_unsound_shapes_refuse_pruning():
    for sql in [
        "SELECT * FROM cpu WHERE timestamp >= '1970-01-02' OR value = '1'",
        "SELECT * FROM cpu WHERE NOT (timestamp < '1970-01-02')",
        "SELECT * FROM cpu WHERE timestamp BETWEEN '1970-01-01' AND '1970-01-02'",
        "SELECT * FROM cpu a JOIN cpu b ON a.value = b.value WHERE a.timestamp >= '1970-01-02'",
        "SELECT * FROM cpu WHERE value IN (SELECT value FROM cpu WHERE timestamp >= '1970-01-02')",
        "SELECT * FROM cpu WHERE value = 'timestamp >= ''1970-01-02'''",  # literal only
    ]:
        assert extract_time_bounds(sql) == (None, None), sql


def test_select_days_prunes():
    parts = {f"1970-01-0{d}": Measurements() for d in range(1, 6)}
    days = select_days(
        parts,
        "SELECT * FROM cpu WHERE timestamp >= '1970-01-02' AND timestamp < '1970-01-04'",
    )
    assert days == ["1970-01-02", "1970-01-03"]
    # unbounded query -> all days
    assert len(select_days(parts, "SELECT * FROM cpu")) == 5


def test_pruned_query_results_unchanged(engine):
    for d in range(5):
        engine.write(WriteRequest("ns", "cpu", f"day{d}", {}, d * DAY_US + 1))
    bounded = (
        "SELECT value FROM cpu WHERE timestamp >= '1970-01-02' "
        "AND timestamp < '1970-01-04' ORDER BY value"
    )
    vals = [r["value"] for r in engine.query("ns", bounded).collect()]
    assert vals == ["day1", "day2"]
    # boundary exactness: a row at exactly the lower bound is kept
    engine.write(WriteRequest("ns", "cpu", "edge", {}, DAY_US))
    vals = [r["value"] for r in engine.query("ns", bounded).collect()]
    assert vals == ["day1", "day2", "edge"]
