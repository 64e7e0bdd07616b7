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


def test_extract_bounds_between():
    lo, hi = extract_time_bounds(
        "SELECT * FROM cpu WHERE timestamp BETWEEN '1970-01-02' AND '1970-01-03'"
    )
    assert (lo, hi) == (DAY_US, 2 * DAY_US)  # BETWEEN is inclusive
    lo, hi = extract_time_bounds(
        "SELECT * FROM cpu WHERE timestamp BETWEEN TIMESTAMP '1970-01-02' "
        "AND TIMESTAMP '1970-01-03'"
    )
    assert (lo, hi) == (DAY_US, 2 * DAY_US)
    # BETWEEN on another column must not contribute timestamp bounds
    lo, hi = extract_time_bounds(
        "SELECT * FROM cpu WHERE value BETWEEN '1' AND '2' "
        "AND timestamp >= '1970-01-02'"
    )
    assert (lo, hi) == (DAY_US, None)


def test_extract_bounds_qualified_single_table():
    lo, hi = extract_time_bounds(
        "SELECT t.value FROM cpu t WHERE t.timestamp >= '1970-01-02'"
    )
    assert (lo, hi) == (DAY_US, None)
    lo, hi = extract_time_bounds(
        "SELECT t.value FROM cpu t WHERE '1970-01-02' > t.timestamp"
    )
    assert (lo, hi) == (None, DAY_US - 1)


def test_extract_bounds_where_scope_only():
    # ADVICE r1 (high): conditional aggregation in the SELECT list must
    # not be mistaken for a WHERE bound — count(*) would lose rows
    assert extract_time_bounds(
        "SELECT SUM(CASE WHEN timestamp >= '1970-01-02' THEN 1 ELSE 0 END), "
        "count(*) FROM cpu"
    ) == (None, None)
    # ... even when a WHERE clause exists for another column
    assert extract_time_bounds(
        "SELECT SUM(CASE WHEN timestamp >= '1970-01-03' THEN 1 ELSE 0 END) "
        "FROM cpu WHERE value = '1'"
    ) == (None, None)
    # HAVING comparisons are outside the scanned-row bound
    assert extract_time_bounds(
        "SELECT value FROM cpu GROUP BY value "
        "HAVING max(timestamp) >= '1970-01-02'"
    ) == (None, None)
    # a WHERE bound still applies with trailing clauses present
    assert extract_time_bounds(
        "SELECT value FROM cpu WHERE timestamp >= '1970-01-02' "
        "GROUP BY value ORDER BY value LIMIT 5"
    ) == (DAY_US, None)


def test_unsound_shapes_refuse_pruning():
    for sql in [
        "SELECT * FROM cpu WHERE timestamp >= '1970-01-02' OR value = '1'",
        "SELECT * FROM cpu WHERE NOT (timestamp < '1970-01-02')",
        "SELECT * FROM cpu WHERE timestamp NOT BETWEEN '1970-01-01' AND '1970-01-02'",
        "SELECT * FROM cpu a JOIN cpu b ON a.value = b.value WHERE a.timestamp >= '1970-01-02'",
        "SELECT * FROM cpu a, cpu b WHERE a.timestamp >= '1970-01-02'",
        "SELECT * FROM cpu WHERE value IN (SELECT value FROM cpu WHERE timestamp >= '1970-01-02')",
        "SELECT * FROM cpu WHERE value = 'timestamp >= ''1970-01-02'''",  # literal only
        "SELECT * FROM cpu WHERE CASE WHEN timestamp >= '1970-01-02' THEN 1 ELSE 1 END = 1",
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


def test_negated_predicates_refuse_pruning():
    """r2 review: postfix/prefix negations must not be read as
    conjunctive bounds (they select the COMPLEMENT of the range)."""
    for sql in [
        "SELECT * FROM cpu WHERE (timestamp >= '1970-01-02') IS FALSE",
        "SELECT * FROM cpu WHERE (timestamp >= '1970-01-02') IS UNKNOWN",
        "SELECT * FROM cpu WHERE (timestamp >= '1970-01-02') IS NOT TRUE",
        "SELECT * FROM cpu WHERE !(timestamp >= '1970-01-02')",
        # ADVICE r2: boolean-wrapper negations — the inner comparison is
        # NOT a required conjunct; tightening would drop exactly the
        # selected rows
        "SELECT * FROM cpu WHERE (timestamp >= '1970-01-02') = false",
        "SELECT * FROM cpu WHERE (timestamp >= '1970-01-02') = FALSE",
        "SELECT * FROM cpu WHERE if(timestamp >= '1970-01-02', false, true)",
        "SELECT * FROM cpu WHERE iif(timestamp >= '1970-01-02', false, true)",
        "SELECT * FROM cpu WHERE (timestamp >= '1970-01-02') XOR true",
        "SELECT * FROM cpu WHERE (timestamp >= '1970-01-02') != true",
        # any parenthesized comparison is no longer tightened (depth-0
        # conjuncts only) — sound, conservative
        "SELECT * FROM cpu WHERE (timestamp >= '1970-01-02')",
        # r3 review: chained comparisons wrap the inner comparison in
        # a boolean equality with NO true/false/not token to bail on —
        # the conjunct-boundary rule must refuse them
        "SELECT * FROM cpu WHERE timestamp >= '1970-01-02' = (1 > 2)",
        "SELECT * FROM cpu WHERE timestamp >= '1970-01-02' = (value = 'x')",
        "SELECT * FROM cpu WHERE (1 > 2) = '1970-01-02' > timestamp",
        "SELECT * FROM cpu WHERE timestamp BETWEEN '1970-01-01' AND '1970-01-02' = (1 > 2)",
    ]:
        assert extract_time_bounds(sql) == (None, None), sql
    # depth-0 conjuncts still prune alongside parenthesized residue
    assert extract_time_bounds(
        "SELECT * FROM cpu WHERE timestamp >= '1970-01-02' "
        "AND (value = '1' AND value = '1')"
    ) == (DAY_US, None)
