"""End-to-end engine tests, porting the reference's golden query test
(src/lynx.rs:313-387) and table-name extraction (lynx.rs:389-401)."""

from __future__ import annotations

import pytest

from lynx_spark.formatting import rows_to_json, rows_to_table
from lynx_spark.model import WriteRequest
from lynx_spark.sqlutil import TableNameError, parse_table_name


def _table(df) -> str:
    return rows_to_table(df.columns, [tuple(r) for r in df.collect()])


def test_query_results_golden(engine):
    # lynx.rs:313-387 — write -> SELECT * -> golden ASCII table
    engine.write(WriteRequest("events", "clicks", "search_button", {}, 1))
    df = engine.query("events", "SELECT * FROM clicks")
    expected = "\n".join(
        [
            "+----------------------------+---------------+",
            "| timestamp                  | value         |",
            "+----------------------------+---------------+",
            "| 1970-01-01T00:00:00.000001 | search_button |",
            "+----------------------------+---------------+",
        ]
    )
    assert _table(df) == expected

    # second write is visible on re-query (lynx.rs:348-376)
    engine.write(WriteRequest("events", "clicks", "search_button", {}, 100))
    df = engine.query("events", "SELECT * FROM clicks")
    expected = "\n".join(
        [
            "+----------------------------+---------------+",
            "| timestamp                  | value         |",
            "+----------------------------+---------------+",
            "| 1970-01-01T00:00:00.000001 | search_button |",
            "| 1970-01-01T00:00:00.000100 | search_button |",
            "+----------------------------+---------------+",
        ]
    )
    assert _table(df) == expected

    # unknown namespace -> None (404), lynx.rs:377-386
    assert engine.query("not_exist", "SELECT * FROM not_exist_table") is None


def test_unknown_table_is_none(engine):
    engine.write(WriteRequest("ns", "cpu", "1", {}, 1))
    assert engine.query("ns", "SELECT * FROM gpu") is None


def test_tag_columns_nullable_and_sorted(engine):
    # schema = [timestamp, value, *sorted(tags)]; missing tag -> NULL
    engine.write(WriteRequest("ns", "cpu", "1", {"host": "a", "core": 0}, 1))
    engine.write(WriteRequest("ns", "cpu", "2", {"host": "b"}, 2))
    df = engine.query("ns", "SELECT * FROM cpu")
    assert df.columns == ["timestamp", "value", "core", "host"]
    rows = {r["value"]: r for r in df.collect()}
    assert rows["1"]["core"] == "0"  # numeric tag stringified (lynx.rs:128)
    assert rows["2"]["core"] is None


def test_sql_aggregation_with_cast(engine):
    # value is a string (lynx.rs:107) — numeric analytics need CAST
    for i, v in enumerate(["10", "20", "30"]):
        engine.write(WriteRequest("ns", "cpu", v, {"host": "a"}, i))
    df = engine.query(
        "ns", "SELECT host, SUM(CAST(value AS DOUBLE)) AS total FROM cpu GROUP BY host"
    )
    assert df.collect()[0]["total"] == 60.0


def test_self_join(engine):
    # self-joins via alias are reachable in the reference (SURVEY §2B)
    engine.write(WriteRequest("ns", "cpu", "1", {}, 1))
    engine.write(WriteRequest("ns", "cpu", "2", {}, 2))
    df = engine.query(
        "ns",
        "SELECT a.value AS av, b.value AS bv FROM cpu a JOIN cpu b ON a.timestamp = b.timestamp",
    )
    assert df.count() == 2


def test_multi_day_partitions_concatenate_in_order(engine):
    day_us = 86_400_000_000
    engine.write(WriteRequest("ns", "cpu", "day2", {}, day_us))
    engine.write(WriteRequest("ns", "cpu", "day1", {}, 1))
    df = engine.query("ns", "SELECT * FROM cpu")
    # concatenation order = day order (BTreeMap), lynx.rs:86-91
    vals = [r["value"] for r in df.collect()]
    assert vals == ["day1", "day2"]


def test_parse_table_name():
    # lynx.rs:389-401
    assert parse_table_name("SELECT * FROM foo") == "foo"
    assert parse_table_name("SELECT name, age FROM people") == "people"
    with pytest.raises(TableNameError):
        parse_table_name("SELECT *")
    with pytest.raises(TableNameError):
        parse_table_name("INSERT INTO my_table (id) VALUES (1)")
    with pytest.raises(TableNameError):
        parse_table_name("WITH t AS (SELECT 1) SELECT * FROM t")
    with pytest.raises(TableNameError):
        parse_table_name("SELECT * FROM (SELECT 1)")
    # quoted + aliased + trailing clauses
    assert parse_table_name('SELECT * FROM "weird name" w WHERE x > 1') == "weird name"
    assert (
        parse_table_name("SELECT v FROM cpu WHERE value IN (SELECT 1)") == "cpu"
    )


def test_comment_markers_inside_string_literals():
    # '--' and '/*' inside literals are data, not comments
    assert parse_table_name("SELECT '--x' AS note, value FROM cpu") == "cpu"
    assert parse_table_name("SELECT '/*' FROM cpu") == "cpu"
    # real comments are still stripped
    assert parse_table_name("SELECT * -- trailing\nFROM cpu") == "cpu"
    assert parse_table_name("SELECT /* block */ * FROM cpu") == "cpu"


def test_string_literal_comment_query_end_to_end(engine):
    engine.write(WriteRequest("ns", "cpu", "v", {}, 1))
    df = engine.query("ns", "SELECT '--x' AS note, value FROM cpu")
    assert df.collect()[0]["note"] == "--x"


def test_json_format():
    # nulls omitted per Arrow ArrayWriter (query.rs:19-28)
    out = rows_to_json(["a", "b"], [(1, None), (2, "x")])
    assert out == '[{"a":1},{"a":2,"b":"x"}]'
