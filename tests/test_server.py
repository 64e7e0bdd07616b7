"""HTTP API tests (flask test client): exact status-code semantics of
the reference (main.rs:51-89) plus the tiered superset routes."""

from __future__ import annotations

import json

import pytest

from lynx_spark.engine import LynxEngine
from lynx_spark.server import create_app
from lynx_spark.sources.coldtier import TieredEngine


@pytest.fixture()
def client(spark, tmp_path):
    app = create_app(LynxEngine(spark, tmp_path / "wal"))
    return app.test_client()


@pytest.fixture()
def tiered_client(spark, tmp_path):
    app = create_app(TieredEngine(spark, tmp_path / "wal", tmp_path / "cold"))
    return app.test_client()


WRITE = {
    "namespace": "events",
    "measurement": "clicks",
    "value": "search_button",
    "metadata": {},
    "timestamp": 1,
}


def test_health(client):
    assert client.get("/health").status_code == 200


def test_write_then_query_table_default(client):
    assert client.post("/api/v1/write", json=WRITE).status_code == 200
    r = client.post(
        "/api/v1/query",
        json={"namespace": "events", "query": "SELECT * FROM clicks"},
    )
    assert r.status_code == 200
    body = r.get_data(as_text=True)
    assert "| 1970-01-01T00:00:00.000001 | search_button |" in body


def test_query_json_format(client):
    client.post("/api/v1/write", json=WRITE)
    r = client.post(
        "/api/v1/query",
        json={
            "namespace": "events",
            "query": "SELECT * FROM clicks",
            "format": "Json",
        },
    )
    assert json.loads(r.get_data()) == [
        {"timestamp": "1970-01-01T00:00:00.000001", "value": "search_button"}
    ]


def test_unknown_format_is_500(client):
    client.post("/api/v1/write", json=WRITE)
    r = client.post(
        "/api/v1/query",
        json={
            "namespace": "events",
            "query": "SELECT * FROM clicks",
            "format": "Bogus",  # serde rejects unknown variants
        },
    )
    assert r.status_code == 500


def test_unknown_namespace_and_table_404(client):
    client.post("/api/v1/write", json=WRITE)
    for ns, q in [("nope", "SELECT * FROM clicks"), ("events", "SELECT * FROM nope")]:
        assert (
            client.post("/api/v1/query", json={"namespace": ns, "query": q}).status_code
            == 404
        )


def test_write_missing_field_500(client):
    bad = dict(WRITE)
    del bad["metadata"]  # all five fields required (main.rs:55-57)
    assert client.post("/api/v1/write", json=bad).status_code == 500


def test_write_bad_tag_value_500(client):
    bad = dict(WRITE, metadata={"host": -1})  # u64 range
    assert client.post("/api/v1/write", json=bad).status_code == 500
    bad = dict(WRITE, metadata={"host": 1.5})  # float not a TagValue
    assert client.post("/api/v1/write", json=bad).status_code == 500


def test_non_select_500(client):
    client.post("/api/v1/write", json=WRITE)
    r = client.post(
        "/api/v1/query",
        json={"namespace": "events", "query": "INSERT INTO clicks VALUES (1)"},
    )
    assert r.status_code == 500


def test_flush_route(tiered_client):
    assert tiered_client.post("/api/v1/write", json=WRITE).status_code == 200
    r = tiered_client.post("/api/v1/flush", json={"namespace": "events"})
    assert r.status_code == 200
    assert r.get_json() == {"rows_flushed": 1}
    # data still queryable from the cold tier
    r = tiered_client.post(
        "/api/v1/query",
        json={"namespace": "events", "query": "SELECT * FROM clicks", "format": "Json"},
    )
    assert r.status_code == 200
    assert json.loads(r.get_data())[0]["value"] == "search_button"


def test_flush_on_plain_engine_404(client):
    r = client.post("/api/v1/flush", json={"namespace": "events"})
    assert r.status_code == 404


def test_optimize_route(tiered_client):
    # two flushes -> two small files in the same day partition
    for val in ("a", "b"):
        w = dict(WRITE, value=val)
        assert tiered_client.post("/api/v1/write", json=w).status_code == 200
        assert (
            tiered_client.post(
                "/api/v1/flush", json={"namespace": "events"}
            ).status_code
            == 200
        )
    r = tiered_client.post(
        "/api/v1/optimize", json={"namespace": "events", "vacuum": True}
    )
    assert r.status_code == 200
    assert r.get_json() == {"files_replaced": 2, "files_deleted": 2}
    r = tiered_client.post(
        "/api/v1/query",
        json={"namespace": "events", "query": "SELECT * FROM clicks", "format": "Json"},
    )
    assert r.status_code == 200
    assert sorted(row["value"] for row in json.loads(r.get_data())) == ["a", "b"]


def test_optimize_on_plain_engine_404(client):
    r = client.post("/api/v1/optimize", json={"namespace": "events"})
    assert r.status_code == 404


def test_reference_testdata_fixtures(client):
    """Replay the reference's own curl fixtures
    (/root/reference/testdata/write.json + query.json) verbatim."""
    write_fixture = {
        "namespace": "factory",
        "measurement": "temp",
        "value": "50",
        "metadata": {},
        "timestamp": 1761318000019000,
    }
    query_fixture = {"namespace": "factory", "query": "SELECT * FROM temp"}
    assert client.post("/api/v1/write", json=write_fixture).status_code == 200
    r = client.post("/api/v1/query", json=query_fixture)
    assert r.status_code == 200
    body = r.get_data(as_text=True)
    # default format = pretty table; timestamp 1761318000019000 us
    # = 2025-10-24T15:00:00.019 UTC
    assert "| 2025-10-24T15:00:00.019 | 50    |" in body


# ---------------------------------------- multi-table mode (round 2)


def _w(client, ns, meas, value, ts, tags=None):
    assert (
        client.post(
            "/api/v1/write",
            json={
                "namespace": ns,
                "measurement": meas,
                "value": value,
                "metadata": tags or {},
                "timestamp": ts,
            },
        ).status_code
        == 200
    )


def test_join_rejected_by_default(client):
    """Reference parity: only the first FROM table is registered, so a
    JOIN's second table fails analysis -> 500."""
    _w(client, "ns", "cpu", "1", 1, {"host": "a"})
    _w(client, "ns", "mem", "2", 1, {"host": "a"})
    r = client.post(
        "/api/v1/query",
        json={
            "namespace": "ns",
            "query": "SELECT c.value FROM cpu c JOIN mem m ON c.host = m.host",
        },
    )
    assert r.status_code == 500


@pytest.fixture()
def multi_client(spark, tmp_path):
    app = create_app(
        LynxEngine(spark, tmp_path / "wal", multi_table=True)
    )
    return app.test_client()


def test_multi_table_join_behind_flag(multi_client):
    _w(multi_client, "ns", "cpu", "90", 1, {"host": "a"})
    _w(multi_client, "ns", "cpu", "10", 2, {"host": "b"})
    _w(multi_client, "ns", "mem", "512", 1, {"host": "a"})
    r = multi_client.post(
        "/api/v1/query",
        json={
            "namespace": "ns",
            "query": "SELECT c.value AS cpu, m.value AS mem "
            "FROM cpu c JOIN mem m ON c.host = m.host",
            "format": "Json",
        },
    )
    assert r.status_code == 200
    assert json.loads(r.get_data()) == [{"cpu": "90", "mem": "512"}]
    # 404 semantics unchanged: unknown namespace / first table
    assert (
        multi_client.post(
            "/api/v1/query",
            json={"namespace": "nope", "query": "SELECT * FROM cpu"},
        ).status_code
        == 404
    )
    assert (
        multi_client.post(
            "/api/v1/query",
            json={"namespace": "ns", "query": "SELECT * FROM gpu"},
        ).status_code
        == 404
    )


def test_multi_table_no_cross_namespace_leak(multi_client):
    """A table registered by an earlier query of another namespace must
    not satisfy a later namespace's JOIN (stale temp view sweep)."""
    _w(multi_client, "ns1", "cpu", "a", 1, {"host": "h"})
    _w(multi_client, "ns1", "disk", "d", 1, {"host": "h"})
    _w(multi_client, "ns2", "cpu", "b", 1, {"host": "h"})
    # register ns1.disk via a ns1 query
    assert (
        multi_client.post(
            "/api/v1/query",
            json={"namespace": "ns1", "query": "SELECT * FROM disk"},
        ).status_code
        == 200
    )
    # ns2 has no disk: the JOIN must fail, not read ns1's stale view
    r = multi_client.post(
        "/api/v1/query",
        json={
            "namespace": "ns2",
            "query": "SELECT c.value FROM cpu c JOIN disk x ON c.host = x.host",
        },
    )
    assert r.status_code == 500


def test_multi_table_tiered_joins_hot_and_cold(spark, tmp_path):
    """Multi-table mode over the tiered engine: one side flushed cold,
    the other hot."""
    eng = TieredEngine(
        spark, tmp_path / "wal", tmp_path / "cold", multi_table=True
    )
    c = create_app(eng).test_client()
    _w(c, "ns", "cpu", "90", 1, {"host": "a"})
    assert c.post("/api/v1/flush", json={"namespace": "ns"}).status_code == 200
    _w(c, "ns", "mem", "512", 1, {"host": "a"})
    r = c.post(
        "/api/v1/query",
        json={
            "namespace": "ns",
            "query": "SELECT c.value AS cpu, m.value AS mem "
            "FROM cpu c JOIN mem m ON c.host = m.host",
            "format": "Json",
        },
    )
    assert r.status_code == 200
    assert json.loads(r.get_data()) == [{"cpu": "90", "mem": "512"}]


def test_cte_and_derived_tables_behind_flag(multi_client):
    """Multi-table mode also relaxes the parse_select restriction for
    read statements: WITH/CTE and derived tables run; INSERT stays
    rejected; a CTE touching no table of the namespace is 404."""
    _w(multi_client, "ns", "cpu", "90", 1, {"host": "a"})
    _w(multi_client, "ns", "cpu", "10", 2, {"host": "b"})
    r = multi_client.post(
        "/api/v1/query",
        json={
            "namespace": "ns",
            "query": "WITH hot AS (SELECT * FROM cpu WHERE value > '50') "
            "SELECT count(*) AS n FROM hot",
            "format": "Json",
        },
    )
    assert r.status_code == 200
    assert json.loads(r.get_data()) == [{"n": 1}]
    r = multi_client.post(
        "/api/v1/query",
        json={
            "namespace": "ns",
            "query": "SELECT max(value) AS m FROM (SELECT value FROM cpu) t",
            "format": "Json",
        },
    )
    assert r.status_code == 200
    assert json.loads(r.get_data()) == [{"m": "90"}]
    # writes rejected in every mode
    assert (
        multi_client.post(
            "/api/v1/query",
            json={"namespace": "ns", "query": "INSERT INTO cpu VALUES (1)"},
        ).status_code
        == 500
    )
    # CTE referencing nothing in this namespace -> 404 like unknown table
    assert (
        multi_client.post(
            "/api/v1/query",
            json={
                "namespace": "ns",
                "query": "WITH x AS (SELECT 1 AS a) SELECT * FROM x",
            },
        ).status_code
        == 404
    )


def test_cte_still_rejected_by_default(client):
    _w(client, "ns", "cpu", "1", 1)
    assert (
        client.post(
            "/api/v1/query",
            json={
                "namespace": "ns",
                "query": "WITH h AS (SELECT * FROM cpu) SELECT * FROM h",
            },
        ).status_code
        == 500
    )


def test_multi_table_mixed_case_table_names(multi_client):
    """r2 review: the catalog lowercases view names; the stale-view
    sweep must not drop the views the query just registered for a
    mixed-case measurement."""
    _w(multi_client, "ns", "CpuLoad", "1", 1, {"host": "a"})
    _w(multi_client, "ns", "MemUse", "2", 1, {"host": "a"})
    r = multi_client.post(
        "/api/v1/query",
        json={
            "namespace": "ns",
            "query": "SELECT c.value AS a, m.value AS b FROM CpuLoad c "
            "JOIN MemUse m ON c.host = m.host",
            "format": "Json",
        },
    )
    assert r.status_code == 200
    assert json.loads(r.get_data()) == [{"a": "1", "b": "2"}]


def test_multi_table_404_vs_500_matrix(spark, tmp_path):
    """VERDICT r11 task 6: the full status matrix under multi-table
    mode, pinned over the TIERED engine (hot + cold both populated) so
    the flag's semantics can't drift from the reference's single-table
    contract (main.rs:83: unknown namespace/first-table -> 404; any
    analysis/exec error, including an unknown JOINED table -> 500)."""
    eng = TieredEngine(
        spark, tmp_path / "wal", tmp_path / "cold", multi_table=True
    )
    c = create_app(eng).test_client()
    _w(c, "ns", "cpu", "90", 1, {"host": "a"})
    assert c.post("/api/v1/flush", json={"namespace": "ns"}).status_code == 200
    _w(c, "ns", "mem", "512", 1, {"host": "a"})

    def q(ns, sql):
        return c.post(
            "/api/v1/query", json={"namespace": ns, "query": sql}
        ).status_code

    join = "SELECT c.value FROM cpu c JOIN mem m ON c.host = m.host"
    # both tables known (one cold, one hot) -> 200
    assert q("ns", join) == 200
    # unknown namespace -> 404 (not empty, not 500)
    assert q("nope", join) == 404
    # unknown FIRST table -> 404 (the reference's addressed table)
    assert q("ns", "SELECT * FROM gpu") == 404
    assert q("ns", "SELECT g.value FROM gpu g JOIN mem m ON g.host = m.host") == 404
    # known first table, unknown JOINED table -> 500 (analysis error,
    # exactly what the reference returns when DataFusion can't resolve)
    assert q("ns", "SELECT c.value FROM cpu c JOIN gpu g ON c.host = g.host") == 500
    # non-SELECT still rejected -> 500
    assert q("ns", "INSERT INTO cpu VALUES (1)") == 500
    # and the same sweep finds nothing stale: a second good join -> 200
    assert q("ns", join) == 200


def test_write_fastpath_semantics_match_flask_route(client):
    """r14 (VERDICT r13 task 4): the write route is handled by a WSGI
    fast lane; its parse/validate/error semantics must be identical to
    the Flask route it bypasses, and anything unusual must fall
    through to Flask unchanged."""
    # happy path through the fast lane (Content-Length + JSON type)
    r = client.post(
        "/api/v1/write",
        data=json.dumps(WRITE),
        content_type="application/json",
    )
    assert r.status_code == 200
    # malformed JSON body -> 500 (fast lane's own catch)
    r = client.post(
        "/api/v1/write", data="{nope", content_type="application/json"
    )
    assert r.status_code == 500
    # missing field -> 500 (same from_json_dict validation)
    bad = dict(WRITE)
    del bad["timestamp"]
    r = client.post(
        "/api/v1/write", data=json.dumps(bad),
        content_type="application/json",
    )
    assert r.status_code == 500
    # non-JSON content type falls through to Flask -> 500 (get_json
    # raises UnsupportedMediaType inside the route's catch-all)
    r = client.post(
        "/api/v1/write", data=json.dumps(WRITE), content_type="text/plain"
    )
    assert r.status_code == 500
    # the fast lane never swallows other routes
    assert client.get("/health").status_code == 200
    r = client.post(
        "/api/v1/query",
        json={"namespace": "events", "query": "SELECT * FROM clicks",
              "format": "Json"},
    )
    assert r.status_code == 200
    assert json.loads(r.get_data())[0]["value"] == "search_button"
