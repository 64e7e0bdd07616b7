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
