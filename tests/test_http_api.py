"""HTTP binding: the 8 reference routes (app.py:65-264) served 1:1 over
EngineApi, driven end-to-end through Flask's test client against the
parquet-backed fake tenant."""

import pytest

flask = pytest.importorskip("flask")

from priority_data_pipeline_postgres_db_spark.api import EngineApi
from priority_data_pipeline_postgres_db_spark.http_api import create_app
from test_pipeline import entity, make_pipeline


@pytest.fixture()
def client(spark, tmp_path, sf_dir):
    p = make_pipeline(
        spark,
        str(tmp_path),
        sf_dir,
        [entity("EVENTS", filterFlag=True, filterField="ts", lastRun="2024-01-20 00:00:00")],
    )
    api = EngineApi(p, p.control, info={"engine": "priority_data_pipeline_postgres_db_spark"})
    app = create_app(api)
    app.config.update(TESTING=True)
    with app.test_client() as c:
        yield c, p


def test_refresh_data_end_to_end(client):
    c, p = client
    body = {"datasourceId": "ds1"}

    r = c.post("/initialDataLoad", json=body)
    assert r.status_code == 200
    assert r.get_json()["initialDataLoad"]["errors"] == []
    n_full = p.warehouse.read("events").count()
    assert n_full > 0

    r = c.post("/refreshData?incremental=true", json=body)
    assert r.status_code == 200
    payload = r.get_json()["refreshData"]
    assert payload["errors"] == []
    assert [w["table_name"] for w in payload["stgDataWritten"]] == ["stg_events"]
    # incremental window appended on top of the full load
    assert p.warehouse.read("events").count() == n_full + payload["stgDataWritten"][0][
        "records_written"
    ]


def test_get_routes_and_config_contract(client):
    c, _ = client
    assert c.get("/info").get_json() == {"engine": "priority_data_pipeline_postgres_db_spark"}

    ping = c.get("/pingApi").get_json()
    assert ping["controlStore"] and ping["source"] and ping["warehouse"]

    probe = c.get("/testExtractionconfigEntities").get_json()
    assert probe == [{"entity": "EVENTS", "ok": True}]

    # the datasourceId-body contract (app.py:33-59): 400 + the reference's
    # exact error message without it
    r = c.get("/extractionConfig")
    assert r.status_code == 400
    assert "datasourceId" in r.get_json()["error message"]
    cfg = c.get("/extractionConfig", json={"datasourceId": "ds1"})
    assert cfg.status_code == 200
    assert cfg.get_json()["entities"][0]["EntityID"] == "EVENTS"
    assert c.get("/extractionConfig", json={"datasourceId": "nope"}).status_code == 404


def test_post_config_roundtrip_and_strict_bool(client):
    c, p = client
    new_cfg = dict(p.control.latest_config("ds1"))
    new_cfg["systemTimezone"] = "Asia/Jerusalem"
    r = c.post("/extractionConfig", json={**new_cfg, "datasourceId": "ds1"})
    assert r.status_code == 200
    assert p.control.latest_config("ds1")["systemTimezone"] == "Asia/Jerusalem"

    # strict boolean parse (SURVEY.md §2.9): the reference's substring test
    # would treat 'ru' as True; here it's a 400, not a silent full load
    r = c.post("/refreshData?incremental=ru", json={"datasourceId": "ds1"})
    assert r.status_code == 400
    # and the missing-body contract holds on lifecycle POSTs
    assert c.post("/refreshData").status_code == 400
    assert c.post("/resetDataPlatform").status_code == 400
