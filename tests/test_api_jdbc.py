"""API facade behaviors + JDBC sink option/DDL construction."""

import os

import pytest
from pyspark.sql import types as T

from priority_data_pipeline_postgres_db_spark.api import EngineApi, parse_bool
from priority_data_pipeline_postgres_db_spark.functions.typemap import entity_struct
from priority_data_pipeline_postgres_db_spark.sources.jdbc import PostgresSink

from test_pipeline import entity, make_pipeline


def test_parse_bool_strict():
    assert parse_bool("true") and parse_bool("TRUE") and parse_bool(True)
    assert not parse_bool("false")
    # the reference's substring quirk ('t' in 'true' → True) must NOT pass
    for bad in ("t", "ru", "", "yes", "1"):
        with pytest.raises(ValueError):
            parse_bool(bad)


@pytest.fixture
def api(spark, tmp_path, sf_dir):
    p = make_pipeline(spark, str(tmp_path), sf_dir, [entity("EVENTS")])
    return EngineApi(p, p.control, info={"engine": "priority_data_pipeline_postgres_db_spark"})


def test_endpoints(api):
    assert api.info() == {"engine": "priority_data_pipeline_postgres_db_spark"}
    ping = api.ping()
    assert ping["controlStore"] and ping["source"] and ping["warehouse"]
    cfg = api.get_extraction_config("ds1")
    assert cfg["entities"][0]["EntityID"] == "EVENTS"
    with pytest.raises(ValueError):
        api.get_extraction_config("")
    out = api.refresh_data("false")
    assert out["stgDataWritten"][0]["records_written"] > 0
    assert not out["errors"]
    with pytest.raises(ValueError):
        api.refresh_data("t")


def test_jdbc_options_and_ddl():
    sink = PostgresSink("pg.example", 5432, "dwh", "u", "p", write_partitions=4)
    opts = sink.options("ORDERS")
    assert opts["url"] == "jdbc:postgresql://pg.example:5432/dwh"
    assert opts["dbtable"] == "stg_orders"
    assert opts["numPartitions"] == "4"
    assert opts["reWriteBatchedInserts"] == "true"

    schema = entity_struct(
        [
            {"fieldName": "ORDNAME", "SourceDataType": "Edm.String", "KeyFlag": True},
            {"fieldName": "QPRICE", "SourceDataType": "Edm.Decimal", "KeyFlag": False},
            {"fieldName": "CURDATE", "SourceDataType": "Edm.DateTimeOffset", "KeyFlag": False},
        ]
    )
    ddl = sink.create_table_sql("ORDERS", schema)
    assert ddl.startswith('CREATE TABLE IF NOT EXISTS "stg_orders"')
    assert '"ordname" VARCHAR(255) NOT NULL' in ddl
    assert '"qprice" NUMERIC' in ddl
    assert '"curdate" TIMESTAMP' in ddl
    assert '"extractionid" VARCHAR' in ddl
    assert 'PRIMARY KEY ("ordname")' in ddl
