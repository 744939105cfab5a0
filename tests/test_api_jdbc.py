"""API facade behaviors + JDBC sink option/DDL construction."""

import os

import pytest
from pyspark.sql import types as T

from priority_data_pipeline_postgres_db_spark.api import EngineApi, parse_bool
from priority_data_pipeline_postgres_db_spark.functions.typemap import entity_struct
from priority_data_pipeline_postgres_db_spark.sources.jdbc import (
    PostgresSink,
    PostgresSource,
    partition_predicates,
)

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


# ---------------------------------------------------------------------------
# partitioned read source
# ---------------------------------------------------------------------------


def test_source_read_options_partitioned():
    src = PostgresSource("pg.example", 5432, "dwh", "u", "p", fetch_size=5000)
    opts = src.options(
        "stg_orders",
        partition_column="ord_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["url"] == "jdbc:postgresql://pg.example:5432/dwh"
    assert opts["dbtable"] == "stg_orders"
    assert opts["partitionColumn"] == "ord_id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "5000"
    assert opts["driver"] == "org.postgresql.Driver"


def test_source_options_require_all_partition_params():
    src = PostgresSource("pg.example", 5432, "dwh", "u", "p")
    with pytest.raises(ValueError, match="together"):
        src.options("t", partition_column="id", lower_bound=0)
    # no partitioning at all is fine (single-connection scan)
    opts = src.options("t")
    assert "partitionColumn" not in opts


def test_source_predicate_pushdown_subquery():
    src = PostgresSource("pg.example", 5432, "dwh", "u", "p")
    opts = src.options("stg_orders", predicate="curdate >= '2024-01-01'")
    assert (
        opts["dbtable"]
        == "(SELECT * FROM stg_orders WHERE curdate >= '2024-01-01') AS pushed"
    )


def test_source_bounds_probe_sql():
    src = PostgresSource("pg.example", 5432, "dwh", "u", "p")
    assert src.bounds_sql("stg_orders", "ord_id") == (
        "(SELECT min(ord_id) AS lo, max(ord_id) AS hi FROM stg_orders) AS bounds"
    )


def test_partition_predicates_stride_boundaries():
    # 4 partitions over [0, 100): stride 25; first clause catches NULLs and
    # everything below, last is open above — the clauses cover the whole table
    clauses = partition_predicates("id", 0, 100, 4)
    assert clauses == [
        "id < 25 or id is null",
        "id >= 25 AND id < 50",
        "id >= 50 AND id < 75",
        "id >= 75",
    ]


def test_partition_predicates_uneven_stride():
    # stride uses per-term integer division like Spark's columnPartition:
    # 10//3 - 0//3 = 3 → boundaries at 3, 6; remainder lands in the open tail
    assert partition_predicates("k", 0, 10, 3) == [
        "k < 3 or k is null",
        "k >= 3 AND k < 6",
        "k >= 6",
    ]


def test_partition_predicates_degenerate():
    assert partition_predicates("k", 0, 100, 1) == ["1=1"]
    with pytest.raises(ValueError):
        partition_predicates("k", 10, 10, 4)
    # more partitions than distinct values clamps, never empty strides
    clauses = partition_predicates("k", 0, 3, 8)
    assert len(clauses) == 3
    assert clauses[-1] == "k >= 2"


def test_partition_predicates_negative_bounds():
    clauses = partition_predicates("k", -100, 100, 2)
    assert clauses == ["k < 0 or k is null", "k >= 0"]
