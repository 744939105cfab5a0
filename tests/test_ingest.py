"""Ingest operators: audit cols, lowercasing, watermark predicate, subform
split/nest round trip (SURVEY.md §2.2/§2.3; reference
priorityDataSource.py:740-816). Fixture mirrors FIXTURES.md B3."""

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.ingest import (
    ExtractionRun,
    lowercase_columns,
    nest_subform,
    split_subforms,
    subform_columns,
    watermark_predicate,
    with_audit_columns,
)

RUN = ExtractionRun(run_id="test-run", run_ts=datetime(2026, 1, 1, 0, 0, 0))


def nested_orders(spark):
    """FIXTURES.md B3 payload: 2 orders, one with 2 items, one with none."""
    rows = [
        Row(
            ORDNAME="SO25000001",
            CUSTNAME="C001",
            QPRICE=1200.5,
            ORDERITEMS_SUBFORM=[
                Row(KLINE=1, PARTNAME="P-100", TQUANT=2.0, PRICE=600.25),
                Row(KLINE=2, PARTNAME="P-200", TQUANT=1.0, PRICE=0.0),
            ],
        ),
        Row(ORDNAME="SO25000002", CUSTNAME="C002", QPRICE=0.0, ORDERITEMS_SUBFORM=[]),
    ]
    return spark.createDataFrame(rows)


def test_audit_columns(spark):
    df = with_audit_columns(spark.range(3), RUN)
    got = df.select("extractionid", "extractiontimestamputc").distinct().collect()
    assert len(got) == 1
    assert got[0][0] == "test-run"
    assert got[0][1] == datetime(2026, 1, 1, 0, 0, 0)


def test_lowercase_columns(spark):
    df = lowercase_columns(spark.createDataFrame([Row(ORDNAME="x", CurDate=1)]))
    assert df.columns == ["ordname", "curdate"]


def test_subform_column_discovery(spark):
    df = nested_orders(spark)
    assert subform_columns(df) == ["ORDERITEMS_SUBFORM"]


def test_split_subforms_shapes(spark):
    df = nested_orders(spark)
    parts = split_subforms(df, "ORDERS", ["ORDNAME"], RUN)
    by_table = {p.table_name: p for p in parts}
    assert set(by_table) == {"orders", "orderitems"}
    # naming contract: entity keeps _subform suffix, table doesn't
    assert by_table["orderitems"].entity_name == "orderitems_subform"

    parent = by_table["orders"].df
    assert "orderitems_subform" not in parent.columns
    assert parent.count() == 2
    assert "extractionid" in parent.columns

    child = by_table["orderitems"].df
    # 2 child rows (empty subform contributes none), parent PK propagated
    assert child.count() == 2
    assert "ordname" in child.columns
    got = {r["kline"]: r for r in child.collect()}
    assert got[1]["ordname"] == "SO25000001"
    assert got[1]["partname"] == "P-100"
    assert got[2]["price"] == 0.0
    assert got[1]["extractionid"] == "test-run"


def test_nest_then_split_roundtrip(spark, orders, lineitem):
    """Build the $expand shape from flat driver tables, split it back, and
    check the child frame equals the original join (FIXTURES.md A)."""
    li = lineitem.withColumnRenamed("l_orderkey", "o_orderkey").limit(500)
    nested = nest_subform(orders, li, ["o_orderkey"], "ITEMS_SUBFORM")
    assert subform_columns(nested) == ["ITEMS_SUBFORM"]
    parts = split_subforms(nested, "ORDERS", ["o_orderkey"], RUN)
    child = {p.table_name: p.df for p in parts}["items"]
    assert child.count() == li.count()
    # empty arrays must not produce child rows
    assert child.where(F.col("l_linenumber").isNull()).count() == 0


def test_watermark_predicate_utc(spark, orders):
    # testdata orders span 1995-2001; boundary mid-range so both sides
    # are non-empty and the comparison is meaningful
    pred = watermark_predicate("o_orderdate", "1998-01-01 00:00:00")
    n_pred = orders.filter(pred).count()
    n_direct = orders.filter(F.col("o_orderdate") >= "1998-01-01").count()
    total = orders.count()
    assert n_pred == n_direct
    assert 0 < n_pred < total


def test_watermark_predicate_timezone_shift(spark):
    """Boundary interpreted in the system TZ: 2024-06-01 00:00 Israel time
    is 2024-05-31 21:00 UTC, so a row at 22:00 UTC passes."""
    df = spark.createDataFrame(
        [Row(ts=datetime(2024, 5, 31, 22, 0, 0))]
    )
    pred_tz = watermark_predicate("ts", "2024-06-01 00:00:00", "Israel")
    pred_naive = watermark_predicate("ts", "2024-06-01 00:00:00")
    assert df.filter(pred_tz).count() == 1
    assert df.filter(pred_naive).count() == 0
