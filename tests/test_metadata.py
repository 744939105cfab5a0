"""EDMX $metadata parse → schema registry (SURVEY.md §2.1 S5; reference
priorityDataSource.py:336-447). Fixture mirrors FIXTURES.md B2."""

import os

from pyspark.sql import types as T

from priority_data_pipeline_postgres_db_spark.sources.metadata import (
    SchemaRegistry,
    parse_edmx,
)

EDMX = """\
<edmx:Edmx xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx" Version="4.0">
 <edmx:DataServices><Schema xmlns="http://docs.oasis-open.org/odata/ns/edm">
  <EntityType Name="ORDERS">
   <Key><PropertyRef Name="ORDNAME"/></Key>
   <Property Name="ORDNAME" Type="Edm.String"><Annotation Term="Desc" String="Order ID"/></Property>
   <Property Name="CUSTNAME" Type="Edm.String"/>
   <Property Name="CURDATE" Type="Edm.DateTimeOffset"/>
   <Property Name="QPRICE" Type="Edm.Decimal"/>
   <Property Name="ORD" Type="Edm.Int64"/>
   <Annotation Term="Desc" String="Sales Orders"/>
  </EntityType>
  <EntityType Name="ORDERITEMS">
   <Key><PropertyRef Name="ORDNAME"/><PropertyRef Name="KLINE"/></Key>
   <Property Name="ORDNAME" Type="Edm.String"/>
   <Property Name="KLINE" Type="Edm.Int64"/>
   <Property Name="PARTNAME" Type="Edm.String"/>
   <Property Name="TQUANT" Type="Edm.Decimal"/>
   <Property Name="PRICE" Type="Edm.Decimal"/>
  </EntityType>
  <EntityType Name="CTYPE">
   <Property Name="CTYPECODE" Type="Edm.String"/>
  </EntityType>
 </Schema></edmx:DataServices>
</edmx:Edmx>
"""


def test_parse_three_entities():
    docs = parse_edmx(EDMX)
    assert [d["_id"] for d in docs] == ["ORDERS", "ORDERITEMS", "CTYPE"]


def test_entity_description_and_field_description():
    orders = parse_edmx(EDMX)[0]
    assert orders["desc"] == "Sales Orders"
    ordname = orders["Fields"][0]
    assert ordname["fieldName"] == "ORDNAME"
    assert ordname["desc"] == "Order ID"


def test_single_and_multi_key_extraction():
    docs = {d["_id"]: d for d in parse_edmx(EDMX)}
    assert docs["ORDERS"]["EntityPk"] == ["ORDNAME"]
    assert docs["ORDERITEMS"]["EntityPk"] == ["ORDNAME", "KLINE"]
    assert docs["CTYPE"]["EntityPk"] == []  # no Key element branch


def test_target_type_enrichment():
    orders = parse_edmx(EDMX)[0]
    by_name = {f["fieldName"]: f for f in orders["Fields"]}
    assert by_name["ORDNAME"]["targetDataType"] == "VARCHAR"
    assert by_name["QPRICE"]["targetDataType"] == "NUMERIC"
    assert by_name["CURDATE"]["targetDataType"] == "TIMESTAMP"
    assert by_name["ORD"]["targetDataType"] == "BIGINT"


def test_struct_pk_coercion_and_audit():
    reg = SchemaRegistry.from_edmx(EDMX)
    st = reg.struct("ORDERITEMS")
    # multi-field PK: both coerced to string (sqlDwh.py:348-350)
    assert st["ordname"].dataType == T.StringType()
    assert st["kline"].dataType == T.StringType()
    assert st["tquant"].dataType == T.DecimalType(38, 18)
    assert st.fieldNames()[-2:] == ["extractionid", "extractiontimestamputc"]
    assert reg.pk("ORDERITEMS") == ["ordname", "kline"]


def test_registry_roundtrip(tmp_path):
    reg = SchemaRegistry.from_edmx(EDMX)
    p = os.path.join(tmp_path, "registry.json")
    reg.save(p)
    reloaded = SchemaRegistry.load(p)
    assert len(reloaded) == 3
    assert reloaded.struct("ORDERS") == reg.struct("ORDERS")
