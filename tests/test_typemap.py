"""Type-map semantics (SURVEY.md §1.3; reference static/datatypesConvert.json,
sqlDwh.py:348-365, priorityDataSource.py:538-542)."""

from pyspark.sql import types as T

from priority_data_pipeline_postgres_db_spark.functions.typemap import (
    AUDIT_ID_COL,
    AUDIT_TS_COL,
    entity_struct,
    lookup_spark_type,
    lookup_target_name,
    struct_to_postgres_ddl,
)


def test_lookup_matches_reference_mapping():
    assert lookup_spark_type("Priority", "Edm.String") == T.StringType()
    assert lookup_spark_type("priority", "Edm.Decimal") == T.DecimalType(38, 18)
    assert lookup_spark_type("priority", "Edm.DateTimeOffset") == T.TimestampType()
    assert lookup_spark_type("priority", "Edm.Int64") == T.LongType()
    assert lookup_spark_type("SBO", "SBO_text") == T.StringType()
    assert lookup_spark_type("SBO", "SBO_num") == T.StringType()


def test_unmatched_type_maps_to_none():
    # first-match-or-None (priorityDataSource.py:538-542)
    assert lookup_spark_type("priority", "Edm.Guid") is None
    assert lookup_target_name("nosuch", "Edm.String") is None


def test_mysql_legacy_mapping_field_for_field():
    """Both target columns of the reference's mapping docs
    (static/datatypesConvert.json:1-50: MySQLDatatype + postgresDatatype)
    are carried, value-for-value."""
    expected = {
        ("Priority", "Edm.String"): ("TEXT(255)", "VARCHAR"),
        ("Priority", "Edm.Decimal"): ("Numeric(scale=3)", "NUMERIC"),
        ("Priority", "Edm.DateTimeOffset"): ("DateTime", "TIMESTAMP"),
        ("Priority", "Edm.Int64"): ("BigInteger", "BIGINT"),
        ("SBO", "SBO_text"): ("TEXT(255)", "VARCHAR(255)"),
        ("SBO", "SBO_num"): ("TEXT(255)", "VARCHAR(255)"),
    }
    for (system, src_type), (mysql, pg) in expected.items():
        assert lookup_target_name(system, src_type, dialect="mysql") == mysql
        assert lookup_target_name(system, src_type) == pg
    assert lookup_target_name("priority", "Edm.Guid", dialect="mysql") is None


def test_pk_force_coerced_to_string():
    # sqlDwh.py:348-350 — Int64 key becomes a string PK
    fields = [
        {"fieldName": "ORD", "SourceDataType": "Edm.Int64", "KeyFlag": True},
        {"fieldName": "QPRICE", "SourceDataType": "Edm.Decimal", "KeyFlag": False},
    ]
    st = entity_struct(fields, with_audit=False)
    assert st["ord"].dataType == T.StringType()
    assert not st["ord"].nullable
    assert st["qprice"].dataType == T.DecimalType(38, 18)


def test_audit_columns_appended_and_lowercased():
    fields = [{"fieldName": "ORDNAME", "SourceDataType": "Edm.String", "KeyFlag": True}]
    st = entity_struct(fields)
    names = st.fieldNames()
    assert names == ["ordname", AUDIT_ID_COL, AUDIT_TS_COL]
    assert st[AUDIT_TS_COL].dataType == T.TimestampType()


def test_unmatched_source_type_degrades_to_string_in_struct():
    fields = [{"fieldName": "X", "SourceDataType": "Edm.Guid", "KeyFlag": False}]
    st = entity_struct(fields, with_audit=False)
    assert st["x"].dataType == T.StringType()


def test_mysql_ddl_pk_varchar255():
    from priority_data_pipeline_postgres_db_spark.functions.typemap import struct_to_mysql_ddl

    fields = [
        {"fieldName": "ORD", "SourceDataType": "Edm.Int64", "KeyFlag": True},
        {"fieldName": "QPRICE", "SourceDataType": "Edm.Decimal", "KeyFlag": False},
        {"fieldName": "CURDATE", "SourceDataType": "Edm.DateTimeOffset", "KeyFlag": False},
    ]
    ddl = struct_to_mysql_ddl(entity_struct(fields), "stg_orders")
    assert "`ord` VARCHAR(255) NOT NULL" in ddl
    assert "`qprice` DECIMAL(38,18)" in ddl
    assert "`curdate` DATETIME" in ddl
    assert "PRIMARY KEY (`ord`)" in ddl
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS `stg_orders`")


def test_postgres_ddl_pk_varchar255():
    fields = [
        {"fieldName": "ORD", "SourceDataType": "Edm.Int64", "KeyFlag": True},
        {"fieldName": "QPRICE", "SourceDataType": "Edm.Decimal", "KeyFlag": False},
    ]
    ddl = struct_to_postgres_ddl(entity_struct(fields), "stg_orders")
    assert '"ord" VARCHAR(255) NOT NULL' in ddl
    assert '"qprice" NUMERIC' in ddl
    assert 'PRIMARY KEY ("ord")' in ddl
    assert ddl.startswith('CREATE TABLE IF NOT EXISTS "stg_orders"')
