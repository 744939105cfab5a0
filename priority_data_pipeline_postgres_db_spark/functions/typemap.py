"""EDM → Spark type mapping (reference parity for the datatype-convert map).

Reproduces the semantics of the reference's type-mapping collection
(reference: static/datatypesConvert.json:1-50, applied at
priorityDataSource.py:528-542) as a closed dict — no ``eval`` of type-name
strings (the reference evals SQLAlchemy symbols at sqlDwh.py:352).

Rules reproduced:

- lookup key is ``(sourceSystem, SourceDataType)``; the first match wins and
  unmatched types map to ``None`` (priorityDataSource.py:538-542),
- primary-key columns are force-coerced to strings regardless of mapped type
  (sqlDwh.py:348-350) — load-bearing for downstream join keys,
- every table gets ``extractionid`` / ``extractiontimestamputc`` audit
  columns (sqlDwh.py:360-365),
- all identifiers are lowercased (sqlDwh.py:218-222).
"""

from __future__ import annotations

from pyspark.sql import types as T

AUDIT_ID_COL = "extractionid"
AUDIT_TS_COL = "extractiontimestamputc"

# (sourceSystem lower, SourceDataType) -> Spark type.
# NUMERIC in Postgres is unconstrained; DecimalType(38,18) is the widest
# Spark equivalent that still round-trips through parquet.
EDM_TYPE_MAP: dict[tuple[str, str], T.DataType] = {
    ("priority", "Edm.String"): T.StringType(),
    ("priority", "Edm.Decimal"): T.DecimalType(38, 18),
    ("priority", "Edm.DateTimeOffset"): T.TimestampType(),
    ("priority", "Edm.Int64"): T.LongType(),
    ("sbo", "SBO_text"): T.StringType(),
    ("sbo", "SBO_num"): T.StringType(),
}

# Postgres DDL names for the JDBC-parity sink (what the reference's
# datatypesConvert.json calls postgresDatatype).
EDM_POSTGRES_MAP: dict[tuple[str, str], str] = {
    ("priority", "Edm.String"): "VARCHAR",
    ("priority", "Edm.Decimal"): "NUMERIC",
    ("priority", "Edm.DateTimeOffset"): "TIMESTAMP",
    ("priority", "Edm.Int64"): "BIGINT",
    ("sbo", "SBO_text"): "VARCHAR(255)",
    ("sbo", "SBO_num"): "VARCHAR(255)",
}

# MySQL legacy target names (datatypesConvert.json MySQLDatatype field,
# static/datatypesConvert.json:1-50) — the reference keeps both columns in
# each mapping doc; full parity means carrying both here.  Values are the
# reference's SQLAlchemy-flavored names verbatim (it evals them as
# SQLAlchemy symbols at sqlDwh.py:352 — we only report them).
EDM_MYSQL_MAP: dict[tuple[str, str], str] = {
    ("priority", "Edm.String"): "TEXT(255)",
    ("priority", "Edm.Decimal"): "Numeric(scale=3)",
    ("priority", "Edm.DateTimeOffset"): "DateTime",
    ("priority", "Edm.Int64"): "BigInteger",
    ("sbo", "SBO_text"): "TEXT(255)",
    ("sbo", "SBO_num"): "TEXT(255)",
}


def lookup_spark_type(source_system: str, source_type: str) -> T.DataType | None:
    """First-match-or-None lookup (priorityDataSource.py:538-542)."""
    return EDM_TYPE_MAP.get((source_system.lower(), source_type))


def lookup_target_name(source_system: str, source_type: str, *, dialect: str = "postgres") -> str | None:
    table = EDM_MYSQL_MAP if dialect == "mysql" else EDM_POSTGRES_MAP
    return table.get((source_system.lower(), source_type))


def entity_struct(
    fields: list[dict],
    *,
    source_system: str = "priority",
    with_audit: bool = True,
) -> T.StructType:
    """Build the landing StructType for one entity's metadata field list.

    ``fields`` entries carry ``fieldName`` / ``SourceDataType`` / ``KeyFlag``
    (the shape produced by sources.metadata.parse_edmx and mirrored from the
    reference's metadata docs, readme.md:518-551).  Key fields become
    StringType regardless of source type (sqlDwh.py:348-350); unmatched
    source types degrade to StringType rather than None so ingestion never
    drops data.  KeyFlag and descriptions ride along in StructField.metadata.
    """
    out: list[T.StructField] = []
    for f in fields:
        name = f["fieldName"].lower()
        if f.get("KeyFlag"):
            dtype: T.DataType = T.StringType()
        else:
            dtype = lookup_spark_type(source_system, f["SourceDataType"]) or T.StringType()
        # sourceField preserves the source-system casing: identifiers are
        # lowercased engine-side (P4) but the OData JSON keys keep original
        # case — readers map back through this
        md = {
            "keyFlag": bool(f.get("KeyFlag")),
            "sourceDataType": f["SourceDataType"],
            "sourceField": f["fieldName"],
        }
        if f.get("desc"):
            md["desc"] = f["desc"]
        out.append(T.StructField(name, dtype, nullable=not f.get("KeyFlag"), metadata=md))
    if with_audit:
        out.append(T.StructField(AUDIT_ID_COL, T.StringType(), True))
        out.append(T.StructField(AUDIT_TS_COL, T.TimestampType(), True))
    return T.StructType(out)


_SPARK_TO_PG = {
    "string": "VARCHAR",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "boolean": "BOOLEAN",
}

_SPARK_TO_MYSQL = {
    "string": "TEXT",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "timestamp": "DATETIME",
    "date": "DATE",
    "boolean": "TINYINT(1)",
}


def struct_to_mysql_ddl(schema: T.StructType, table: str) -> str:
    """CREATE TABLE DDL for the MySQL legacy dialect (the reference's
    mapping docs carry a MySQLDatatype column per type —
    static/datatypesConvert.json:1-50; the engine keeps both dialects).

    PK columns (keyFlag metadata) are VARCHAR(255) (MySQL TEXT can't be
    an unprefixed primary key), mirroring sqlDwh.py:348-350's
    force-to-string rule; everything else maps from the Spark type.
    """
    cols = []
    pk = []
    for f in schema.fields:
        if f.metadata.get("keyFlag"):
            cols.append(f"`{f.name}` VARCHAR(255) NOT NULL")
            pk.append(f"`{f.name}`")
            continue
        simple = f.dataType.simpleString()
        if simple.startswith("decimal"):
            my = "DECIMAL(38,18)"
        else:
            my = _SPARK_TO_MYSQL.get(simple, "TEXT")
        cols.append(f"`{f.name}` {my}")
    pk_clause = f", PRIMARY KEY ({', '.join(pk)})" if pk else ""
    return f"CREATE TABLE IF NOT EXISTS `{table}` ({', '.join(cols)}{pk_clause})"


def struct_to_postgres_ddl(schema: T.StructType, table: str) -> str:
    """CREATE TABLE IF NOT EXISTS DDL for the JDBC-parity sink.

    PK columns (keyFlag metadata) are VARCHAR(255), matching
    sqlDwh.py:348-350; everything else maps from the Spark type.
    """
    cols = []
    pk = []
    for f in schema.fields:
        if f.metadata.get("keyFlag"):
            cols.append(f'"{f.name}" VARCHAR(255) NOT NULL')
            pk.append(f'"{f.name}"')
            continue
        simple = f.dataType.simpleString()
        if simple.startswith("decimal"):
            pg = "NUMERIC"
        else:
            pg = _SPARK_TO_PG.get(simple, "VARCHAR")
        cols.append(f'"{f.name}" {pg}')
    pk_clause = f", PRIMARY KEY ({', '.join(pk)})" if pk else ""
    return f'CREATE TABLE IF NOT EXISTS "{table}" ({", ".join(cols)}{pk_clause})'
