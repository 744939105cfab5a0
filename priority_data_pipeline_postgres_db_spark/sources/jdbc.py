"""JDBC parity sink — the reference's Postgres staging writes as Spark JDBC
(SURVEY.md §7 M5; reference priorityDataSource.py:847-889 via SQLAlchemy).

``df.write.format("jdbc")`` with the reference's semantics:

- table ``stg_<entity>`` (lowercase),
- append (incremental) vs overwrite-with-truncate (full refresh —
  ``truncate=true`` keeps the DDL/grants in place like pandas
  ``if_exists='replace'`` recreates it, minus the drop),
- DDL generated from the metadata StructType with PK→VARCHAR(255)
  coercion and audit columns (functions.typemap.struct_to_postgres_ddl),
- partitioned writes sized by ``batchsize`` / ``numPartitions`` — the
  reference single-threads one INSERT stream; Spark opens one connection
  per partition, which is the whole point at scale.

The Postgres driver jar is not on this image's classpath, so ``write``
raises a clear error if the driver is missing; option/DDL construction is
pure and unit-tested.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.typemap import struct_to_postgres_ddl

STG_PREFIX = "stg_"


@dataclass
class PostgresSink:
    host: str
    port: int
    database: str
    user: str
    password: str
    write_partitions: int = 8
    batch_size: int = 10_000

    @property
    def url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"

    def options(self, table: str) -> dict:
        return {
            "url": self.url,
            "dbtable": STG_PREFIX + table.lower(),
            "user": self.user,
            "password": self.password,
            "driver": "org.postgresql.Driver",
            "batchsize": str(self.batch_size),
            "numPartitions": str(self.write_partitions),
            # server-side prepared inserts; rewrite into multi-row VALUES
            "reWriteBatchedInserts": "true",
        }

    def create_table_sql(self, entity: str, schema: T.StructType) -> str:
        """CREATE TABLE IF NOT EXISTS with the reference's PK/audit rules."""
        return struct_to_postgres_ddl(schema, STG_PREFIX + entity.lower())

    def write(self, df: DataFrame, table: str, *, incremental: bool) -> None:
        """K1 over JDBC. append ≙ if_exists='append'; full refresh truncates
        and reloads (semantics of 'replace' without dropping DDL)."""
        writer = df.repartition(self.write_partitions).write.format("jdbc")
        for k, v in self.options(table).items():
            writer = writer.option(k, v)
        if incremental:
            writer.mode("append").save()
        else:
            writer.option("truncate", "true").mode("overwrite").save()
