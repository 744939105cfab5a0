"""Catalog / DDL lifecycle over the Spark catalog (SURVEY.md §2.6 K2-K4).

Reproduces the reference's table lifecycle as Spark-native DDL:

- database-per-account ``acc_<accountID>`` (sqlDwh.py:49-57 — the reference
  uses ``acc-<id>``; Spark namespaces disallow ``-`` so ``_``),
- CREATE TABLE IF NOT EXISTS from entity metadata docs with the PK→string
  coercion and audit columns (sqlDwh.py:300-370); existing tables are left
  untouched — no schema evolution, matching sqlDwh.py:392-414's
  "Table exists" semantics,
- success/exists/failed bucketing of the deploy report (sqlDwh.py:207-213),
- full teardown: drop all tables then the database (sqlDwh.py:85-123).

Tables are managed parquet (Delta isn't on the classpath in this image; the
DDL is format-agnostic). PK metadata is recorded in table properties since
Spark has no PK constraint — it's documentation, exactly as in the DWH.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..sources.metadata import SchemaRegistry

STG_PREFIX = "stg_"


def account_db(account_id: str) -> str:
    return "acc_" + account_id.lower().replace("-", "_")


@dataclass
class DeployReport:
    """sqlDwh.py:207-213's three buckets."""

    created: list[str] = field(default_factory=list)
    exists: list[str] = field(default_factory=list)
    failed: list[dict] = field(default_factory=list)


class SparkCatalogDwh:
    """The reference's sqlDwh surface on the Spark catalog."""

    def __init__(self, spark: SparkSession, account_id: str):
        self.spark = spark
        self.db = account_db(account_id)

    # -- K3 ---------------------------------------------------------------
    def create_db(self) -> None:
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.db}")

    def db_exists(self) -> bool:
        return self.spark.catalog.databaseExists(self.db)

    # -- K2 ---------------------------------------------------------------
    def table_exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(f"{self.db}.{table.lower()}")

    def create_table(self, entity: str, registry: SchemaRegistry, *, staging: bool = True) -> str:
        """CREATE TABLE IF NOT EXISTS from the entity's metadata doc.

        Returns 'created' | 'exists' (the reference returns "Table exists"
        and never alters, sqlDwh.py:392-414).
        """
        name = (STG_PREFIX + entity.lower()) if staging else entity.lower()
        if self.table_exists(name):
            return "exists"
        struct = registry.struct(entity)
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in struct.fields)
        pk = ", ".join(registry.pk(entity))
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.db}.{name} ({cols}) USING parquet "
            f"TBLPROPERTIES ('primary_key' = '{pk}')"
        )
        return "created"

    def deploy_tables(self, entities: list[str], registry: SchemaRegistry) -> DeployReport:
        """deployExtractionconfigTables (sqlDwh.py:176-215): create each
        entity's staging table, bucketing outcomes."""
        report = DeployReport()
        for entity in entities:
            try:
                if entity not in registry:
                    raise KeyError(f"no metadata for entity {entity}")
                outcome = self.create_table(entity, registry)
                (report.created if outcome == "created" else report.exists).append(
                    STG_PREFIX + entity.lower()
                )
            except Exception as ex:  # noqa: BLE001 — per-entity error report
                report.failed.append({"entity": entity, "error": str(ex)})
        return report

    # -- K4 ---------------------------------------------------------------
    def list_tables(self) -> list[str]:
        if not self.db_exists():
            return []
        return sorted(t.name for t in self.spark.catalog.listTables(self.db))

    def delete_tables(self) -> list[str]:
        """Drop every table/view in the account DB; returns dropped names
        (deleteTables, sqlDwh.py:85-123)."""
        dropped = []
        for t in self.list_tables():
            self.spark.sql(f"DROP TABLE IF EXISTS {self.db}.{t}")
            dropped.append(t)
        return dropped

    def drop_db(self) -> None:
        self.spark.sql(f"DROP DATABASE IF EXISTS {self.db} CASCADE")


class BucketedWarehouse(SparkCatalogDwh):
    """Bucketed managed tables: pre-shuffled storage so repeated joins and
    aggregations on the bucket key run with NO exchange (SCALE.md — the
    co-located-join story; at 100 TB the one-time bucketed write amortizes
    over every downstream join on that key)."""

    def write_bucketed(
        self,
        df,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 8,
        *,
        sort: bool = True,
    ) -> str:
        name = f"{self.db}.{table.lower()}"
        writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
        if sort:
            writer = writer.sortBy(*bucket_cols)
        writer.saveAsTable(name)
        return name

    def read_table(self, table: str):
        return self.spark.table(f"{self.db}.{table.lower()}")
