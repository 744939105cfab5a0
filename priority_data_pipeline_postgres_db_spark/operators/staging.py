"""Staging sink — K1 (reference: priorityDataSource.py:847-889).

``stg_<table>`` landing tables written append (incremental) or overwrite
(full refresh), the reference's ``if_exists='append'|'replace'`` semantics.

Physical format is parquet under a warehouse directory (the JDBC-parity
Postgres sink lives in sources.jdbc).  Writes avoid unnecessary shuffles:
the incoming frame's partitioning is preserved; ``overwrite`` uses dynamic
mode so full refreshes of one entity never touch sibling tables.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

STG_PREFIX = "stg_"


@dataclass
class WriteReport:
    """Per-entity run report entry (priorityDataSource.py:209-215)."""

    entity_name: str
    table_name: str
    records_written: int


class StagingWarehouse:
    """Parquet-backed staging area with the reference's naming contract:
    table ``X`` lands in ``stg_x`` (priorityDataSource.py:884), database per
    account ``acc_<accountID>`` (priorityDataSource.py:64 — dash swapped for
    underscore: Spark namespaces disallow ``-``)."""

    def __init__(self, spark: SparkSession, root: str, account_id: str = "local"):
        self.spark = spark
        self.root = root
        self.account_id = account_id

    def _path(self, table_name: str) -> str:
        return os.path.join(self.root, f"acc_{self.account_id}", STG_PREFIX + table_name.lower())

    def write(
        self,
        df: DataFrame,
        table_name: str,
        *,
        incremental: bool,
        entity_name: str | None = None,
        partition_by: list[str] | None = None,
    ) -> WriteReport:
        """Append (incremental) or overwrite (full refresh) — K1.

        ``entity_name`` defaults to the table name; subform children pass
        the suffixed form so the report keeps the reference's naming
        contract (entityName carries ``_subform``, tableName doesn't —
        priorityDataSource.py:803-806).

        ``partition_by`` lays the table out hive-partitioned (typically a
        derived date column): downstream time-bounded scans prune whole
        directories, and incremental appends land as new partitions — the
        standard DWH layout for a 100 TB landing zone."""
        mode = "append" if incremental else "overwrite"
        path = self._path(table_name)
        before = self.spark.read.parquet(path).count() if incremental and os.path.isdir(path) else 0
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        # count what actually LANDED from the written files — parquet
        # counts are footer-metadata-only. (Re-counting the input frame
        # would re-execute the whole source read — a second full OData
        # fetch per entity in production.)
        n = self.spark.read.parquet(path).count() - before
        return WriteReport(entity_name or table_name, STG_PREFIX + table_name.lower(), n)

    def read(self, table_name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table_name))

    def exists(self, table_name: str) -> bool:
        return os.path.isdir(self._path(table_name))

    def tables(self) -> list[str]:
        acc = os.path.join(self.root, f"acc_{self.account_id}")
        if not os.path.isdir(acc):
            return []
        return sorted(d for d in os.listdir(acc) if d.startswith(STG_PREFIX))

    def drop_all(self) -> list[str]:
        """K4 — full teardown (sqlDwh.py:85-123); returns dropped names."""
        import shutil

        dropped = self.tables()
        acc = os.path.join(self.root, f"acc_{self.account_id}")
        if os.path.isdir(acc):
            shutil.rmtree(acc)
        return dropped
