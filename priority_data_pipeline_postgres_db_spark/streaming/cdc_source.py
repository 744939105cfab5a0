"""Structured Streaming source over a StagingWarehouse change feed —
``spark.readStream.format("staging_changes")`` (VERDICT r10 #6).

The polling CDC consumer (``k1_cdc_poll_cycle``: read
``table_changes(last_seen, newest)``, apply, advance the watermark)
re-expressed as a source Structured Streaming MANAGES: the consumer
offset is a batch id living in the checkpoint instead of the control
store, retried micro-batches replay EXACTLY (``readBetweenOffsets`` over
immutable committed batches), and downstream gets foreachBatch sinks /
watermarks / AvailableNow for free — the Structured Streaming twin of
the reference's refresh-every-N-minutes loop (priorityDataSource.py
lastRun), pointed at a warehouse table instead of an OData entity.

Semantics = the append-only change feed (``_table_changes_append``):
every committed batch is immutable, so the rows between two offsets are
EXACTLY the rows of batches in ``(start, end]`` — replay is exact by
construction, no log, no bookkeeping.  Offsets below a retention horizon
raise (same contract as ``table_changes``): the per-batch history is
folded and no longer addressable.

Options: ``root`` (warehouse root), ``table``, ``account`` (default
``local``), ``startafter`` (initial offset batch id — default '' =
everything ever committed).

Scale note, same as the OData stream reader: the Simple stream-reader
API prefetches each batch on the driver by design — right for the poll
tail (per-interval deltas read directly from the batch dirs via Arrow,
no Spark job).  Backfills should read the table through the warehouse's
batch path instead.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from ..operators.staging import (
    BASE_SUFFIX,
    BATCH_COL,
    SnapshotExpiredError,
    StagingWarehouse,
)

CHANGE_COL = "_change_type"

_ARROW_TO_DDL = {
    "int64": "long",
    "int32": "int",
    "int16": "short",
    "int8": "byte",
    "double": "double",
    "float": "float",
    "bool": "boolean",
    "string": "string",
    "large_string": "string",
    "date32[day]": "date",
    "binary": "binary",
    "large_binary": "binary",
}


def _arrow_ddl(field) -> str:
    t = str(field.type)
    if t in _ARROW_TO_DDL:
        return _ARROW_TO_DDL[t]
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("decimal"):
        return t.replace("decimal128", "decimal").replace("decimal64", "decimal")
    raise ValueError(
        f"staging_changes cannot map arrow type {t!r} of field "
        f"{field.name!r} — pass an explicit schema"
    )


class StagingChangesDataSource(DataSource):
    """``spark.readStream.format("staging_changes")`` — register with
    ``spark.dataSource.register(StagingChangesDataSource)``.  Without an
    explicit user schema, the schema is inferred from the newest
    committed batch's parquet footer (plus the ``_change_type``
    column)."""

    @classmethod
    def name(cls) -> str:
        return "staging_changes"

    def _warehouse(self) -> StagingWarehouse:
        # filesystem-only use: the listing/marker helpers never touch
        # the SparkSession slot
        return StagingWarehouse(
            None, self.options["root"], self.options.get("account", "local")
        )

    def schema(self) -> T.StructType | str:
        wh = self._warehouse()
        table = self.options["table"]
        live = [b for b in wh._live_ids(table) if not b.endswith(BASE_SUFFIX)]
        if not live:
            raise ValueError(
                f"staging_changes: table {table!r} has no committed batches "
                "to infer a schema from — pass an explicit schema"
            )
        import pyarrow.dataset as ds

        path = os.path.join(wh._path(table), f"{BATCH_COL}={live[-1]}")
        sch = ds.dataset(path, format="parquet").schema
        cols = [f"{f.name} {_arrow_ddl(f)}" for f in sch]
        return ", ".join(cols + [f"{CHANGE_COL} string"])

    def simpleStreamReader(self, schema: T.StructType):
        return StagingChangesStreamReader(schema, dict(self.options))


class StagingChangesStreamReader(SimpleDataSourceStreamReader):
    """Batch-id offsets over the append-only feed.  ``read`` advances to
    the newest committed id; ``readBetweenOffsets`` replays ``(start,
    end]`` bit-exactly from the immutable batch dirs."""

    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.options = options
        self.table = options["table"]
        self.wh = StagingWarehouse(
            None, options["root"], options.get("account", "local")
        )
        self._fields = [f.name for f in schema.fields if f.name != CHANGE_COL]

    def initialOffset(self) -> dict:
        return {"last": self.options.get("startafter", "")}

    def _ids_after(self, last: str) -> list[str]:
        exp = self.wh._expiry(self.table)
        if exp and last < exp["horizon"]:
            raise SnapshotExpiredError(
                f"staging_changes offset {last!r} of {self.table!r} predates "
                f"the retention horizon {exp['horizon']!r} set by "
                "expire_snapshots — the per-batch history below it is folded"
            )
        return [
            b
            for b in self.wh._live_ids(self.table)
            if not b.endswith(BASE_SUFFIX) and b > last
        ]

    def _rows(self, ids: list[str]) -> Iterator[tuple]:
        import pyarrow as pa
        import pyarrow.dataset as ds

        out: list[tuple] = []
        root = self.wh._path(self.table)
        for bid in ids:
            tbl = ds.dataset(
                os.path.join(root, f"{BATCH_COL}={bid}"), format="parquet"
            ).to_table()
            # Spark's INT96 parquet timestamps read back as ns precision,
            # whose to_pylist() values (pandas Timestamps) the Python
            # source runner cannot convert — cast to Spark's native µs
            if any(pa.types.is_timestamp(f.type) for f in tbl.schema):
                tbl = tbl.cast(
                    pa.schema(
                        [
                            pa.field(f.name, pa.timestamp("us", f.type.tz))
                            if pa.types.is_timestamp(f.type)
                            else f
                            for f in tbl.schema
                        ]
                    )
                )
            # columnar extraction + zip: identical tuples to the previous
            # per-row ``to_pylist()``/dict path, without materializing a
            # dict per row — the driver-side prefetch is the Simple
            # reader's whole cost, and row-dict churn dominated it
            # (guide §4.2: hand whole batches to vectorized paths)
            n = tbl.num_rows
            names = set(tbl.column_names)
            cols = [
                tbl.column(c).to_pylist() if c in names else [None] * n
                for c in self._fields
            ]
            out.extend(zip(*cols, ("insert",) * n, strict=True))
        # a LIST iterator, not a generator (the Simple wrapper next()s and
        # copy.copy()s it — same constraint as the OData stream reader)
        return iter(out)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        ids = self._ids_after(start.get("last", ""))
        if not ids:
            return iter([]), dict(start)
        return self._rows(ids), {"last": ids[-1]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        hi = end.get("last", "")
        ids = [b for b in self._ids_after(start.get("last", "")) if b <= hi]
        return self._rows(ids)
