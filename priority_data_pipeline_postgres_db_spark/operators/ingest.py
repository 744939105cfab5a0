"""Row-level ingest operators (SURVEY.md §2.2 / §2.3).

Spark-first re-expression of the reference's parsing path
(reference: priorityDataSource.py:740-816 ``parsingDf``):

- audit-column injection (P3, priorityDataSource.py:54-55,760-761,797-798),
- identifier lowercasing (P4, priorityDataSource.py:780,801),
- main-entity projection = payload columns minus subform columns
  (P2, priorityDataSource.py:771-776),
- subform flatten with parent-key propagation (J1 — the reference's
  ``pd.json_normalize(record_path=..., meta=pk)``,
  priorityDataSource.py:792-810) as a lateral explode of
  ``ArrayType(StructType)``,
- watermark boundary filter with system-timezone localization
  (S2/P5, priorityDataSource.py:646-675).

All pure DataFrame ops — narrow transformations except the explode, which is
also narrow (no shuffle); at 100 TB these run inside a single
whole-stage-codegen scan stage.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.typemap import AUDIT_ID_COL, AUDIT_TS_COL

SUBFORM_SUFFIX = "_SUBFORM"


@dataclass
class ExtractionRun:
    """Run-scoped lineage: uuid + UTC timestamp stamped on every row
    (priorityDataSource.py:54-55)."""

    run_id: str = field(default_factory=lambda: str(uuid.uuid4()))
    run_ts: datetime = field(default_factory=lambda: datetime.now(timezone.utc).replace(tzinfo=None))


def with_audit_columns(df: DataFrame, run: ExtractionRun) -> DataFrame:
    """P3 — constant lineage columns on every row."""
    return df.withColumn(AUDIT_ID_COL, F.lit(run.run_id)).withColumn(
        AUDIT_TS_COL, F.lit(run.run_ts).cast("timestamp")
    )


def lowercase_columns(df: DataFrame) -> DataFrame:
    """P4 — all identifiers lowercase (priorityDataSource.py:780)."""
    return df.toDF(*[c.lower() for c in df.columns])


def watermark_predicate(
    filter_field: str, boundary: str | datetime, system_timezone: str | None = None
) -> Column:
    """S2/P5 — ``filterField >= boundary`` with reference timezone semantics.

    The reference stores boundaries as naive ``%Y-%m-%d %H:%M:%S`` strings in
    source-system wall-clock time, localizes them to ``systemTimezone`` and
    ships the offset-qualified ISO string in the OData ``$filter``
    (priorityDataSource.py:667-669).  Here the data already carries plain
    timestamps, so the equivalent is: interpret the naive boundary in the
    system timezone, convert to the session zone (UTC), compare.  With no
    timezone the boundary is compared as-is.
    """
    if isinstance(boundary, datetime):
        boundary = boundary.strftime("%Y-%m-%d %H:%M:%S")
    ts = F.to_timestamp(F.lit(boundary))
    if system_timezone:
        ts = F.to_utc_timestamp(ts, system_timezone)
    return F.col(filter_field) >= ts


def subform_columns(df: DataFrame) -> list[str]:
    """Columns holding nested child-record arrays (``*_SUBFORM``)."""
    return [c for c in df.columns if c.upper().endswith(SUBFORM_SUFFIX)]


@dataclass
class ParsedEntity:
    """One output frame of the split: mirrors the reference's
    ``{tableName, entityName, df}`` triple (priorityDataSource.py:784-810).

    Naming contract (priorityDataSource.py:803-806): ``entity_name`` keeps
    the ``_subform`` suffix for children; ``table_name`` does not.
    """

    table_name: str
    entity_name: str
    df: DataFrame


def split_subforms(
    df: DataFrame,
    entity_name: str,
    pk_cols: list[str],
    run: ExtractionRun | None = None,
) -> list[ParsedEntity]:
    """J1/P2/P3/P4 — split a nested entity frame into parent + child frames.

    Equivalent of the reference's parsingDf: the parent keeps every column
    except the subform arrays; each subform explodes into its own frame
    carrying the parent PK columns (``json_normalize(record_path, meta=pk)``
    at priorityDataSource.py:794).  Parent rows with empty child arrays
    contribute no child rows (inner explode), matching json_normalize.
    """
    run = run or ExtractionRun()
    subs = subform_columns(df)

    parent = lowercase_columns(with_audit_columns(df.drop(*subs), run))
    out = [ParsedEntity(entity_name.lower(), entity_name.lower(), parent)]

    for sub_col in subs:
        base = sub_col[: -len(SUBFORM_SUFFIX)] if sub_col.upper().endswith(SUBFORM_SUFFIX) else sub_col
        exploded = df.select(*pk_cols, F.explode(sub_col).alias("_rec"))
        # Child payload columns win name collisions with propagated PK cols
        # (json_normalize keeps record_path values under their own names).
        rec_fields = exploded.schema["_rec"].dataType.fieldNames()
        keep_pk = [p for p in pk_cols if p not in rec_fields and p.lower() not in {f.lower() for f in rec_fields}]
        child = exploded.select(*keep_pk, "_rec.*")
        child = lowercase_columns(with_audit_columns(child, run))
        out.append(ParsedEntity(base.lower(), sub_col.lower(), child))
    return out


def nest_subform(
    parent: DataFrame,
    child: DataFrame,
    pk_cols: list[str],
    subform_name: str,
) -> DataFrame:
    """Inverse of split_subforms, used to build $expand-shaped fixtures:
    fold child rows into an ``ArrayType(StructType)`` column on the parent.

    Left join + group keeps parents with no children (empty array), matching
    the OData ``$expand`` payload shape (priorityDataSource.py:686-693).
    """
    payload = [c for c in child.columns if c not in pk_cols]
    packed = child.groupBy(*pk_cols).agg(
        F.collect_list(F.struct(*payload)).alias(subform_name)
    )
    joined = parent.join(packed, on=pk_cols, how="left")
    elem_type = packed.schema[subform_name].dataType
    return joined.withColumn(
        subform_name,
        F.coalesce(F.col(subform_name), F.array().cast(elem_type)),
    )
