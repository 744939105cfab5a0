"""File-based corpus ingestion: JSONL and CSV document readers.

The reference ingests exclusively over OData JSON (priorityDataSource.py
read path); a training-data pipeline additionally lands raw corpus drops
as newline-delimited JSON or CSV.  These readers normalize either format
into the engine's `documents` shape (doc_id, text, lang, source, n_chars)
with the same discipline as the OData path: explicit schema (never
inference on the hot path — a schema-inference pass is a full extra scan
at 100 TB), malformed rows quarantined instead of killing the job, and
identifier lowercasing (SURVEY.md §2.2 P4).

Scale notes:
- JSONL and (multiline=false) CSV are both splittable: Spark assigns
  file ranges to tasks, so a single 1 TB drop still parallelizes.
  Gzipped drops are NOT splittable — one task per file; the reader
  accepts them (Spark handles the codec) but repartitions after read so
  downstream stages aren't pinned to the file count.
- PERMISSIVE mode + `columnNameOfCorruptRecord` keeps bad rows visible:
  the caller chooses `quarantine=True` to get them as a second
  DataFrame (count-able, land-able) instead of silently dropping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])


def _normalize(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Lowercase identifiers (P4), recompute n_chars server-side (derived
    columns never trusted from the drop), keep the declared column order."""
    cols = [F.col(f.name).alias(f.name.lower()) for f in schema.fields]
    return df.select(*cols).withColumn("n_chars", F.length(F.col("text")).cast("long"))


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    *,
    quarantine: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus drop into the documents shape.

    A row is GOOD iff it parses and carries a non-null doc_id and text;
    everything else lands in the quarantine frame with the raw line
    preserved (the `_corrupt_record` convention).  Good rows are
    repartitioned to the default parallelism — corpus drops often arrive
    as a handful of huge (or gzipped, unsplittable) files.
    """
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    # Spark leaves parsed fields null and fills _corrupt_record for bad
    # lines; a semantically-bad row (null key) is quarantined too.
    good_pred = F.col(_CORRUPT).isNull() & F.col("doc_id").isNotNull() & F.col(
        "text"
    ).isNotNull()
    par = spark.sparkContext.defaultParallelism
    good = _normalize(raw.filter(good_pred), schema).repartition(par)
    if not quarantine:
        return good
    bad = raw.filter(~good_pred).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct(*[f.name for f in schema.fields])))
        .alias("raw_record")
    )
    return good, bad


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    *,
    header: bool = True,
    quarantine: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Read a CSV corpus drop into the documents shape (quoted multiline
    text NOT supported — multiline CSV kills splittability; drops with
    embedded newlines belong in JSONL)."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .option("multiLine", "false")
        .csv(path)
    )
    good_pred = F.col(_CORRUPT).isNull() & F.col("doc_id").isNotNull() & F.col(
        "text"
    ).isNotNull()
    par = spark.sparkContext.defaultParallelism
    good = _normalize(raw.filter(good_pred), schema).repartition(par)
    if not quarantine:
        return good
    bad = raw.filter(~good_pred).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct(*[f.name for f in schema.fields])))
        .alias("raw_record")
    )
    return good, bad


def read_documents_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Read an ORC corpus drop into the documents shape.

    ORC is the other columnar interchange format warehouse exports arrive
    in (Hive/Trino ecosystems default to it); Spark reads it natively with
    the same predicate-pushdown/column-pruning machinery as parquet, so no
    quarantine path is needed — columnar files are schema-checked at write
    time, and a corrupt stripe is a job error, not a row error.  Columns
    beyond the documents schema are pruned at the reader (never scanned);
    missing ones fail fast with a clear error instead of null-filling a
    misdeclared drop.
    """
    raw = spark.read.orc(path)
    have = {f.lower() for f in raw.columns}
    missing = [f.name for f in schema.fields if f.name.lower() not in have]
    if missing:
        raise ValueError(f"ORC drop at {path} lacks required columns {missing}")
    by_lower = {c.lower(): c for c in raw.columns}
    picked = raw.select(
        *[
            F.col(by_lower[f.name.lower()]).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )
    return _normalize(picked, schema)


def read_documents_text(
    spark: SparkSession,
    path: str,
    *,
    source: str,
    lang: str | None = None,
) -> DataFrame:
    """Read a raw text corpus drop — ONE DOCUMENT PER LINE (the classic
    crawl-dump layout) — into the documents shape.

    doc_id is the FULL 128-bit md5 content hash of the line (32-char hex
    string): drops carry no ids, a positional id would reshuffle on every
    re-land, and content keying means byte-identical lines collapse to
    one id — which IS the exact-dedup semantic, one step early.  The
    width matters: a 60-bit id hits birthday collisions around ~1.2e9
    documents (50% odds), silently merging two DIFFERENT documents into
    one identity with no downstream verify to catch it — unacceptable at
    the engine's design scale, so unlike the LSH-style keys (where a
    rare collision only costs one wasted verify), identity gets all 128
    bits (collision odds ~1e-18 at 1e10 docs).  Blank lines are dropped.
    ``source`` is required (provenance is load-bearing for source
    capping / interleaving); ``lang`` is optional — null routes the doc
    to the lang-id operator downstream.
    """
    raw = spark.read.text(path)
    par = spark.sparkContext.defaultParallelism
    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .repartition(par)
        .select(
            F.md5("value").alias("doc_id"),
            F.col("value").alias("text"),
            F.lit(lang).cast("string").alias("lang"),
            F.lit(source).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
