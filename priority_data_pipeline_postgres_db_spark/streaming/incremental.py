"""Structured Streaming form of the incremental refresh (SURVEY.md §2.7).

The reference's steady state is a poll loop: ``refreshData?incremental=true``
pulls rows with ``filterField >= lastRun`` and appends (micro-batch by
hand, late rows silently missed — readme.md:639-641).  The managed Spark
form replaces the hand-rolled watermark with:

- ``readStream`` over the landing directory (files are the micro-batches;
  swap for kafka/odata-poll at the edge),
- ``withWatermark`` on the event-time column — late data gets an explicit
  bounded-lateness contract instead of silent loss,
- checkpointed ``writeStream`` — the checkpoint replaces the control-table
  ``lastRun`` (exactly-once file sinks, no duplicate appends),
- windowed/stateful aggregations (tumbling window per event_type — the
  events_goals rollup as a live view).

``Trigger.AvailableNow`` (``available_now=True``) gives the reference's
"run the backlog then stop" batch-incremental semantics with streaming
machinery — identical code serves both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.ingest import ExtractionRun
from ..functions.typemap import AUDIT_ID_COL, AUDIT_TS_COL


def read_stream(
    spark: SparkSession, path: str, schema: T.StructType, *, per_trigger_files: int = 8
) -> DataFrame:
    """File-source stream over a landing directory."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", per_trigger_files)
        .parquet(path)
    )


def stamp_stream(df: DataFrame, run: ExtractionRun) -> DataFrame:
    """P3/P4 on the stream: audit columns + lowercase (narrow, streamable)."""
    df = df.withColumn(AUDIT_ID_COL, F.lit(run.run_id)).withColumn(
        AUDIT_TS_COL, F.lit(run.run_ts).cast("timestamp")
    )
    return df.toDF(*[c.lower() for c in df.columns])


def incremental_to_staging(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """K1 as a streaming append sink; the checkpoint IS the watermark
    (replaces ControlStore.update_last_run for streaming entities)."""
    return (
        df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=available_now)
        .start()
    )


def incremental_to_staging_atomic(
    df: DataFrame,
    warehouse,
    table_name: str,
    checkpoint: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """K1 streaming sink through the staging warehouse's ATOMIC
    batch-commit protocol — exactly-once on plain parquet from three
    composed layers:

    1. the checkpoint replays any micro-batch that didn't finish,
    2. a crashed attempt's scratch dir is invisible to readers (hidden
       name, never renamed),
    3. the committed batch dir is named by the DETERMINISTIC micro-batch
       id, so a replay of an already-committed batch is a no-op
       (``StagingWarehouse.write(batch_id=...)``).

    This closes the one gap of the plain ``parquet`` streaming sink: a
    crash between sink commit and checkpoint advance replays the batch,
    and the file sink would land it twice."""

    def sink(batch_df: DataFrame, batch_epoch: int) -> None:
        warehouse.write(
            batch_df,
            table_name,
            incremental=True,
            batch_id=f"stream-{batch_epoch}",
        )

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=available_now)
        .start()
    )


def windowed_event_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    lateness: str = "30 minutes",
) -> DataFrame:
    """events_goals live rollup: tumbling window × event_type with a
    bounded-lateness watermark (the managed fix for the reference's silent
    late-row loss)."""
    return (
        events.withWatermark(ts_col, lateness)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_stream(
    events: DataFrame, *, ts_col: str = "ts", gap: str = "30 minutes", lateness: str = "30 minutes"
) -> DataFrame:
    """Streaming sessionization via session_window (the managed analog of
    plans.queries.q_sessionize's batch window)."""
    return (
        events.withWatermark(ts_col, lateness)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def running_user_totals(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful streaming operator (SURVEY.md §2.7):
    applyInPandasWithState keeps a per-user running (event count, value sum)
    across micro-batches — the kind of accumulator the reference could not
    express at all (its state was one lastRun timestamp).

    State is one tiny row per user key; with a real timeout config
    (``ProcessingTimeTimeout``) idle users are evicted, bounding state at
    100 TB stream scale.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )
