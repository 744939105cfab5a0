"""Reference-parity + analytics query catalog.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable paired with an
ANSI-SQL oracle string (run by DuckDB over the same parquet) in ``ORACLE``.
The driver compares row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides,
- every floating aggregate is computed as an **exact decimal sum cast to
  double at the end** on both sides — decimal arithmetic is exact, and the
  final decimal→double conversion is round-to-nearest in both engines, so
  the doubles match bit-for-bit regardless of each engine's summation order
  (a raw ``sum(double)`` would depend on partial-aggregation order and can
  differ in the last ulp),
- audit columns use a pinned ExtractionRun so lineage values are
  deterministic,
- every LIMIT is preceded by a total deterministic ORDER BY.

Queries marked with reference operator ids (S2, P2, J1, O1, K1, A2 — see
SURVEY.md §2) reproduce reference semantics; q1/q3/q5/q_star/q_events are
the star-schema analytics surface the reference's BI spec implies
(SURVEY.md §1.1).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.ingest import ExtractionRun, nest_subform, split_subforms, watermark_predicate, with_audit_columns
from .tables import load

# Pinned run for deterministic audit columns in oracle-checked queries.
FIXED_RUN = ExtractionRun(run_id="run-fixed", run_ts=datetime(2026, 1, 1, 0, 0, 0))
FIXED_RUN_SQL = "'run-fixed' AS extractionid, TIMESTAMP '2026-01-01 00:00:00' AS extractiontimestamputc"


def dec(col: str | Column, scale: int = 4, precision: int = 18) -> Column:
    """Exact-aggregation guard: double → decimal(precision,scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money(col: str) -> Column:
    """Price-scale operand: decimal(12,4) — keeps 2- and 3-factor products
    inside precision 38 so decimal multiplication stays EXACT in both Spark
    and DuckDB (an overflowing product is rounded engine-specifically)."""
    return dec(col, 4, 12)


def rate1(col: str, sign: int) -> Column:
    """(1 - rate) / (1 + rate) as an exact decimal(9,4)."""
    one = F.lit(1).cast("decimal(8,4)")
    r = dec(col, 4, 8)
    return (one - r) if sign < 0 else (one + r)


def disc_price_expr() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal(22,8)."""
    return money("l_extendedprice") * rate1("l_discount", -1)


def charge_expr() -> Column:
    """l_extendedprice * (1-l_discount) * (1+l_tax), exact decimal(32,12)."""
    return disc_price_expr() * rate1("l_tax", +1)


def as_double(agg: Column) -> Column:
    """Decimal aggregate → double, bit-stable across engines.

    Reduce to scale 4 first: with the unscaled value < 2^53 both engines'
    decimal→double conversions are exact-integer-division and therefore
    correctly rounded.  Casting a high-scale decimal (e.g. (38,12)) directly
    differs between Spark (BigDecimal.doubleValue) and DuckDB
    (double(int128)/double(10^s), two roundings) in the last ulp.
    """
    return agg.cast("decimal(18,4)").cast("double")


def dsum(col: str | Column, alias: str, scale: int = 4) -> Column:
    """sum as exact decimal, emitted as double (bit-stable across engines)."""
    return as_double(F.sum(dec(col, scale))).alias(alias)


# --------------------------------------------------------------------------
# Reference-parity operators (SURVEY.md §2)
# --------------------------------------------------------------------------


def s2_watermark_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+P3+P4 — incremental scan: watermark filter, audit cols, lowercase.

    The steady-state refreshData read path (priorityDataSource.py:646-675,
    :754-780) minus the remote source: filter pushes to the parquet scan.
    """
    orders = load(spark, sf_dir, "orders")
    df = orders.filter(watermark_predicate("o_orderdate", "1998-06-01 00:00:00"))
    return with_audit_columns(df, FIXED_RUN)


def s4_limit_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/O2 — the $top=1 connectivity probe as a pushed-down limit
    (priorityDataSource.py:699-711), made deterministic by a total order."""
    return load(spark, sf_dir, "orders").orderBy("o_orderkey").limit(1)


def p2_projection_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — column pruning: 3-column projection + filter; Catalyst prunes
    the parquet scan to exactly these columns (the reference prunes
    post-fetch, priorityDataSource.py:771-776 — Spark does it at the source)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < "1996-01-01").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


def j1_subform_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — subform flatten with parent-key propagation.

    Builds the $expand nested shape (orders + array<struct> of items) from
    the flat tables, then splits it with the engine's explode path
    (priorityDataSource.py:792-810 semantics). Oracle: the equivalent
    parent-child equi-join.
    """
    orders = load(spark, sf_dir, "orders")
    items = load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    nested = nest_subform(orders, items, ["o_orderkey"], "ITEMS_SUBFORM")
    parts = split_subforms(nested, "ORDERS", ["o_orderkey"], FIXED_RUN)
    child = next(p.df for p in parts if p.table_name == "items")
    return child


def o1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — latest-record-per-key (the reference's latest-config-wins read,
    mongodbHelper.py:76-77, generalized per-key): row_number over a
    descending order, deterministic tiebreak on event_id."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
        )
    )


def k1_incremental_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 — staging-table contents after a full load + one incremental
    append (if_exists='replace' then 'append', priorityDataSource.py:861-866):
    two watermark-bounded batches with distinct lineage ids, unioned."""
    ev = load(spark, sf_dir, "events")
    boundary = "2024-01-15 00:00:00"
    full = ev.filter(F.col("ts") < boundary).withColumn("extractionid", F.lit("run-full"))
    inc = ev.filter(F.col("ts") >= boundary).withColumn("extractionid", F.lit("run-inc"))
    return full.unionByName(inc).withColumn(
        "extractiontimestamputc", F.lit(datetime(2026, 1, 1)).cast("timestamp")
    )


def a2_run_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 — per-entity records-written report
    (priorityDataSource.py:209-215) as a grouped count over the run log."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("entity_name"))
        .agg(F.count("*").alias("records_written"))
    )


# --------------------------------------------------------------------------
# Star-schema analytics (BI-spec surface, SURVEY.md §1.1 / §2.3 / §2.4)
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan→partial-agg→final-agg pipeline.
    Aggregates in exact decimal; averages as double-division of exact sums."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = disc_price_expr()
    charge = charge_expr()
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            as_double(F.sum(disc_price)).alias("sum_disc_price"),
            as_double(F.sum(charge)).alias("sum_charge"),
            (as_double(F.sum(dec("l_quantity"))) / n).alias("avg_qty"),
            (as_double(F.sum(dec("l_extendedprice"))) / n).alias("avg_price"),
            (as_double(F.sum(dec("l_discount"))) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-k by revenue.
    customer is broadcast (small side); deterministic tiebreak on orderkey."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    disc_price = disc_price_expr()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(as_double(F.sum(disc_price)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake dim chain (region→nation→customer) joined
    to facts; dims broadcast, facts shuffle on the join key only."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    disc_price = disc_price_expr()
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(as_double(F.sum(disc_price)).alias("revenue"))
    )


def q_star_region_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI-spec star rollup (fact_opportunities↔dim_account analog):
    orders rolled up through customer→nation→region, all dims broadcast."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "sum_totalprice"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_goals analog (SURVEY.md §2.4): time-bucketed grouped
    aggregation — goal tracking per event_type per day."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("event_day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "sum_value", scale=6),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization over the event stream: 30-minute inactivity gap via
    lag + windowed cumulative sum — the batch analog of
    session_window(ts, gap) (SURVEY.md §2.7 streaming row)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_gap = ev.withColumn("is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    with_sess = with_gap.withColumn(
        "session_seq", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# --------------------------------------------------------------------------
# Oracle SQL (DuckDB dialect-compatible ANSI; views pre-registered)
# --------------------------------------------------------------------------

_DEC = "DECIMAL(18,4)"
_MONEY = "DECIMAL(12,4)"
_RATE = "DECIMAL(8,4)"
_DISC_PRICE = f"CAST(l_extendedprice AS {_MONEY}) * (CAST(1 AS {_RATE}) - CAST(l_discount AS {_RATE}))"
_CHARGE = f"{_DISC_PRICE} * (CAST(1 AS {_RATE}) + CAST(l_tax AS {_RATE}))"

ORACLE: dict[str, str] = {
    "s2_watermark_scan": f"""
        SELECT *, {FIXED_RUN_SQL}
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
    """,
    "s4_limit_probe": "SELECT * FROM orders ORDER BY o_orderkey LIMIT 1",
    "p2_projection_prune": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
    "j1_subform_flatten": f"""
        SELECT o.o_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
               l.l_quantity, l.l_extendedprice, l.l_discount, l.l_tax,
               l.l_returnflag, l.l_linestatus, l.l_shipdate, {FIXED_RUN_SQL}
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
    "o1_latest_per_key": """
        SELECT user_id, event_id AS last_event_id, ts AS last_ts,
               event_type AS last_event_type
        FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "k1_incremental_union": """
        SELECT *, 'run-full' AS extractionid,
               TIMESTAMP '2026-01-01 00:00:00' AS extractiontimestamputc
        FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        UNION ALL
        SELECT *, 'run-inc' AS extractionid,
               TIMESTAMP '2026-01-01 00:00:00' AS extractiontimestamputc
        FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    """,
    "a2_run_report": """
        SELECT event_type AS entity_name, count(*) AS records_written
        FROM events GROUP BY event_type
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
          CAST(CAST(ROUND(SUM(CAST(l_quantity AS {_DEC})), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
          CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC})), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
          CAST(CAST(ROUND(SUM({_DISC_PRICE}), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
          CAST(CAST(ROUND(SUM({_CHARGE}), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_charge,
          CAST(CAST(ROUND(SUM(CAST(l_quantity AS {_DEC})), 4) AS DECIMAL(18,4)) AS DOUBLE) / count(*) AS avg_qty,
          CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC})), 4) AS DECIMAL(18,4)) AS DOUBLE) / count(*) AS avg_price,
          CAST(CAST(ROUND(SUM(CAST(l_discount AS {_DEC})), 4) AS DECIMAL(18,4)) AS DOUBLE) / count(*) AS avg_disc,
          count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_unshipped": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
          CAST(CAST(ROUND(SUM({_DISC_PRICE}), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    "q5_region_revenue": f"""
        SELECT n_name,
          CAST(CAST(ROUND(SUM({_DISC_PRICE}), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q_star_region_summary": f"""
        SELECT r_name AS region_name, count(*) AS n_orders,
          CAST(CAST(ROUND(SUM(CAST(o_totalprice AS {_DEC})), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_totalprice,
          count(DISTINCT o_custkey) AS n_customers
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q_events_rollup": """
        SELECT date_trunc('day', ts) AS event_day, event_type,
          count(*) AS n_events,
          CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value,
          count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2
    """,
    "q_sessionize": """
        -- second-truncated epochs match Spark's timestamp→long cast
        WITH flagged AS (
          SELECT user_id, ts, event_id,
            CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                      - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
                   OR CAST(floor(epoch(ts)) AS BIGINT)
                      - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
                 THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts,
            CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM flagged
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sessions GROUP BY user_id, session_seq
    """,
}

CORE_QUERIES = {
    "s2_watermark_scan": s2_watermark_scan,
    "s4_limit_probe": s4_limit_probe,
    "p2_projection_prune": p2_projection_prune,
    "j1_subform_flatten": j1_subform_flatten,
    "o1_latest_per_key": o1_latest_per_key,
    "k1_incremental_union": k1_incremental_union,
    "a2_run_report": a2_run_report,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_unshipped": q3_top_unshipped,
    "q5_region_revenue": q5_region_revenue,
    "q_star_region_summary": q_star_region_summary,
    "q_events_rollup": q_events_rollup,
    "q_sessionize": q_sessionize,
}
