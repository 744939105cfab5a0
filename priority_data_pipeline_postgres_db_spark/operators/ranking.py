"""Distributed global ranking (SCALE.md).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY plans as
``Exchange SinglePartition`` + one WindowExec — every row funnels through
a single task, the textbook scale cliff (Spark even logs "Moving all data
to a single partition").  These helpers produce the IDENTICAL ranking
with no single-partition stage:

1. ``repartitionByRange`` on the order key — the range partitioner puts
   ascending key ranges in ascending partition ids, so partition id order
   IS global order;
2. ``row_number`` windowed BY PARTITION ID (parallel, each window sees
   only its partition's rows);
3. per-partition row counts (one tiny aggregate, ≤ #partitions rows)
   prefix-summed on the driver and broadcast back as rank offsets.

Equivalent to the classic zipWithIndex pattern, kept in the DataFrame
API.  Caller contract: ``order_cols`` must be a TOTAL order (append a
unique key as tie-break).  Range-partition boundaries come from sampling
and can shift between runs — with a total order the assigned ranks are
identical regardless of where the boundaries land; with ties, which tied
row gets which rank would be run-dependent.  Order values should also
be NON-NULL: the range partitioner and the per-partition window sort
must agree on placement, and null ordering is the one knob their
defaults could be configured apart.

``global_ntile`` derives standard SQL NTILE(k) from the global rank with
pure integer math (first ``n % k`` buckets take the extra row), matching
Spark's and DuckDB's NTILE bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..util import bounded_cache


def _ranked_with_total(
    df: DataFrame,
    order_cols: list[Column],
    alias: str,
    partitions: int | None,
) -> tuple[DataFrame, int]:
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(parts, *order_cols)
    local = bounded_cache(
        ordered.withColumn("_pid", F.spark_partition_id()).withColumn(
            "_lrn",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols)),
        )
    )
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    acc = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["_cnt"]
    off = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    ranked = (
        local.join(F.broadcast(off), "_pid")
        .withColumn(alias, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )
    return ranked, acc


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    alias: str = "rn",
    partitions: int | None = None,
) -> DataFrame:
    """``df`` + a 1-based global rank column ``alias`` under the total
    order ``order_cols`` — no single-partition exchange anywhere."""
    return _ranked_with_total(df, order_cols, alias, partitions)[0]


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """Standard SQL NTILE(k) from a 1-based global rank over ``n`` rows:
    bucket size ``n // k``, the first ``n % k`` buckets take one extra.
    The ceil runs on a double quotient — exact while ``n`` ≤ 2^53 (nine
    quadrillion rows); beyond that switch the quotient to integer
    ``div``."""
    size, extras = n // k, n % k
    fat = extras * (size + 1)  # rows living in the (size+1)-sized buckets
    if size == 0:  # fewer rows than buckets: rank IS the bucket
        return rank.cast("int")
    return (
        F.when(rank <= fat, F.ceil(rank / (size + 1)))
        .otherwise(extras + F.ceil((rank - fat) / size))
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    alias: str,
    partitions: int | None = None,
) -> DataFrame:
    """``NTILE(k) OVER (ORDER BY order_cols)`` without the
    single-partition window; ``order_cols`` must be a total order.  The
    row count comes from the rank pass's per-partition counts — no extra
    job."""
    ranked, total = _ranked_with_total(df, order_cols, "_grn", partitions)
    return ranked.withColumn(
        alias, ntile_from_rank(F.col("_grn"), total, k)
    ).drop("_grn")


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    value_col: str,
    alias: str,
    partitions: int | None = None,
) -> DataFrame:
    """``SUM(value) OVER (PARTITION BY group ORDER BY order ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` computed WITHOUT one task per
    group.

    A per-group window puts each group's entire history in one task — fine
    for many small groups, a straggler cliff when one group holds most of
    the data (e.g. one dominant language in a corpus).  Here the data is
    range-partitioned on (group, order) so a big group SPANS partitions in
    order; each partition computes its local exclusive prefix in parallel,
    and per-(partition, group) totals (≤ partitions × |groups| rows) are
    prefix-summed on the driver and broadcast back as offsets.  Same
    contract as ``global_row_number``: ``(group, order)`` must be a total
    order for run-invariant results.
    """
    from pyspark.sql import types as T

    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    gcols = [F.col(g) for g in group_cols]
    ordered = df.repartitionByRange(parts, *gcols, *order_cols)
    local = bounded_cache(
        ordered.withColumn("_pid", F.spark_partition_id()).withColumn(
            "_lps",
            F.coalesce(
                F.sum(value_col).over(
                    Window.partitionBy("_pid", *group_cols)
                    .orderBy(*order_cols)
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
    )
    totals = (
        local.groupBy("_pid", *group_cols)
        .agg(F.sum(value_col).cast("long").alias("_tot"))
        .collect()
    )
    by_group: dict[tuple, list] = {}
    for r in totals:
        by_group.setdefault(tuple(r[g] for g in group_cols), []).append(
            (r["_pid"], r["_tot"])
        )
    rows = []
    for g, lst in by_group.items():
        acc = 0
        for pid, tot in sorted(lst):
            rows.append((*g, pid, acc))
            acc += tot
    schema = T.StructType(
        [df.schema[g] for g in group_cols]
        + [T.StructField("_pid", T.IntegerType()), T.StructField("_off", T.LongType())]
    )
    off = df.sparkSession.createDataFrame(rows, schema)
    return (
        local.join(F.broadcast(off), ["_pid", *group_cols])
        .withColumn(alias, (F.col("_off") + F.col("_lps")).cast("long"))
        .drop("_pid", "_lps", "_off")
    )
