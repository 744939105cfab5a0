"""Skew-resilient join helpers (SURVEY.md §4 / SCALE.md).

AQE's skew-join splitting (on by default in session.get_spark) handles
moderately skewed SORT-MERGE joins at runtime. Salting is for the cases
AQE can't fix:

- a broadcast-ineligible dimension with a few pathological hot keys where
  even a split partition re-concentrates on one key,
- aggregations (AQE splits join partitions, not groupBy hot keys).

``salted_join``: the fact side gets a uniform salt in [0, salts); the
(smaller) build side is exploded ×salts. The hot key's rows spread over
``salts`` partitions at the cost of replicating the build side — the
standard trade.

``salted_count``: two-phase aggregation for hot-key counts — partial
count per (key, salt), then final sum per key; the first shuffle spreads
the hot key, the second moves only (key × salts) rows.

The measurement→plan loop (VERDICT r10 #1): ``skew_probe`` measures the
fact side's per-key load distribution in one pass (the same shuffle
``plans.analytics.q_skew_report`` runs as a standing diagnostic) and
``plan_skew_mitigation`` turns it into a salt count — so
``salted_join(..., salts=None)`` (the default) is AUTO-SIZED from the
measured max/p99 load ratio instead of a hand-picked constant, exactly
the way ``similarity.plan_semantic_dedup`` sizes the ANN shards from the
measured recall laws.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ceil(max/p99) on a uniform table is 1-2; hard ceiling keeps a
# pathological probe (one key holding half the table over a p99 of 1)
# from exploding the build side past any shuffle width it could use
MAX_SALTS = 1024


@dataclass(frozen=True)
class SkewPlan:
    """One fact-side load measurement + the mitigation it implies.

    ``salts`` = ceil(max_rows / p99_rows), capped at ``MAX_SALTS`` — the
    factor by which the hottest key overloads a typical (p99) key, i.e.
    exactly how many ways its rows must split to look like everyone
    else's shuffle partition.  ``mitigate`` is False when the ratio
    rounds to 1 (uniform table): the plain equi-join plan is already
    balanced and salting would only replicate the build side for
    nothing."""

    key_cols: tuple[str, ...]
    n_keys: int
    n_rows: int
    max_rows: int
    p99_rows: int
    salts: int
    mitigate: bool


def plan_skew_mitigation(
    max_rows: int, p99_rows: int, *, max_salts: int = MAX_SALTS
) -> tuple[int, bool]:
    """(salts, mitigate) from a measured (max, p99) per-key load — the
    policy half, reusable directly on a ``q_skew_report`` row
    (plans/analytics.py) or any persisted skew measurement without
    re-probing."""
    if max_rows <= 0 or p99_rows <= 0:
        return 1, False
    salts = min(-(-max_rows // p99_rows), max_salts)
    return max(salts, 1), salts >= 2


def skew_probe(df: DataFrame, key_cols: list[str]) -> SkewPlan:
    """One-pass fact-side load probe: per-key counts (ONE shuffle on the
    join keys — the same shuffle the production join would do), then
    histogram-sized follow-ups for the exact discrete p99 (per-count
    histogram cumulative scan, no float interpolation — the
    ``q_skew_report`` method).  Collects exactly one row."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    counts = counts.localCheckpoint(eager=False)  # probe shuffles once
    tot = counts.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_rows"),
    )
    from pyspark.sql.window import Window

    hist = counts.groupBy("cnt").agg(F.count("*").alias("nk"))
    cum = hist.withColumn(
        "cum",
        F.sum("nk").over(
            Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    p99 = (
        cum.crossJoin(F.broadcast(tot.select("n_keys")))
        .filter(F.col("cum") >= F.expr("(n_keys - 1) * 99 div 100 + 1"))
        .agg(F.min("cnt").cast("long").alias("p99_rows"))
    )
    row = tot.crossJoin(F.broadcast(p99)).first()
    if row is None or row["n_keys"] is None or row["n_keys"] == 0:
        return SkewPlan(tuple(key_cols), 0, 0, 0, 0, 1, False)
    salts, mitigate = plan_skew_mitigation(row["max_rows"], row["p99_rows"])
    return SkewPlan(
        tuple(key_cols),
        row["n_keys"],
        row["n_rows"],
        row["max_rows"],
        row["p99_rows"],
        salts,
        mitigate,
    )


def with_salt(df: DataFrame, salts: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic uniform salt — hash of the whole row's offset via
    monotonically_increasing_id is NOT content-stable; use a hash of all
    columns so retries/replays salt identically."""
    return df.withColumn(col_name, F.pmod(F.hash(*df.columns), F.lit(salts)))


def explode_salts(df: DataFrame, salts: int, col_name: str = "_salt") -> DataFrame:
    return df.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )


def _resolve_salts(
    fact: DataFrame, on: list[str], salts: int | SkewPlan | None
) -> int:
    if salts is None:
        plan = skew_probe(fact, on)
        return plan.salts if plan.mitigate else 1
    if isinstance(salts, SkewPlan):
        return salts.salts if salts.mitigate else 1
    return salts


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    on: list[str],
    salts: int | SkewPlan | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the build side replicated
    ×salts. Result equals fact.join(build, on, how) for inner/left joins
    (each fact row still matches exactly its key's build rows, now on one
    of `salts` shuffle keys).

    ``salts``: an explicit count, a ``SkewPlan`` (probe once, reuse
    across joins), or ``None`` (the default) to AUTO-SIZE from a one-pass
    ``skew_probe`` of the fact side — ceil(max/p99) per-key load, the
    measured straggler factor.  A probe that reads uniform (mitigate
    False) degrades to the plain un-salted join: no salt column, no
    build replication, Catalyst free to broadcast.

    When salting IS engaged the exploded build side carries a
    shuffle-hash hint: salting exists precisely because the build side is
    broadcast-ineligible, and letting Catalyst broadcast the ×salts
    explosion would pay the replication without spreading any shuffle."""
    salts = _resolve_salts(fact, on, salts)
    if salts <= 1:
        return fact.join(build, on, how)
    f = with_salt(fact, salts)
    b = explode_salts(build, salts).hint("shuffle_hash")
    out = f.join(b, on + ["_salt"], how)
    return out.drop("_salt")


def salted_count(
    df: DataFrame, key_cols: list[str], salts: int | SkewPlan | None = None
) -> DataFrame:
    """Hot-key-safe count per key: partial per (key, salt) → final per
    key.  ``salts`` auto-sizes like ``salted_join`` (``None`` probes the
    frame; a uniform read degrades to the plain one-shuffle groupBy)."""
    salts = _resolve_salts(df, key_cols, salts)
    if salts <= 1:
        return df.groupBy(*key_cols).agg(F.count("*").cast("long").alias("n"))
    partial = (
        with_salt(df, salts)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").cast("long").alias("n"))
