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


SKEW_ARTIFACT = "skew_plan"


def _skew_key(table: str, key_cols: list[str] | tuple[str, ...]) -> str:
    return f"{table}:{','.join(key_cols)}"


def persist_skew_plan(store, table: str, plan: SkewPlan) -> dict:
    """Store a measured SkewPlan keyed by (table, join keys) through the
    ControlStore's artifact log (VERDICT r10 #6) so the star family pays
    the probe shuffle ONCE per table, not once per join."""
    from dataclasses import asdict

    return store.put_artifact(
        SKEW_ARTIFACT, _skew_key(table, plan.key_cols), asdict(plan)
    )


def load_skew_plan(store, table: str, key_cols: list[str]) -> SkewPlan | None:
    doc = store.latest_artifact(SKEW_ARTIFACT, _skew_key(table, key_cols))
    if doc is None:
        return None
    return SkewPlan(
        key_cols=tuple(doc["key_cols"]),
        n_keys=doc["n_keys"],
        n_rows=doc["n_rows"],
        max_rows=doc["max_rows"],
        p99_rows=doc["p99_rows"],
        salts=doc["salts"],
        mitigate=doc["mitigate"],
    )


def skew_plan_for(
    fact: DataFrame,
    key_cols: list[str],
    *,
    store,
    table: str,
    staleness_ratio: float = 2.0,
    current_rows: int | None = None,
) -> SkewPlan:
    """Probe-once SkewPlan resolution (VERDICT r11 #6): read the stored
    plan for (table, key_cols) from the ControlStore; probe (one
    fact-side shuffle) and persist only when no plan is stored or the
    table's CURRENT row count drifted past the staleness fence — the
    skew shape of a fact table changes with its volume, so the fence is
    a ratio test on rows, not wall-clock age.

    The fence costs one ``count()`` — a scan with an empty projection
    (parquet footers do most of the work), no shuffle — against the
    probe's full shuffle + histogram scan.  Callers that already know
    the row count (a write report, a pipeline stat) pass
    ``current_rows`` and pay nothing.

    Returns the plan to hand ``salted_join``/``salted_count``; every
    probe is re-persisted so the NEXT caller reads the fresh artifact."""
    stored = load_skew_plan(store, table, key_cols)
    if stored is not None:
        n_now = fact.count() if current_rows is None else current_rows
        lo, hi = sorted((max(n_now, 1), max(stored.n_rows, 1)))
        if hi <= staleness_ratio * lo:
            return stored
    plan = skew_probe(fact, key_cols)
    persist_skew_plan(store, table, plan)
    return plan


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
