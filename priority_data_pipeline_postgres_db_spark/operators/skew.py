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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salts: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic uniform salt — hash of the whole row's offset via
    monotonically_increasing_id is NOT content-stable; use a hash of all
    columns so retries/replays salt identically."""
    return df.withColumn(col_name, F.pmod(F.hash(*df.columns), F.lit(salts)))


def explode_salts(df: DataFrame, salts: int, col_name: str = "_salt") -> DataFrame:
    return df.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    on: list[str],
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the build side replicated
    ×salts. Result equals fact.join(build, on, how) for inner/left joins
    (each fact row still matches exactly its key's build rows, now on one
    of `salts` shuffle keys)."""
    f = with_salt(fact, salts)
    b = explode_salts(build, salts)
    out = f.join(b, on + ["_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key_cols: list[str], salts: int = 16) -> DataFrame:
    """Hot-key-safe count per key: partial per (key, salt) → final per key."""
    partial = (
        with_salt(df, salts)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").cast("long").alias("n"))
