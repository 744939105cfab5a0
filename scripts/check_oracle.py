"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` DuckDB result: row count, sorted column names, and an
order-insensitive value comparison (exact for ints/strings/timestamps,
bit-exact check for doubles with a tolerance fallback report).

Usage: python scripts/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

import os

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns — order-insensitive."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if problems:
        return problems
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        # Driver's value hash is dtype-sensitive: an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB HUGEINT SUM materialized by
        # pandas) hash-MISMATCHES even when values are numerically equal.
        # The old float-coercion here masked exactly that class (r04 q12/q18)
        # — fail loudly on dtype-kind divergence instead.
        if sv.dtype.kind != ov.dtype.kind and {sv.dtype.kind, ov.dtype.kind} <= {"i", "u", "f"}:
            problems.append(
                f"col {c}: dtype-kind mismatch spark={sv.dtype} oracle={ov.dtype}"
                " — driver hash WILL reject (cast the oracle, e.g. HUGEINT SUM → CAST(... AS BIGINT))"
            )
            continue
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sv = sv.astype(float)
            ov = ov.astype(float)
            both_nan = np.isnan(sv) & np.isnan(ov)
            exact = (sv == ov) | both_nan
            if not exact.all():
                close = np.isclose(sv, ov, rtol=1e-9, equal_nan=True)
                n_bad = int((~exact).sum())
                if close.all():
                    problems.append(f"col {c}: {n_bad} values not BIT-exact (but within 1e-9) — hash would MISMATCH")
                else:
                    problems.append(f"col {c}: {int((~close).sum())} values differ beyond 1e-9")
        else:
            if not (pd.Series(sv).fillna("<null>") == pd.Series(ov).fillna("<null>")).all():
                n_bad = int((pd.Series(sv).fillna('<null>') != pd.Series(ov).fillna('<null>')).sum())
                problems.append(f"col {c}: {n_bad} values differ")
    return problems


def main() -> int:
    import __spark_entry__ as e
    from priority_data_pipeline_postgres_db_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("check-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # drop leaked cache/checkpoint blocks between queries (same GC
        # hygiene as bench.py — see its comment)
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(False)
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(sdf)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{n_fail} failures / {len(only) if only else len(qs)} checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
