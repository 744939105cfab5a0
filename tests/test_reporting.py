"""Oracle-differential tests for the TPC-H battery-2 shapes
(plans.reporting): each query runs at sf0.001 and must match its own
registered DuckDB oracle on row count, column names, and values."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from priority_data_pipeline_postgres_db_spark.plans import reporting

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(reporting.QUERIES))
def test_reporting_matches_oracle(spark, sf_dir, name):
    sdf = reporting.QUERIES[name](spark, sf_dir).toPandas()
    odf = _oracle(sf_dir, reporting.ORACLE[name])
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    s, o = _canon(sdf), _canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            assert (
                (sv.astype(float).to_numpy() == ov.astype(float).to_numpy())
                | (sv.isna().to_numpy() & ov.isna().to_numpy())
            ).all(), f"{name}: column {c} not bit-exact"
        else:
            assert sv.astype(str).tolist() == ov.astype(str).tolist(), (
                f"{name}: column {c} differs"
            )


def test_q21_oneagg_formulation_has_single_lineitem_scan(spark, sf_dir):
    """The Spark q21 plan must NOT decorrelate into extra lineitem
    self-joins: exactly 2 scans of lineitem (lines + per-order agg),
    never the 3 the EXISTS/NOT-EXISTS SQL form would produce."""
    plan = reporting.q21_sole_late_supplier(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("lineitem.parquet") <= 2
