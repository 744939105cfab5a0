"""Shared test fixtures: one SparkSession for the whole test run."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from priority_data_pipeline_postgres_db_spark.session import get_spark

    spark = get_spark("tests")
    spark.sparkContext.setLogLevel("WARN")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TESTDATA


@pytest.fixture(scope="session")
def gate_dir() -> str:
    """The driver's correctness-gate scale (sf0.01), derived from the
    same root as ``sf_dir`` so a relocated fixture tree moves both
    (ADVICE r9: hardcoded '/root/testdata/sf0.01' silently diverges)."""
    return os.path.join(os.path.dirname(TESTDATA.rstrip("/")), "sf0.01")


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")
