"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship star-rollup query at sf0.001; ``queries`` /
``oracle_sql`` expose the full operator catalog (SURVEY.md §2 plus the
beyond-reference LLM-pipeline operators) with DuckDB oracles wherever the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from priority_data_pipeline_postgres_db_spark.plans import analytics as _an
from priority_data_pipeline_postgres_db_spark.plans import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q_star_region_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    catalog: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    catalog.update(_q.CORE_QUERIES)
    catalog.update(_an.QUERIES)
    try:  # beyond-reference operator sets land module by module
        from priority_data_pipeline_postgres_db_spark.operators import dedup as _dd

        catalog.update(_dd.QUERIES)
    except ImportError:
        pass
    try:
        from priority_data_pipeline_postgres_db_spark.operators import similarity as _sim

        catalog.update(_sim.QUERIES)
    except ImportError:
        pass
    try:
        from priority_data_pipeline_postgres_db_spark.functions import text as _txt

        catalog.update(_txt.QUERIES)
    except ImportError:
        pass
    try:
        from priority_data_pipeline_postgres_db_spark.operators import multimodal as _mm

        catalog.update(_mm.QUERIES)
    except ImportError:
        pass
    try:
        from priority_data_pipeline_postgres_db_spark.operators import corpus as _cp

        catalog.update(_cp.QUERIES)
    except ImportError:
        pass
    try:
        from priority_data_pipeline_postgres_db_spark.streaming import incremental as _st

        catalog.update(_st.QUERIES)
    except ImportError:
        pass
    try:
        from priority_data_pipeline_postgres_db_spark.plans import reporting as _rp

        catalog.update(_rp.QUERIES)
    except ImportError:
        pass
    return catalog


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (omitted for ops whose
    semantics aren't SQL-expressible — driver does a rows-only check)."""
    oracle: dict[str, str] = {}
    oracle.update(_q.ORACLE)
    oracle.update(_an.ORACLE)
    for mod_path, attr in (
        ("priority_data_pipeline_postgres_db_spark.operators.dedup", "ORACLE"),
        ("priority_data_pipeline_postgres_db_spark.operators.similarity", "ORACLE"),
        ("priority_data_pipeline_postgres_db_spark.functions.text", "ORACLE"),
        ("priority_data_pipeline_postgres_db_spark.operators.corpus", "ORACLE"),
        ("priority_data_pipeline_postgres_db_spark.streaming.incremental", "ORACLE"),
        ("priority_data_pipeline_postgres_db_spark.plans.reporting", "ORACLE"),
    ):
        try:
            import importlib

            oracle.update(getattr(importlib.import_module(mod_path), attr))
        except ImportError:
            pass
    return oracle
