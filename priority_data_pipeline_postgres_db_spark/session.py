"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` but every setting here is
chosen to also be the right default on a large cluster:

- AQE on (runtime coalesce + skew-join splitting survive 100× scale-up),
- Arrow on (any unavoidable pandas-UDF path is batch-vectorized),
- shuffle partitions sized to cores locally; on a real cluster AQE's
  coalesce makes the initial number mostly irrelevant,
- broadcast threshold left at default 10 MB — dimension tables (region,
  nation, customer at small SF) broadcast automatically; large-SF fact-fact
  joins fall back to sort-merge, which is what you want at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "priority-data-pipeline-spark") -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet carries TIMESTAMP(NANOS) which Spark has
        # no native type for; read as long and convert (plans.tables.load)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Python DataSource filter pushdown (sources.odata implements
        # pushFilters; off by default in Spark 4.1)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    )
    return builder.getOrCreate()
