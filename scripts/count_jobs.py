"""Noise-free evidence for driver-blocking-action optimizations: count
the Spark JOBS one registry entry launches during its timed (bench-
methodology) execution.

Wall-clock on a busy shared box swings ±50%+ (see ab_bench.py), but the
number of jobs an entry launches is deterministic — and at the small
bench SF, entry seconds are dominated by per-job fixed overhead, so
"N fewer jobs" is the causal mechanism behind a bench win.

    python scripts/count_jobs.py <entry> [<entry> ...]

Method matches bench.py: warm-up execution first (fit memos populate,
codegen warms), clearCache, then the counted run through the noop sink.
Job total is read from the DAGScheduler's job-id counter.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    entries = sys.argv[1:]

    import __spark_entry__ as e
    from priority_data_pipeline_postgres_db_spark.session import get_spark

    spark = get_spark("count_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    qs = e.queries()

    def n_jobs() -> int:
        return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()

    out = {}
    for name in entries:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        spark.catalog.clearCache()
        j0, t0 = n_jobs(), time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = {"jobs": n_jobs() - j0, "wall": round(time.time() - t0, 2)}
        print(name, out[name], flush=True)
    print("JOBS_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
