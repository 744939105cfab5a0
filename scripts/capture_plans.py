"""Capture .explain("formatted") for registry entries into plans/r14/.

    python scripts/capture_plans.py <entry> [<entry> ...] --suffix before

Writes plans/r14/<entry>_<suffix>.txt with the formatted physical plan of
the entry's returned DataFrame (the plan the noop sink executes).
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as e
    from priority_data_pipeline_postgres_db_spark.session import get_spark

    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    outdir = os.path.join(_REPO, "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    for name in args.entries:
        df = qs[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
