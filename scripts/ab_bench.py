"""Same-box A/B bench: adjudicate "regression vs box drift" for registry
entries by running an OLD git tree and the CURRENT tree alternately, one
entry per fresh Spark session, on the same box in the same session
recipe (VERDICT r9 #4: the manual git-archive ritual that dissolved two
rounds of phantom regressions, as a checked-in script).

    python scripts/ab_bench.py <git-ref> <entry> [<entry> ...]
        [--pairs N] [--sf-dir DIR]

Method
------
- ``git archive <ref> | tar -x`` into a temp dir — the A tree; the repo
  checkout is the B tree.  Nothing is checked out or mutated in-place.
- For each of ``--pairs`` rounds, each entry runs once per tree in a
  FRESH subprocess/SparkSession, A/B alternating (interleaving averages
  out monotone intraday drift; fresh sessions avoid the measured in-run
  heap pollution that inflates late entries several-fold).
- Timing recipe matches bench.py: one warm-up execution absorbs worker
  spin-up/codegen, then the timed run; the noop sink forces the full
  plan with no driver materialization.

Report, per entry: per-tree times, pair-min ratio (B/A), each tree's
internal noise band (max/min), and a verdict — ``regression`` only when
the ratio exceeds 1.3 AND the trees' time ranges don't overlap
(cross-round single-shot timings at 3-5 s magnitude swing ±50% from box
state alone; see ROUND9_NOTES).  Everything else is ``noise``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_RUNNER = r"""
import json, os, sys, time
tree = sys.argv[1]; entry = sys.argv[2]; sf_dir = sys.argv[3]
os.chdir(tree); sys.path.insert(0, tree)
import __spark_entry__ as e
from priority_data_pipeline_postgres_db_spark.session import get_spark
spark = get_spark("ab_bench"); spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/orders.parquet").count()  # JVM/footer warm-up
fn = e.queries()[entry]
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up exec
spark.catalog.clearCache()
t0 = time.time()
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
print("AB_RESULT " + json.dumps({"t": round(time.time() - t0, 3)}))
"""


def _measure(tree: str, entry: str, sf_dir: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, entry, sf_dir],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])["t"]
    raise RuntimeError(
        f"runner failed for {entry} in {tree}:\n{out.stdout[-2000:]}"
        f"\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ref", help="git ref of the OLD tree (the A side)")
    ap.add_argument("entries", nargs="+", help="registry entry names")
    ap.add_argument("--pairs", type=int, default=2,
                    help="A/B rounds per entry (default 2)")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # fail fast on a bad ref: under shell=True the pipeline returns TAR's
    # exit status, so an invalid ref would otherwise leave an empty A tree
    # and surface later as a confusing runner import error (ADVICE r10)
    subprocess.run(
        ["git", "rev-parse", "--verify", f"{args.ref}^{{commit}}"],
        cwd=repo, check=True, capture_output=True,
    )
    old = tempfile.mkdtemp(prefix="ab_bench_old_")
    subprocess.run(
        f"set -o pipefail; git archive {args.ref} | tar -x -C {old}",
        shell=True, cwd=repo, check=True, executable="/bin/bash",
    )
    print(f"A = {args.ref} (archived to {old})\nB = working tree {repo}\n")

    results: dict[str, dict[str, list[float]]] = {
        e: {"old": [], "new": []} for e in args.entries
    }
    for p in range(args.pairs):
        for entry in args.entries:
            for label, tree in (("old", old), ("new", repo)):
                t = _measure(tree, entry, args.sf_dir)
                results[entry][label].append(t)
                print(f"  pair {p + 1} {entry:40s} {label}: {t:7.2f} s",
                      flush=True)

    print()
    report = {}
    for entry, r in results.items():
        a, b = r["old"], r["new"]
        ratio = min(b) / min(a) if min(a) > 0 else float("inf")
        band = max(max(a) / min(a), max(b) / min(b))
        # disjoint time ranges + >1.3x = code-attributable; else box noise
        disjoint = min(b) > max(a) or min(a) > max(b)
        verdict = "regression" if (ratio > 1.3 and disjoint) else (
            "improvement" if (ratio < 1 / 1.3 and disjoint) else "noise"
        )
        report[entry] = {
            "old": a, "new": b, "ratio_min": round(ratio, 3),
            "noise_band": round(band, 3), "verdict": verdict,
        }
        print(f"{entry:40s} ratio(min B/A)={ratio:5.2f}  "
              f"band={band:4.2f}  -> {verdict}")
    print("\n" + json.dumps({"ref": args.ref, "sf_dir": args.sf_dir,
                             "entries": report}))


if __name__ == "__main__":
    main()
