"""Scale-stress harness: build a ~10× documents/embeddings corpus in /tmp
and time the operators whose cost curves bend at scale (LSH families,
blocked quadratics, the CC loop, the embedding grid).

The point is headroom evidence, not a benchmark: each operator's wall
time at 1× (sf0.1) vs 10× shows whether the implementation tracks its
designed cost curve (linear for signatures, bounded-quadratic per block,
diameter-bounded rounds) or hides a super-linear term.

Usage: python scripts/stress_scale.py [factor] [query ...]
(default factor 10, default queries = the full STRESS list)
Writes nothing outside /tmp; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_stress"


def build_corpus(spark, factor: int) -> str:
    """Replicate documents/embeddings `factor`× with remapped ids and a
    per-replica text perturbation (so not everything is an exact dup)."""
    from pyspark.sql import functions as F

    out = os.path.join(OUT, f"x{factor}")
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    big_docs = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * (n_docs * 10))
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string"))
            ),
        )
        .drop("rep")
    )
    big_docs.write.parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_emb = emb.count()
    big_emb = (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * (n_emb * 10))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x: x + (F.col("rep").cast("float") * F.lit(0.001)),
            ),
        )
        .drop("rep")
    )
    big_emb.write.parquet(f"{out}/embeddings.parquet")
    # events replicate too (streaming state stress): ids remapped, ts
    # shifted a week per replica so sessions/windows/join-state GROW with
    # the factor instead of piling onto the same day
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_ev = ev.count()
    ts_col = ev.schema["ts"].dataType.simpleString()
    shifted = (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * (n_ev * 10))
        .withColumn(
            "ts",
            F.col("ts") + (F.col("rep") * (604800 * 10**9)).cast("long")
            if ts_col == "bigint"  # nanos-as-long encoding: shift in NANOS
            else F.timestamp_micros(
                F.unix_micros(F.col("ts").cast("timestamp"))
                + F.col("rep") * (604800 * 10**6)  # micros
            ).cast(ev.schema["ts"].dataType),
        )
        .drop("rep")
    )
    shifted.write.parquet(f"{out}/events.parquet")
    return out


STRESS = [
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_pairs",
    "dedup_connected_components",
    "sim_cosine_topk",
    "sim_ann_lsh_topk",
    "sim_ivf_topk",
    "corpus_hash_split",
    "corpus_pack_sequences",
    "text_quality_score",
    "text_unigram_surprisal",
    "corpus_length_buckets",
    "corpus_build_training_set",
    "text_bm25_topk",
    "corpus_token_budget",
    "text_bigram_pmi",
    "dedup_minhash_incremental",
    "dedup_embedding_incremental",
    "dedup_semantic",
    "stream_sessionize",
    "stream_click_attribution",
    "stream_user_totals",
]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    targets = sys.argv[2:] or STRESS
    import __spark_entry__ as e
    from priority_data_pipeline_postgres_db_spark.session import get_spark

    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    big_dir = build_corpus(spark, factor)
    results: dict[str, dict] = {}
    from priority_data_pipeline_postgres_db_spark.streaming.incremental import (
        LAST_STREAM_PROGRESS,
    )

    for name in targets:
        if name not in qs:
            continue
        spark.catalog.clearCache()
        t0 = time.time()
        base_rows = qs[name](spark, BASE).count()
        t_base = time.time() - t0
        state_1x = LAST_STREAM_PROGRESS.pop(name, None)
        spark.catalog.clearCache()
        t0 = time.time()
        big_rows = qs[name](spark, big_dir).count()
        t_big = time.time() - t0
        state_big = LAST_STREAM_PROGRESS.pop(name, None)
        results[name] = {
            "t1x": round(t_base, 2),
            f"t{factor}x": round(t_big, 2),
            "ratio": round(t_big / max(t_base, 1e-9), 1),
            "rows_1x": base_rows,
            f"rows_{factor}x": big_rows,
        }
        if state_1x or state_big:
            # state-store evidence: peak rows/bytes across micro-batches
            results[name]["state_1x"] = state_1x
            results[name][f"state_{factor}x"] = state_big
        print(f"{name:32s} {t_base:7.2f}s -> {t_big:8.2f}s  x{results[name]['ratio']}", file=sys.stderr)
    print(json.dumps({"factor": factor, "results": results}))


if __name__ == "__main__":
    main()
