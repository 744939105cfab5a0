"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints the
full per-query timing dict on the penultimate line (also mirrored to
BENCH_detail_last.json), then a compact FINAL JSON line — {"metric",
"value" (total sec), "unit", "n_queries", "sf", "slowest"} — kept under
2000 chars so the driver's stdout-tail capture can always parse it.

Execution is forced with the noop sink (full plan runs, nothing collected,
no driver materialization skew). One warm-up action runs first so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan+filter, flatten, window, union, aggs, star joins,
# sessionize, and (when present) the beyond-reference operator suites.
HEADLINE = [
    "s2_watermark_scan",
    "j1_subform_flatten",
    "o1_latest_per_key",
    "k1_incremental_union",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_region_revenue",
    "q_star_region_summary",
    "q_events_rollup",
    "q_sessionize",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_embedding_pairs",
    "dedup_embedding_exact",
    "dedup_semantic",
    "text_quality_score",
    "text_lang_id",
    "sim_cosine_topk",
    "sim_ann_lsh_topk",
    "q_cube_region_nation",
    "q_pivot_returnflag",
    "j_asof_join",
    "set_except_high_qty",
    "multimodal_features",
    "text_tfidf_top_terms",
    "dedup_connected_components",
    "dedup_minhash_verified",
    "corpus_hash_split",
    "corpus_pack_sequences",
    "corpus_build_training_set",
    "corpus_decontaminate",
    "corpus_redact_pii",
    "corpus_quality_sample",
    "text_repetition_score",
    "q4_late_ship_priority",
    "q13_order_distribution",
    "q17_small_qty_value",
    "q11_acctbal_share",
    "text_unigram_surprisal",
    "corpus_length_buckets",
    "stream_event_rollup",
    "q_profile_orders",
    "q_event_funnel",
    "q_cohort_retention",
    "q_salted_segment_revenue",
    "q_rollup_orderdate",
    "corpus_chunk_documents",
    "q_value_percentiles",
    "stream_sessionize",
    "j_range_join_binned",
    "j_full_outer_reconcile",
    "q_sliding_event_rate",
    "corpus_sample_stratified",
    "text_ngram_novelty",
    "q_gapfill_daily",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q16_supplier_part_count",
    "q20_dominant_shippers",
    "text_bm25_topk",
    "corpus_token_budget",
    "stream_click_attribution",
    "corpus_interleave_sources",
    "dedup_minhash_incremental",
    "q_top_parts_per_nation",
    "stream_category_rollup",
    "stream_user_totals",
    "dedup_embedding_incremental",
    "dedup_containment_pairs",
    "text_heavy_hitters",
    "corpus_dup_rate_by_source",
    "stream_exact_dedup",
    "stream_sessionize_append",
    "sim_knn_join",
    "dedup_substring_pairs",
    "corpus_exact_substring_dedup",
    "corpus_keep_best_in_cluster",
    "text_token_entropy",
    "stream_trending_topk",
    "text_zipf_fit",
    "q_rfm_segmentation",
    "corpus_quality_histogram",
    "multimodal_image_near_dup",
    "corpus_pack_sequences_sharded",
    "dedup_lsh_recall_report",
    "dedup_cc_incremental",
    "q_market_basket_pairs",
    "corpus_dedup_summary",
    "sim_diversity_sample",
    "stream_odata_ingest",
    "sim_embedding_health",
    "corpus_source_stats",
    "q_rolling_active_users",
    "sim_srp_recall_report",
    # r5 additions
    "q12_late_priority_mix",
    "q18_large_orders",
    "k1_time_travel_read",
    "k1_schema_evolution_read",
    "corpus_repetition_gate",
    "corpus_blocklist_filter",
    "corpus_packing_efficiency",
    "corpus_importance_weights",
    "corpus_bigram_lm_score",
    "corpus_dedup_rate_curve",
    "text_hashed_features",
    "sim_knn_join_full",
    "sim_srp_recall_curve",
    "multimodal_audio_near_dup",
    "multimodal_video_near_dup",
    "sim_ivf_persisted",
    "stream_odata_keyset_ingest",
    "corpus_chunk_dedup",
    "text_vocab_coverage",
    "j_interval_overlap",
    "q_yoy_growth",
    "q_orphan_audit",
    "corpus_cluster_size_histogram",
    "corpus_source_drift",
    "q_percent_rank_customers",
    "q_customer_tenure",
    "corpus_dedup_savings",
    "corpus_curation_pipeline",
    "q_abc_analysis",
    # r6 additions
    "corpus_gopher_rules",
    "corpus_tokenizer_fertility",
    "corpus_safety_profile",
    "corpus_crosssplit_contamination",
    "sim_source_centroid_similarity",
    "q_attribution_linear",
    "q_funnel_conversion_time",
    "q_user_ltv_deciles",
    "o_scd2_intervals",
    "k1_compact_roundtrip",
    "stream_cdc_upsert",
    # r7 additions
    "corpus_curation_pipeline_v2",
    "corpus_decontaminate_bloom",
    "sim_knn_recall_report",
    "j_fuzzy_match_parts",
    "j_fuzzy_match_parts_sharded",
    "q_part_pagerank",
    "q_session_transitions",
    "dedup_jaccard_prefix",
    # r8 additions
    "j_entity_clusters",
    "dedup_multi_signal",
    "stream_semantic_dedup",
    "q_quality_linreg",
    "dedup_semantic_cells",
    "sim_cell_recall_report",
    # r9: past-envelope sharding family, trainable k-means, outer
    # stream-stream join, and the two lakehouse maintenance ops
    "dedup_semantic_sharded",
    "dedup_semantic_cascade",
    "sim_sharded_recall_report",
    "q_kmeans_docstats",
    "stream_attribution_outer",
    "k1_snapshot_expiry",
    "k1_zorder_scan",
    "corpus_bpe_merges",
    "corpus_bpe_encode_pretrained",
    "q_triangle_count",
    "q_dq_expectations",
    "k1_table_changes",
    "dedup_semantic_resharded",
    # r10: planner-sized amplified run, artifact-backed BPE encode paths,
    # and the append-only CDC feed
    "dedup_semantic_planned",
    "corpus_bpe_apply_holdout",
    "k1_table_changes_append",
    "corpus_mix_schedule",
    "corpus_mix_apply",
    "q_skew_report",
    "k1_cdc_poll_cycle",
    # r11: auto-sized skew mitigation on the star join, planner-sized
    # MinHash geometry, the production-default semantic planner path,
    # artifact-backed mixture pipeline, streaming CDC source, and the
    # PQ ANN pair (top-k + its recall curve instrument)
    "j_skew_salted_star",
    "dedup_minhash_planned",
    "dedup_semantic_planned_prod",
    "corpus_mix_pipeline",
    "stream_staging_cdc_ingest",
    "sim_pq_topk",
    "sim_pq_recall_curve",
    "sim_ivfpq_persisted",
    # r12: manifest-backed staging unchanged entries re-covered above;
    # probe-once skew-plan reuse and the incremental IVFPQ lifecycle
    "j_skew_plan_reuse",
    "sim_ivfpq_append",
    "sim_pq_append",
    # r13: the versioned-index lifecycle — build gen-1, append, refit,
    # atomic pointer swap, query the new generation — and the hands-free
    # maintenance loop (append turns + postings bin-pack past the bound)
    "sim_ivfpq_refit",
    "sim_ivfpq_maintain",
    "stream_index_maintain",
    # r13 continuation: zone-map data skipping + dynamic file pruning
    "k1_stats_pruned_read",
    "j_dynamic_file_prune",
    "k1_expectations_ingest",
    "k1_maintain_turns",
    "k1_delete_rows",
    "k1_update_rows",
]


def main() -> None:
    import __spark_entry__ as e
    from priority_data_pipeline_postgres_db_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm-up: JVM + parquet footer reads
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()

    timings: dict[str, float] = {}
    for name in names:
        # steady-state measurement: one warm-up execution absorbs python
        # worker spin-up / codegen / operator-internal cache population,
        # then the timed run reflects per-query cost. clearCache first so
        # queries don't interfere through leftover cached plans.  Also
        # drop leaked RDD blocks (localCheckpoint barriers aren't SQL
        # cache entries): across ~100 executions they otherwise fill the
        # old gen and full-GC pauses land on random later queries.
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(False)
        # ~80 queries of freed plans/blocks pile into the JVM old gen and
        # full-GC pauses land on random later queries (spot-checked: the
        # same query in a fresh session runs ~1.3× faster than late in the
        # bench loop).  An explicit collection between queries keeps each
        # measurement on a quiet heap.
        spark.sparkContext._jvm.System.gc()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df2 = qs[name](spark, SF_DIR)
        df2.write.format("noop").mode("overwrite").save()
        t = time.time() - t0
        if t < 3.0:
            # single-shot sub-3 s timings swing ±60% on a busy sandbox
            # (VERDICT r7 #5: 3.38 s driver vs 2.09 s in two clean local
            # pairs for the same query) — report the median of 3 so the
            # driver artifact is trustworthy for regression detection.
            # Entries ≥3 s stay single-shot: their relative noise is
            # small and two extra runs of the slow tail would double the
            # bench wall.
            reruns = [t]
            for _ in range(2):
                # clearCache between reruns (ADVICE r8): CacheManager
                # matches bounded_cache'd subtrees by logical plan across
                # the fresh DataFrame objects, so without this the rerun
                # medians are systematically warmer than the single-shot
                # ≥3 s timings and prior-round artifacts they're
                # geomean-compared against.
                spark.catalog.clearCache()
                t0 = time.time()
                d = qs[name](spark, SF_DIR)
                d.write.format("noop").mode("overwrite").save()
                reruns.append(time.time() - t0)
            t = sorted(reruns)[1]
        timings[name] = round(t, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Full per-query detail goes on an EARLIER line (and to a sidecar
    # file): at 130+ queries the dict is ~4 KB, and the driver keeps only
    # the last 2000 chars of stdout — BENCH_r02..r06 were all unparseable
    # because the one fat line got truncated.  The FINAL line is a compact
    # summary guaranteed to fit the tail capture.
    detail = {
        "metric": "headline_queries_detail",
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    print(json.dumps(detail))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_detail_last.json"),
            "w",
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    # shrink the slowest dict until the final line fits the driver's
    # 2000-char stdout-tail capture (ADVICE r7: a hard assert here could
    # abort AFTER all queries had already run, losing the whole run)
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    for n_slow in range(15, 0, -1):
        summary = json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "n_queries": len(timings),
                "sf": float(sf),
                "slowest": dict(ranked[:n_slow]),
            }
        )
        if len(summary) < 1900:
            break
    else:
        # even the 1-entry summary blew the cap (ADVICE r8): drop
        # "slowest" entirely so the captured line is always valid JSON
        # instead of a mid-object truncation in the driver's 2000-char
        # stdout tail.
        summary = json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "n_queries": len(timings),
                "sf": float(sf),
            }
        )
    print(summary)


if __name__ == "__main__":
    main()
