"""Repo-wide physical-plan audit: every registry query's executed plan is
scanned for the three scale cliffs — CartesianProduct, nested-loop joins,
and single-partition exchanges.  Queries may appear in the allowlist ONLY
for the bounded patterns below; anything new that trips a flag fails the
suite until it is either fixed or consciously allowlisted with a reason.

Allowed patterns (all bounded by construction, not data volume):
- 1-ROW BROADCAST: a global scalar (corpus total, sample count, average)
  cross-joined back as a 1-row broadcast — plans as BroadcastNestedLoopJoin
  with a single-row build side.
- SINGLE-ROW REDUCE: a query whose OUTPUT is one (or a handful of) global
  aggregate rows needs one final single-partition exchange moving one row
  per upstream partition — map-side partial aggregation has already run.
- POST-LIMIT RANK: a row_number over an already-limited/tiny key set
  (distinct sources, top-k rows).
- SAMPLE QUADRATIC: dedup_lsh_recall_report's exact ground-truth join is
  the documented hash-sample-bounded quadratic.
"""

# query -> flags it is allowed to trip (see module docstring for why)
ALLOWED = {
    "text_unigram_surprisal": {"BNLJ", "SinglePartition"},   # 1-row corpus totals
    "corpus_interleave_sources": {"SinglePartition"},        # rank over distinct sources
    "q6_forecast_revenue": {"SinglePartition"},              # single-row output
    "q14_promo_share": {"SinglePartition"},                  # single-row output
    "q15_top_supplier": {"SinglePartition"},                 # global-max scalar subquery
    "q19_disjunctive_revenue": {"SinglePartition"},          # single-row output
    "q22_idle_customers": {"BNLJ", "SinglePartition"},       # 1-row avg-balance scalar
    "dedup_lsh_recall_report": {"BNLJ", "SinglePartition"},  # sample quadratic + 1-row counts
    "sim_srp_recall_report": {"BNLJ", "SinglePartition"},    # sample quadratic + 1-row counts
    "corpus_dedup_summary": {"BNLJ", "SinglePartition"},     # 1-row aggregates cross-joined
    "corpus_source_stats": {"BNLJ", "SinglePartition"},      # 1-row corpus-total broadcast
    "q_approx_distinct": {"SinglePartition"},                # single-row output
    "q17_small_qty_value": {"SinglePartition"},              # single-row output
    "q11_acctbal_share": {"BNLJ", "SinglePartition"},        # 1-row global-total broadcast
    "q_event_funnel": {"SinglePartition"},                   # 3-row stacked output
    "q_gapfill_daily": {"BNLJ", "SinglePartition"},          # 1-row calendar bounds
    # r5 additions
    "corpus_dedup_rate_curve": {"BNLJ"},                     # 9-row threshold-bar broadcast
    "corpus_importance_weights": {"BNLJ", "SinglePartition"},  # 1-row vocab totals
    "sim_srp_recall_curve": {"BNLJ", "SinglePartition"},     # sample quadratic + 24-row table range + 1-row totals
    "text_vocab_coverage": {"BNLJ", "SinglePartition"},      # top-k limit (≤10k rows) + 1-row total
    "corpus_source_drift": {"BNLJ", "SinglePartition"},      # 1-row corpus totals broadcast
    "q_orphan_audit": {"SinglePartition"},                   # 3 single-row audit aggregates
    "corpus_dedup_savings": {"BNLJ", "SinglePartition"},     # 1-row saved/total aggregates
    # r6 additions
    "q_funnel_conversion_time": {"SinglePartition"},         # single-row output
    "q_user_ltv_deciles": {"BNLJ", "SinglePartition"},       # 1-row revenue-total reduce + broadcast
    # r7 additions
    "corpus_curation_pipeline_v2": {"SinglePartition"},      # 1-row survivor-count reduce inlined to 6 stage rows
    "sim_knn_recall_report": {"BNLJ", "SinglePartition"},    # N_QUERIES-row broadcast ground truth + 1-row report
    # r8 additions: the 4 media rows-only entries append in-band 1-row
    # n_planted/n_planted_found aggregates (VERDICT r7 #3) — the same
    # 1-ROW BROADCAST + SINGLE-ROW REDUCE pattern as corpus_dedup_summary
    "multimodal_features": {"BNLJ", "SinglePartition"},
    "multimodal_image_near_dup": {"BNLJ", "SinglePartition"},
    "multimodal_audio_near_dup": {"BNLJ", "SinglePartition"},
    "multimodal_video_near_dup": {"BNLJ", "SinglePartition"},
    # sample quadratic ground truth + 1-row recall counts — the exact
    # srp_recall_report pattern, stratified (r8)
    "sim_cell_recall_report": {"BNLJ", "SinglePartition"},
    # r9: sample quadratic ground truth + 1-row stratified recall counts —
    # the same bounded pattern as the srp/cell recall reports
    "sim_sharded_recall_report": {"BNLJ", "SinglePartition"},
    # r10: waterfill window + λ scan over the SOURCE table (rows =
    # distinct sources, thousands at 100 TB) + 1-row totals broadcast
    "corpus_mix_schedule": {"BNLJ", "SinglePartition"},
    # r10: cumulative scan over the per-COUNT histogram (rows = distinct
    # per-key counts) + 1-row totals/percentile broadcasts
    "q_skew_report": {"BNLJ", "SinglePartition"},
    # r10: composes the waterfill schedule (same bounded source-table
    # window) before the broadcast sampling filter
    "corpus_mix_apply": {"BNLJ", "SinglePartition"},
    # r11: one global avg/min aggregate per curve depth — 1-row outputs
    # over the N_QUERIES-row per-query recall frame, the recall-report
    # pattern
    "sim_pq_recall_curve": {"SinglePartition"},
}


def test_no_unbounded_plan_cliffs(spark):
    import __spark_entry__ as e

    qs = e.queries()
    sf = "/root/testdata/sf0.001"
    violations = {}
    for name, fn in qs.items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        hits = set()
        if "CartesianProduct" in plan:
            hits.add("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan:
            hits.add("BNLJ")
        if "Exchange SinglePartition" in plan:
            hits.add("SinglePartition")
        extra = hits - ALLOWED.get(name, set())
        if extra:
            violations[name] = sorted(extra)
    assert not violations, violations
