"""Physical-plan assertions: the optimizations the engine is designed
around must actually appear in the executed plan (SURVEY.md §4) — a
regression here is a silent 100×-at-scale cost, not a wrong answer."""

import io
import contextlib

import pytest

from priority_data_pipeline_postgres_db_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_watermark_filter_pushed_to_scan(spark):
    plan = formatted_plan(Q.s2_watermark_scan(spark, SF))
    assert "GreaterThanOrEqual(o_orderdate" in plan  # S2 reaches the parquet reader


def test_projection_prunes_scan_columns(spark):
    plan = formatted_plan(Q.p2_projection_prune(spark, SF))
    # only the 3 projected columns + the filter column are read
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ["l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"]:
        assert col in schema_line
    assert "l_partkey" not in schema_line
    assert "l_quantity" not in schema_line


def test_q1_uses_partial_aggregation(spark):
    plan = physical(Q.q1_pricing_summary(spark, SF))
    # map-side combine: two HashAggregates around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_dim_joins_broadcast(spark):
    for q in [Q.q3_top_unshipped, Q.q5_region_revenue, Q.q_star_region_summary]:
        plan = physical(q(spark, SF))
        assert "BroadcastHashJoin" in plan, q.__name__
        # no accidental cartesian
        assert "CartesianProduct" not in plan, q.__name__


def test_q3_customer_scan_pruned_and_filtered(spark):
    plan = formatted_plan(Q.q3_top_unshipped(spark, SF))
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter at the scan
    cust_schema = [l for l in plan.splitlines() if "ReadSchema" in l and "c_custkey" in l]
    assert cust_schema and "c_name" not in cust_schema[0]  # unused dim cols pruned


def test_limit_probe_is_pushed_limit(spark):
    plan = physical(Q.s4_limit_probe(spark, SF))
    assert "TakeOrderedAndProject" in plan or "Limit" in plan


def test_hash_split_no_shuffle_pruned_scan(spark):
    """The split is pure per-row expressions: zero exchanges, and the scan
    reads only the two referenced columns."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import corpus_hash_split

    df = corpus_hash_split(spark, SF)
    plan = physical(df)
    assert "Exchange" not in plan
    schema_line = next(l for l in formatted_plan(df).splitlines() if "ReadSchema" in l)
    assert "doc_id" in schema_line and "lang" in schema_line
    assert "text" not in schema_line  # the wide column is pruned


def test_pack_sequences_single_window_shuffle(spark):
    """Packing costs exactly ONE shuffle (the per-lang window sort)."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_pack_sequences,
    )

    plan = physical(corpus_pack_sequences(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_ngram_cap_is_broadcast_anti_join(spark):
    """The hot-block cap must not add a shuffled join: block counts
    broadcast into a left-anti join."""
    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )

    plan = physical(dedup_ngram_jaccard(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_q4_exists_is_left_semi_join(spark):
    """EXISTS must execute as a semi join (no row multiplication), with
    the non-equi ship>order predicate as a join residual."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q4_late_ship_priority,
    )

    plan = physical(q4_late_ship_priority(spark, SF))
    assert "LeftSemi" in plan


def test_q17_single_lineitem_scan(spark):
    """The window formulation must read lineitem ONCE (the correlated-SQL
    form decorrelates into three scans) and broadcast the brand dim."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q17_small_qty_value,
    )

    plan = physical(q17_small_qty_value(spark, SF))
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan and "Window" in plan


def test_q13_outer_join_survives_condition_filter(spark):
    """The status filter lives in the join condition — the join must stay
    LeftOuter (a WHERE would silently turn it inner and drop zero-order
    customers from the histogram)."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q13_order_distribution,
    )

    plan = physical(q13_order_distribution(spark, SF))
    assert "LeftOuter" in plan


def test_q11_total_is_broadcast(spark):
    """The 1-row global total must reach the share filter via broadcast,
    never a shuffled cross join."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q11_acctbal_share,
    )

    plan = physical(q11_acctbal_share(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_funnel_single_exchange(spark):
    """All three stage windows and the per-user rollup share ONE shuffle
    on user_id (the join-chain formulation would shuffle three times)."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import q_event_funnel

    plan = physical(q_event_funnel(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_profile_null_handling(spark):
    """The profiler's null paths (testdata has no nulls): null rows count
    in n_rows but not n_nonnull/n_distinct/min/max; an all-null column
    reports zeros and null bounds."""
    import pyspark.sql.functions as F
    from priority_data_pipeline_postgres_db_spark.plans.analytics import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "a"), (None, None)],
        "x int, s string",
    ).withColumn("z", F.lit(None).cast("int"))
    got = {r["col_name"]: r for r in profile(
        df, [(c, F.col(c).cast("string")) for c in ["x", "s", "z"]]
    ).collect()}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["x"]["n_nonnull"] == 2 and got["x"]["n_distinct"] == 2
    assert got["x"]["min_val"] == "1" and got["x"]["max_val"] == "2"
    assert got["s"]["n_nonnull"] == 2 and got["s"]["n_distinct"] == 1
    assert got["z"]["n_nonnull"] == 0 and got["z"]["n_distinct"] == 0
    assert got["z"]["min_val"] is None and got["z"]["max_val"] is None


def test_range_join_is_equi_not_nested_loop(spark):
    """The binned range join must execute as a hash equi-join on
    (user, bin) — never a nested-loop/cartesian plan."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        j_range_join_binned,
    )

    plan = physical(j_range_join_binned(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_load_normalizes_events_ts_across_parquet_encodings(spark, tmp_path):
    """The driver has shipped events.ts as TIMESTAMP(NANOS) (round 1) and
    as timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ (round 2);
    load() must yield identical session-TZ TIMESTAMP values for both."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from priority_data_pipeline_postgres_db_spark.plans.tables import load

    stamps = [
        dt.datetime(2024, 1, 5, 12, 0, 0, 123456),
        dt.datetime(2024, 1, 6, 23, 59, 59, 999999),
    ]
    for unit, sub in (("ns", "nanos"), ("us", "ntz")):
        d = tmp_path / sub
        d.mkdir()
        tbl = pa.table({"ts": pa.array(stamps, type=pa.timestamp(unit))})
        pq.write_table(tbl, str(d / "events.parquet"))

    a = load(spark, str(tmp_path / "nanos"), "events")
    b = load(spark, str(tmp_path / "ntz"), "events")
    assert a.schema["ts"].dataType.simpleString() == "timestamp"
    assert b.schema["ts"].dataType.simpleString() == "timestamp"
    got_a = sorted(r["ts"] for r in a.collect())
    got_b = sorted(r["ts"] for r in b.collect())
    assert got_a == got_b == stamps


def test_bm25_plan_broadcasts_df_and_takes_topk(spark):
    """BM25's df table rides a broadcast join and the global top-k is
    TakeOrderedAndProject — never a full sort of the scored set."""
    from priority_data_pipeline_postgres_db_spark.functions.text import text_bm25_topk

    plan = physical(text_bm25_topk(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_token_budget_plan_has_no_global_window(spark):
    """The running sum must be the per-bucket window (partitionBy qb) plus
    a broadcast offset — a global ORDER BY window would collapse the
    corpus onto one partition.  The Window spec must carry a partition
    key, and whole buckets past the budget are pruned by an isin filter
    before the sort."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_token_budget,
    )

    plan = physical(corpus_token_budget(spark, SF))
    assert "Window" in plan
    # every Window operator line must carry the qb partition key — a
    # global-order window prints an empty partition spec on its line
    win = [ln for ln in plan.splitlines() if "Window" in ln and "sum" in ln.lower()]
    assert win and all("qb" in ln for ln in win)


def test_approx_distinct_error_bounded(spark):
    """q_approx_distinct is rows-only in the gate (HLL sketches are
    engine-specific, so no value hash) — this pins the accuracy contract
    instead: the HLL++ estimate must sit within a few rsd of the exact
    count it is computed alongside (rsd=0.02 configured; 3x margin keeps
    the check deterministic-tight without over-fitting one dataset)."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import q_approx_distinct

    row = q_approx_distinct(spark, SF).collect()[0]
    exact, approx = row["exact_parts"], row["approx_parts"]
    assert exact > 0
    assert abs(approx - exact) / exact <= 3 * 0.02


def test_bigram_pmi_plan_broadcasts_unigrams(spark):
    """Both unigram join sides broadcast; top-k is TakeOrderedAndProject."""
    from priority_data_pipeline_postgres_db_spark.functions.text import text_bigram_pmi

    plan = physical(text_bigram_pmi(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan


def test_embedding_incremental_plan_no_cartesian(spark):
    """The incremental embedding candidate join is a bucket equi-join —
    never a cartesian/nested-loop product — and the exact-verify joins
    fetch vectors by key."""
    from priority_data_pipeline_postgres_db_spark.operators.similarity import (
        dedup_embedding_incremental,
    )

    plan = physical(dedup_embedding_incremental(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_approx_percentile_tracks_exact(spark):
    """q_value_percentiles pins exact semantics and documents
    approx_percentile (t-digest, mergeable partials) as the warehouse
    path — this pins the accuracy of that path: the sketch estimate must
    sit within 2% relative error of the exact percentile per status
    group, so switching at scale is a measured trade, not a leap."""
    import pyspark.sql.functions as F
    from priority_data_pipeline_postgres_db_spark.plans.tables import load

    orders = load(spark, SF, "orders")
    both = orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx_p50"),
        F.expr("percentile(o_totalprice, 0.99)").alias("exact_p99"),
        F.expr("approx_percentile(o_totalprice, 0.99, 10000)").alias("approx_p99"),
    )
    for r in both.collect():
        assert abs(r["approx_p50"] - r["exact_p50"]) / r["exact_p50"] < 0.02
        assert abs(r["approx_p99"] - r["exact_p99"]) / r["exact_p99"] < 0.02


def test_rfm_segmentation_scores(spark, sf_dir):
    """Quintile invariants: every customer scored, scores in 1..5 with
    balanced bucket sizes, and the most recent/frequent/biggest spenders
    land in bucket 5."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_rfm_segmentation,
    )

    rows = q_rfm_segmentation(spark, sf_dir).collect()
    n = len(rows)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert n == orders.select("o_custkey").distinct().count()
    for dim in ("r_score", "f_score", "m_score"):
        got = sorted(r[dim] for r in rows)
        assert got[0] == 1 and got[-1] == 5
        sizes = [got.count(b) for b in range(1, 6)]
        assert max(sizes) - min(sizes) <= 1  # ntile balance
    oldest = min(rows, key=lambda r: (-r["recency_days"], r["custkey"]))
    assert oldest["r_score"] == 1  # longest-inactive customer scores lowest
    top_m = min(rows, key=lambda r: (-r["monetary"], r["custkey"]))
    assert top_m["m_score"] == 5
    for r in rows:
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"


def test_quality_histogram_accounts_for_all_docs(spark, sf_dir):
    """Histogram mass equals the corpus; deciles are consistent with the
    per-doc quality scores."""
    from priority_data_pipeline_postgres_db_spark.functions.text import (
        text_quality_score,
    )
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        corpus_quality_histogram,
    )

    hist = corpus_quality_histogram(spark, sf_dir).collect()
    per_doc = text_quality_score(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in hist) == len(per_doc)
    for r in hist:
        assert 0 <= r["decile"] <= 9
        lo, hi = r["decile"] / 10, (r["decile"] + 1) / 10
        assert lo <= r["avg_quality"] <= (1.0 if r["decile"] == 9 else hi) + 1e-4


def test_rfm_plan_has_no_single_partition_exchange(spark, sf_dir):
    """The quintile scoring must not funnel the customer frame through an
    Exchange SinglePartition (the unpartitioned-window scale cliff)."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_rfm_segmentation,
    )

    plan = (
        q_rfm_segmentation(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_market_basket_pairs_support_and_lift(spark, sf_dir):
    """Counts, support, and lift agree with a Python recomputation over
    the raw baskets; every emitted pair meets min support."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        BASKET_MIN_SUPPORT,
        q_market_basket_pairs,
    )

    rows = q_market_basket_pairs(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    from collections import Counter

    pair_c: Counter = Counter()
    part_c: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        part_c.update(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_c[(a, b)] += 1
    n = len(baskets)
    expect = {k: c for k, c in pair_c.items() if c >= BASKET_MIN_SUPPORT}
    got = {(r["part_a"], r["part_b"]): r for r in rows}
    assert set(got) == set(expect)
    for k, r in got.items():
        assert r["n_orders_together"] == expect[k]
        assert r["support"] == expect[k] / n
        assert r["lift"] == (expect[k] * n) / (part_c[k[0]] * part_c[k[1]])


def test_market_basket_no_cartesian_and_broadcast_counts(spark, sf_dir):
    """Pair generation must stay an order-keyed equi-join (never a
    cartesian/nested-loop over parts), and the per-part count joins are
    broadcastable."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_market_basket_pairs,
    )

    plan = (
        q_market_basket_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan


def test_keep_best_in_cluster_plan_shape(spark, sf_dir):
    """Survivor selection: windows partition by component (never global),
    no cartesian anywhere in the composed CC + quality chain."""
    from priority_data_pipeline_postgres_db_spark.operators.corpus import (
        corpus_keep_best_in_cluster,
    )

    plan = (
        corpus_keep_best_in_cluster(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    specs = plan.split("windowspecdefinition(")[1:]
    assert specs and all(seg.startswith("component#") for seg in specs)


def test_rolling_active_users_matches_python(spark, sf_dir):
    """DAU/WAU recomputed naively from raw events agree for every day."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_rolling_active_users,
    )

    rows = {r["day"]: r for r in q_rolling_active_users(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_day: dict = {}
    for r in ev:
        by_day.setdefault(r["ts"].date(), set()).add(r["user_id"])
    import datetime as dt

    for day, users in by_day.items():
        wau = set()
        for back in range(7):
            wau |= by_day.get(day - dt.timedelta(days=back), set())
        assert rows[day]["dau"] == len(users)
        assert rows[day]["wau"] == len(wau)
        assert rows[day]["stickiness"] == len(users) / len(wau)
    assert set(rows) == set(by_day)


def test_interval_overlap_binned_matches_naive(spark, sf_dir):
    """The binned equi-join equals a naive theta-join on the fixture, and
    overlapping pairs are oriented (a < b) exactly once."""
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        j_interval_overlap,
    )

    got = {(r["o_custkey"], r["ok_a"], r["ok_b"])
           for r in j_interval_overlap(spark, sf_dir).collect()}
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_custkey", F.col("o_orderkey").alias("ok"),
            F.col("o_orderdate").cast("date").alias("s"),
            F.date_add("o_orderdate", 7).alias("e"),
        )
        .collect()
    )
    by_cust = {}
    for r in o:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    naive = set()
    for ck, rows in by_cust.items():
        for i, a in enumerate(rows):
            for b in rows[i + 1:]:
                lo, hi = (a, b) if a["ok"] < b["ok"] else (b, a)
                if lo["s"] < hi["e"] and hi["s"] < lo["e"]:
                    naive.add((ck, lo["ok"], hi["ok"]))
    assert got == naive and got


def test_orphan_audit_detects_planted_orphan(spark, tmp_path, sf_dir):
    """A lineitem pointing at a missing order shows up with count 1."""
    import shutil

    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_orphan_audit,
    )

    d = str(tmp_path)
    for t in ("orders", "customer", "nation"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    # lineitem becomes a directory so the orphan can land as a second file
    base = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base.write.parquet(f"{d}/lineitem.parquet")
    # cast matters: a bare lit() is int32, and a directory whose two
    # files disagree on the column's physical type reads through ONE
    # file's footer — which footer wins depends on listing order, so the
    # type clash only exploded when other tests shifted the ordering
    base.limit(1).withColumn(
        "l_orderkey", F.lit(999_999_999).cast("long")
    ).write.mode("append").parquet(f"{d}/lineitem.parquet")
    got = {r["relationship"]: r["n_orphans"]
           for r in q_orphan_audit(spark, d).collect()}
    assert got["lineitem->orders"] == 1
    assert got["orders->customer"] == 0
    assert got["customer->nation"] == 0


def test_yoy_growth_lag_semantics(spark, sf_dir):
    """First year per nation has NULL growth; growth matches the revenue
    ratio recomputed from the same rows."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_yoy_growth,
    )

    rows = q_yoy_growth(spark, sf_dir).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append(r)
    for name, rs in by_nation.items():
        rs.sort(key=lambda r: r["yr"])
        assert rs[0]["yoy_growth"] is None
        for prev, cur in zip(rs[:-1], rs[1:]):
            if cur["yoy_growth"] is not None:
                expect = (cur["revenue"] - prev["revenue"]) / prev["revenue"]
                assert abs(cur["yoy_growth"] - expect) < 1e-9


def test_abc_analysis_pareto_invariants(spark, sf_dir):
    """Cumulative share is monotone within nation, ends at 1.0, and the
    A/B/C cuts respect the 0.8/0.95 boundaries."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_abc_analysis,
    )

    rows = q_abc_analysis(spark, sf_dir).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["c_nationkey"], []).append(r)
    for nk, rs in by_nation.items():
        rs.sort(key=lambda r: r["rnk"])
        prev = 0.0
        for r in rs:
            assert r["cum_share"] >= prev - 1e-12
            prev = r["cum_share"]
            if r["abc"] == "A":
                assert r["cum_share"] <= 0.8
            elif r["abc"] == "B":
                assert 0.8 < r["cum_share"] <= 0.95
            else:
                assert r["cum_share"] > 0.95
        assert abs(rs[-1]["cum_share"] - 1.0) < 1e-9


def test_attribution_linear_credits_split_exactly(spark, tmp_path):
    """Planted journey: purchase P1 has two in-window touches (view+click)
    -> each gets 0.5; P2 has one click -> 1.0; a touch OUTSIDE the 7-day
    lookback and a touch AFTER the purchase earn nothing."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_attribution_linear,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def row(eid, ts, uid, etype):
        return {"event_id": eid, "ts": ts, "user_id": uid,
                "event_type": etype, "value": 1.0, "props": "{}"}

    rows = [
        row(1, t0 - dt.timedelta(days=2), 7, "view"),     # in window for P1
        row(2, t0 - dt.timedelta(hours=1), 7, "click"),   # in window for P1
        row(3, t0 - dt.timedelta(days=9), 7, "view"),     # outside 7-day window
        row(4, t0 + dt.timedelta(hours=1), 7, "view"),    # after purchase
        row(5, t0, 7, "purchase"),                        # P1
        row(6, t0 - dt.timedelta(days=1), 8, "click"),    # sole touch for P2
        row(7, t0, 8, "purchase"),                        # P2
        row(8, t0, 9, "view"),                            # user with no purchase
    ]
    tbl = pa.Table.from_pylist(rows)
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {r["channel"]: r for r in q_attribution_linear(spark, str(tmp_path)).collect()}
    assert got["view"]["touch_rows"] == 1 and got["view"]["attributed_conversions"] == 0.5
    assert got["click"]["touch_rows"] == 2
    assert got["click"]["attributed_conversions"] == 1.5
    assert got["click"]["conversions_touched"] == 2


def test_funnel_conversion_time_strictly_after_first_view(spark, sf_dir):
    """The aggregate reconciles with a driver-side replay on the raw
    events: converters counts users whose first purchase is strictly
    after their first view; avg is the exact mean of the deltas."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_funnel_conversion_time,
    )

    row = q_funnel_conversion_time(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_user = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    deltas = []
    viewers = 0
    for evs in by_user.values():
        views = [e["ts"] for e in evs if e["event_type"] == "view"]
        if not views:
            continue
        viewers += 1
        t1 = min(views)
        purch = [e["ts"] for e in evs if e["event_type"] == "purchase" and e["ts"] > t1]
        if purch:
            t2 = min(purch)
            deltas.append(int(t2.timestamp()) - int(t1.timestamp()))
    assert row["viewers"] == viewers
    assert row["converters"] == len(deltas)
    assert row["avg_seconds"] == sum(deltas) / len(deltas)
    assert row["min_seconds"] == min(deltas) and row["max_seconds"] == max(deltas)


def test_ltv_deciles_shape_and_share(spark, sf_dir):
    """10 deciles, near-equal user counts (first n%10 one larger), shares
    sum to 1, and decile 1 (top spenders) dominates decile 10."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_user_ltv_deciles,
    )

    rows = {r["decile"]: r for r in q_user_ltv_deciles(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, 11))
    counts = [rows[d]["n_users"] for d in range(1, 11)]
    assert max(counts) - min(counts) <= 1
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-9
    assert rows[1]["revenue"] > rows[10]["revenue"]
    assert rows[1]["avg_revenue_per_user"] >= rows[10]["avg_revenue_per_user"]


def test_compact_roundtrip_is_pure_physical_rewrite(spark, sf_dir):
    """Read-before-compact equals read-after-compact row-for-row, and
    compaction actually collapses the physical batch count to one."""
    import tempfile

    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.operators.staging import (
        StagingWarehouse,
    )
    from priority_data_pipeline_postgres_db_spark.plans.tables import load

    root = tempfile.mkdtemp(prefix="compact_rt_test_")
    wh = StagingWarehouse(spark, root)
    wh.set_upsert_keys("ev_c", pk=["event_id"], order_col="ver")
    ev = load(spark, sf_dir, "events")
    wh.write(ev.withColumn("ver", F.lit(1)), "ev_c", incremental=True, batch_id="b1")
    wh.write(
        ev.filter(F.col("ts") >= "2024-01-15").withColumn("ver", F.lit(2)),
        "ev_c",
        incremental=True,
        batch_id="b2",
    )
    before = {(r["event_id"], r["ver"]) for r in wh.read("ev_c").collect()}
    assert len(wh.snapshots("ev_c")) == 2
    wh.compact("ev_c")
    after = {(r["event_id"], r["ver"]) for r in wh.read("ev_c").collect()}
    assert before == after
    assert len(wh.snapshots("ev_c")) == 1


def test_scd2_intervals_reconstruct_history(spark, sf_dir):
    """Intervals tile each user's timeline: versions are contiguous from
    1, consecutive intervals differ in event_type, valid_to chains to
    the next valid_from, and n_events sums to the user's event count."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        o_scd2_intervals,
    )

    rows = o_scd2_intervals(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    total = 0
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        for a, b in zip(ivs, ivs[1:]):
            assert a["event_type"] != b["event_type"]
            assert a["valid_to"] == b["valid_from"]
        assert ivs[-1]["valid_to"] is None
        total += sum(r["n_events"] for r in ivs)
    assert total == ev.count()


def test_fuzzy_match_parts_planted_near_dupes(spark, tmp_path):
    """Token-order variants and 1-edit typos within a brand are found;
    cross-brand twins and far-apart names are not (blocking + window
    semantics, not just distance)."""
    import os

    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        j_fuzzy_match_parts,
    )

    rows = [
        (1, "red widget", "Brand#1", "T", 1, 1.0),
        (2, "widget red", "Brand#1", "T", 1, 1.0),   # token-order variant of 1
        (3, "red widgets", "Brand#1", "T", 1, 1.0),  # 1-edit typo of 1
        (4, "red widget", "Brand#2", "T", 1, 1.0),   # exact twin, other block
        (5, "zzz unrelated thing", "Brand#1", "T", 1, 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    d = str(tmp_path / "fz")
    df.write.parquet(os.path.join(d, "part.parquet"))
    got = {
        frozenset((r["part_a"], r["part_b"])): r["dist"]
        for r in j_fuzzy_match_parts(spark, d).collect()
    }
    assert got.get(frozenset((1, 2))) == 0   # canonicalization collapses order
    assert got.get(frozenset((1, 3))) == 1
    assert got.get(frozenset((2, 3))) == 1
    assert not any(4 in p for p in got)      # blocking: never crosses brands
    assert not any(5 in p for p in got)      # far name, beyond max_dist


def test_part_pagerank_mass_and_symmetry(spark, sf_dir):
    """Fixed-iteration integer PageRank: every co-purchased part gets a
    row, ranks are positive, and higher-degree hubs hold more rank mass
    than the minimum (base) floor."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        PAGERANK_SCALE,
        q_part_pagerank,
    )

    rows = q_part_pagerank(spark, sf_dir).collect()
    assert rows
    base = 15 * PAGERANK_SCALE // 100
    assert all(r["pr"] >= base for r in rows)
    # total mass stays in the damped band: <= n*S (teleport + damped sum)
    n = len(rows)
    assert sum(r["pr"] for r in rows) <= n * PAGERANK_SCALE
    # rank correlates with degree at the extremes
    top = max(rows, key=lambda r: r["pr"])
    bot = min(rows, key=lambda r: r["pr"])
    assert top["outdeg"] >= bot["outdeg"]


def test_fuzzy_match_sharded_equals_windowed(spark, sf_dir):
    """The distributed-ranking fuzzy-match path is row-identical to the
    windowed form (same total order, same neighborhood)."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        j_fuzzy_match_parts,
        j_fuzzy_match_parts_sharded,
    )

    a = sorted(map(tuple, j_fuzzy_match_parts(spark, sf_dir).collect()))
    b = sorted(map(tuple, j_fuzzy_match_parts_sharded(spark, sf_dir).collect()))
    assert a == b
    assert a  # non-vacuous at sf0.001


def test_session_transitions_planted_chain(spark, tmp_path):
    """Transitions stay inside sessions: a 31-minute silence breaks the
    chain, counts and micro-probabilities are exact integers."""
    import os
    from datetime import datetime

    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_session_transitions,
    )

    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    rows = [
        # user 1, one session: click -> view -> purchase
        (1, t(0), 1, "click", 0.0, "{}"),
        (2, t(5), 1, "view", 0.0, "{}"),
        (3, t(10), 1, "purchase", 0.0, "{}"),
        # 31-minute gap -> NEW session: view -> click (no purchase->view hop)
        (4, t(41), 1, "view", 0.0, "{}"),
        (5, t(45), 1, "click", 0.0, "{}"),
        # user 2: click -> view
        (6, t(0), 2, "click", 0.0, "{}"),
        (7, t(1), 2, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "tr")
    df.write.parquet(os.path.join(d, "events.parquet"))
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["p_micro"])
        for r in q_session_transitions(spark, d).collect()
    }
    assert got == {
        ("click", "view"): (2, 1000000),
        ("view", "purchase"): (1, 500000),
        ("view", "click"): (1, 500000),
    }


def test_kmeans_docstats_lloyd_invariants(spark, sf_dir):
    """Lloyd's algorithm guarantees: inertia is non-increasing across
    rounds — up to the TRUNCATED-mean centroid update, which trades
    exact-Lloyd monotonicity for bit-portability and can wobble the
    objective by O(coords·n) (each truncated coordinate is off by <1,
    so per-doc distance shifts by at most ~2·max_coord+1).  Cluster
    sizes at every round must partition the corpus exactly."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        KMEANS_K,
        q_kmeans_docstats,
    )

    out = q_kmeans_docstats(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    by_iter: dict[int, list] = {}
    for r in out:
        by_iter.setdefault(r["iter"], []).append(r)
    inertias = []
    for it in sorted(by_iter):
        rows = by_iter[it]
        assert sorted(r["cid"] for r in rows) == list(range(KMEANS_K))
        assert sum(r["size"] for r in rows) == n_docs
        assert len({r["inertia"] for r in rows}) == 1  # one total per round
        inertias.append(rows[0]["inertia"])
    for prev, cur in zip(inertias, inertias[1:]):
        # descent up to truncation wobble (measured 187 on 50 docs)
        assert cur <= prev + max(10, prev // 1000)
    assert inertias[-1] < inertias[0] * 0.9  # it actually moved


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """Degree-oriented wedge closure must equal the brute-force triple
    count on the real co-purchase graph (and the orientation invariant:
    every triangle counted exactly once)."""
    from itertools import combinations

    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_triangle_count,
    )

    row = q_triangle_count(spark, sf_dir).first()

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = {}
    for r in li.select("l_orderkey", "l_partkey").distinct().collect():
        orders.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    edges = set()
    for ps in orders.values():
        for a, b in combinations(sorted(ps), 2):
            edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if c > b  # a < b < c: each triangle once
    )
    nodes = len(adj)
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (
        nodes,
        len(edges),
        tris,
    )


def test_dq_expectations_counts_planted_violations(spark, tmp_path):
    """One planted violation per rule family on a tiny star: the report
    must count each exactly and pass the clean rules."""
    import os

    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_dq_expectations,
    )

    orders = spark.createDataFrame(
        [
            (1, 10, 100.0, "1995-01-01"),
            (1, 11, 100.0, "1995-01-02"),  # duplicate pk (2 rows -> 1 dup key)
            (2, None, 50.0, "1995-01-03"),  # null custkey
            (3, 12, -5.0, "1995-01-04"),  # negative price
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    li = spark.createDataFrame(
        [
            (1, 1, 1.0, 0.5, "1995-02-01"),
            (2, 1, 2.0, 1.5, "1995-02-01"),  # discount out of range
            (3, 2, 0.0, 0.1, "1995-02-01"),  # non-positive quantity
            (99, 1, 1.0, 0.1, "1995-02-01"),  # orphan orderkey
            (3, 2, 1.0, 0.1, "1994-01-01"),  # ships before order date
        ],
        "l_orderkey long, l_linenumber long, l_quantity double,"
        " l_discount double, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    d = os.path.join(tmp_path, "dq")
    orders.coalesce(1).write.parquet(f"{d}/orders.parquet")
    li.coalesce(1).write.parquet(f"{d}/lineitem.parquet")

    got = {r["rule"]: (r["n_violations"], r["passed"])
           for r in q_dq_expectations(spark, d).collect()}
    assert got["orders_pk_unique"] == (1, False)
    assert got["orders_custkey_not_null"] == (1, False)
    assert got["orders_totalprice_nonnegative"] == (1, False)
    assert got["lineitem_discount_in_unit_range"] == (1, False)
    assert got["lineitem_quantity_positive"] == (1, False)
    assert got["lineitem_orderkey_references_orders"] == (1, False)
    assert got["lineitem_shipdate_not_before_orderdate"] == (1, False)


def test_dq_expectations_empty_tables_report_zero(spark, tmp_path):
    """ADVICE r9: the DQ suite is exactly the op run against suspect or
    degenerate loads — an EMPTY orders/lineitem pair must report
    0 violations / 0 checked / passed on every rule, not crash on
    int(None) from a NULL conditional sum."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        q_dq_expectations,
    )

    d = str(tmp_path / "dq_empty")
    spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp",
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [],
        "l_orderkey long, l_linenumber long, l_quantity double,"
        " l_discount double, l_shipdate timestamp",
    ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")

    rows = q_dq_expectations(spark, d).collect()
    assert len(rows) == 7
    for r in rows:
        assert (r["n_violations"], r["n_checked"], r["passed"]) == (0, 0, True)


def test_skew_report_exact_percentile_and_salt(spark, tmp_path):
    """q_skew_report's p99 is the exact discrete percentile (rank
    (n-1)*99//100 + 1 over sorted per-key counts) and the salt is
    ceil(max/p99) — pinned on a planted skew fixture."""
    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        _skew_stats,
    )

    # 99 keys with 1 row, 1 key with 1000 rows
    rows = [(k,) for k in range(99)] + [(999,)] * 1000
    df = spark.createDataFrame(rows, "user_id long")
    got = _skew_stats(df, "user_id", "t").first()
    assert got["n_keys"] == 100 and got["max_rows"] == 1000
    # rank = (100-1)*99//100 + 1 = 99 -> the 99th smallest count = 1
    assert got["p99_rows"] == 1
    assert got["suggested_salt"] == 1000
    assert got["skew_x1e6"] == 1000 * 1_000_000


def test_cdc_poll_cycle_chop_independent(spark, sf_dir):
    """The polling consumer converges to the same target state however
    the stream is chopped: the registry entry's 3-poll result equals a
    single-poll full load resolved under the same contract."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from priority_data_pipeline_postgres_db_spark.plans.analytics import (
        k1_cdc_poll_cycle,
    )

    got = {tuple(r) for r in k1_cdc_poll_cycle(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    want = {
        tuple(r)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_id", "event_type", "value")
        .collect()
    }
    assert got == want and got
