"""TPC-H reporting/subquery battery 2 — the remaining classic plan shapes
not yet covered by plans.queries (q1/q3/q5/q9) or plans.analytics
(q4/q11/q13/q17): cross-nation volume (q7), market share (q8), returned
items top-k (q10), late-shipment mix (q12), promo share (q14), top
supplier by scalar-max (q15), large orders via HAVING-IN (q18),
disjunctive OR-of-ANDs pushdown (q19), sole-late-supplier semi/anti
combo (q21), and idle-customer scalar-avg + anti-join (q22).

Queries are adapted to the synthetic schema (no partsupp/commitdate/
receiptdate/phone columns): "late" means shipped >N days after the order
date, and q22's country code becomes the trailing digit of c_name.  Every
query keeps the exact-decimal money discipline from plans.queries so the
DuckDB oracle hash-matches bit-for-bit.

Scale notes per query live in the docstrings; the common rules: dims
(nation/region/supplier/part at dim-scale) broadcast, fact-fact joins
shuffle once on their equi key, aggregates are partial-before-shuffle,
and every date filter is a pushable parquet predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import as_double, dec, money
from .tables import load

QUERIES: dict = {}
ORACLE: dict = {}

_REVENUE = lambda: (money("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - money("l_discount")))  # noqa: E731

# The oracle twin of _REVENUE (plans.queries uses the same formulation).
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: cross-border shipping volume by direction and
    year (adapted to two nation blocs — WEST = nationkey < 12, EAST =
    the rest — because a single nation pair is empty at the smallest
    test scale: sf0.001 has suppliers in only 10 of 25 nations).

    Plan: lineitem⋈orders is the one real shuffle (both fact-sized at
    scale → sort-merge on l_orderkey); customer→bloc and supplier→bloc
    are broadcast maps, and the cross-bloc test is a residual filter on
    two tiny broadcast-joined columns."""
    bloc = F.when(F.col("n_nationkey") < 12, "WEST").otherwise("EAST")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", bloc.alias("bloc"))
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("bloc").alias("cust_bloc"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("bloc").alias("supp_bloc"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_bloc") != F.col("cust_bloc"))
    )
    return joined.groupBy(
        "supp_bloc", "cust_bloc", F.year("l_shipdate").alias("l_year")
    ).agg(as_double(F.sum(_REVENUE())).alias("revenue"))


ORACLE["q7_nation_volume"] = f"""
    SELECT supp_bloc, cust_bloc, l_year,
           CAST(CAST(ROUND(SUM(volume), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM (
      SELECT CASE WHEN n1.n_nationkey < 12 THEN 'WEST' ELSE 'EAST' END AS supp_bloc,
             CASE WHEN n2.n_nationkey < 12 THEN 'WEST' ELSE 'EAST' END AS cust_bloc,
             year(l_shipdate) AS l_year, {_REV_SQL} AS volume
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND (CASE WHEN n1.n_nationkey < 12 THEN 'WEST' ELSE 'EAST' END)
         <> (CASE WHEN n2.n_nationkey < 12 THEN 'WEST' ELSE 'EAST' END)
    ) GROUP BY supp_bloc, cust_bloc, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: NATION_5's share of PROMO-part order volume
    delivered into ASIA, per order year — the ratio-of-conditional-sums
    pattern.

    Both the numerator and denominator come out of ONE aggregation pass
    (sum + sum(CASE)), so the plan is: broadcast part filter → fact
    shuffle join → broadcast dims → single groupBy.  The division
    happens after each exact-decimal sum is reduced to a double, which
    is the same two-step both engines perform (IEEE division of
    identical operands → bit-identical quotient)."""
    part = (
        load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust_asia = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_asia), orders.o_custkey == cust_asia.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _REVENUE().alias("volume"),
            F.col("supp_nation"),
        )
    )
    per_year = vol.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(25,8)")
        )).alias("_nation_vol"),
        F.sum("volume").alias("_total_vol"),
    )
    return per_year.select(
        "o_year",
        (as_double(F.col("_nation_vol")) / as_double(F.col("_total_vol"))).alias(
            "mkt_share"
        ),
    )


ORACLE["q8_market_share"] = f"""
    SELECT o_year,
           CAST(CAST(ROUND(nation_vol, 4) AS DECIMAL(18,4)) AS DOUBLE)
             / CAST(CAST(ROUND(total_vol, 4) AS DECIMAL(18,4)) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             SUM(CASE WHEN n1.n_name = 'NATION_5' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(25,8)) END) AS nation_vol,
             SUM({_REV_SQL}) AS total_vol
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY year(o_orderdate)
    )
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: top 20 customers by revenue lost to returns in
    one quarter.

    Plan: quarter filter pushes into the orders scan, the 'R' flag into
    the lineitem scan; the fact join shuffles once on l_orderkey; the
    customer dim joins broadcast AFTER the per-customer aggregate (agg
    first → the join input is |customers-with-returns|, not |lines|).
    Ordering ties broken by custkey so LIMIT 20 is deterministic."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_REVENUE()).alias("_rev"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    dim = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    )
    return (
        per_cust.join(F.broadcast(dim), per_cust.o_custkey == dim.c_custkey)
        .orderBy(F.col("_rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            as_double(F.col("_rev")).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


ORACLE["q10_returned_items"] = f"""
    SELECT c_custkey, c_name,
           CAST(CAST(ROUND(rev, 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM (
      SELECT c_custkey, c_name, c_acctbal, n_name, SUM({_REV_SQL}) AS rev
      FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
    ) ORDER BY rev DESC, c_custkey LIMIT 20
"""


def q12_late_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape (adapted: no shipmode/receiptdate columns —
    lateness is shipdate > orderdate + 90 days, grouping by returnflag):
    counts of critical- vs normal-priority orders among late shipments.

    The CASE-sum pair rides the single fact-fact shuffle; the year
    filter pushes into the lineitem scan."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_returnflag").agg(
        F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
    )


ORACLE["q12_late_priority_mix"] = """
    SELECT l_returnflag,
           -- DuckDB types integer SUM as HUGEINT (int128) which pandas
           -- materializes as float64; Spark returns int64 — the driver's
           -- type-sensitive value hash rejects that, so pin BIGINT here
           -- (root cause of the only two r04 hash failures).
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: percentage of one month's revenue from PROMO
    parts.  Part is a broadcast map onto the lineitem scan; numerator
    and denominator share one aggregation; final scalar division in
    doubles (identical operands in both engines)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _REVENUE()).otherwise(
                F.lit(0).cast("decimal(25,8)")
            )
        ).alias("_promo"),
        F.sum(_REVENUE()).alias("_total"),
    )
    return agg.select(
        (F.lit(100.0) * as_double(F.col("_promo")) / as_double(F.col("_total"))).alias(
            "promo_revenue_pct"
        )
    )


ORACLE["q14_promo_share"] = f"""
    SELECT 100.0 * CAST(CAST(ROUND(promo, 4) AS DECIMAL(18,4)) AS DOUBLE)
                 / CAST(CAST(ROUND(total, 4) AS DECIMAL(18,4)) AS DOUBLE) AS promo_revenue_pct
    FROM (
      SELECT SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(25,8)) END) AS promo,
             SUM({_REV_SQL}) AS total
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    )
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: supplier(s) achieving the maximum quarterly
    revenue — the scalar-max-subquery pattern.

    The per-supplier aggregate is computed ONCE and reused for both the
    max and the filter (Spark: a cached-free crossJoin of the 1-row max,
    which is what Catalyst rewrites `= (SELECT max …)` into; revenue
    equality is tested on the EXACT decimal, not the double, so ties are
    bit-stable)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_REVENUE()).alias("_rev"))
    mx = per_supp.agg(F.max("_rev").alias("_max_rev"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("_rev") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", as_double(F.col("_rev")).alias("total_revenue"))
    )


ORACLE["q15_top_supplier"] = f"""
    WITH revenue AS (
      SELECT l_suppkey, SUM({_REV_SQL}) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(ROUND(rev, 4) AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue
    FROM revenue JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev = (SELECT MAX(rev) FROM revenue)
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: orders whose total quantity exceeds 200 — the
    HAVING-subquery-IN pattern.

    Spark-first: aggregate lineitem by l_orderkey FIRST (HAVING filter
    right after the partial agg — the surviving set is tiny), then join
    orders on the same key (AQE converts to broadcast once the filtered
    agg is observed to be small) and broadcast the customer dim.
    Quantities are integral doubles → bigint sums are exact."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            dec("o_totalprice", 4, 12).cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


ORACLE["q18_large_orders"] = """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(12,4)) AS DOUBLE) AS o_totalprice,
           sum_qty
    FROM (
      -- CAST the SUM itself: DuckDB's integer SUM is HUGEINT → float64
      -- in pandas, which the driver's type-sensitive hash rejects
      -- against Spark's int64 (r04 hash failure root cause).
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
    )
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: revenue under an OR of conjunctive
    brand/size/quantity envelopes (adapted: no container column).

    The part side is pre-filtered to the UNION of the three brand×size
    envelopes before broadcasting, so the broadcast table only carries
    candidate parts; the residual per-branch quantity predicate applies
    post-join.  Catalyst keeps the whole disjunction inside one
    codegen'd filter — no union-of-three-scans blowup."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    b1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
    b2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
    b3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
    cand = part.filter(b1 | b2 | b3)
    j = li.join(F.broadcast(cand), li.l_partkey == cand.p_partkey)
    hit = j.filter(
        (b1 & F.col("l_quantity").between(1, 15))
        | (b2 & F.col("l_quantity").between(10, 25))
        | (b3 & F.col("l_quantity").between(20, 35))
    )
    return hit.agg(
        F.count("*").alias("n_lines"),
        as_double(F.sum(_REVENUE())).alias("revenue"),
    )


ORACLE["q19_disjunctive_revenue"] = f"""
    SELECT count(*) AS n_lines,
           CAST(CAST(ROUND(SUM({_REV_SQL}), 4) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 35)
"""


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape (adapted: late = shipped >60 days after the order
    date): suppliers who were the ONLY late shipper in a multi-supplier
    order — the EXISTS + NOT-EXISTS double-correlation pattern.

    Spark-first plan: instead of the oracle's two correlated self-joins
    (which decorrelate into two extra shuffles of lineitem), compute
    per-order supplier counts in ONE aggregation — n_supp = distinct
    suppliers, n_late = distinct late suppliers — then rejoin to the
    late lines on the same key (co-partitioned, no extra exchange) and
    keep orders with n_supp > 1 AND n_late = 1.  Set-semantics identical
    to EXISTS(other supplier) ∧ ¬EXISTS(other late supplier)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_n_late"),
    )
    sole = (
        lines.filter(F.col("_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(supp), sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


ORACLE["q21_sole_late_supplier"] = """
    SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
    FROM lineitem l1
      JOIN orders   ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 10
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape (adapted: the 'country code' is the trailing
    digit of c_name, and 'idle' means no order since 2000-01-01 — the
    all-time anti-join is empty at this order density): per even-digit
    segment, the count and balance of above-average-balance customers
    with no recent orders.

    The scalar avg is a 1-row broadcast; the comparison is multiplied
    out (bal·n > total) so it stays in exact decimals; 'no recent
    orders' is a left-anti join against the date-filtered orders (the
    date filter pushes into the orders scan BEFORE the shuffle, so the
    anti-join side shrinks to the recent slice, not all history)."""
    cust = load(spark, sf_dir, "customer").withColumn(
        "segment", F.expr("right(c_name, 1)")
    )
    seg = cust.filter(F.col("segment").isin("0", "2", "4", "6", "8"))
    pos = seg.filter(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("_n_pos"),
        F.sum(dec("c_acctbal", 4, 18)).alias("_sum_pos"),
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    idle = (
        seg.crossJoin(F.broadcast(pos))
        .filter(dec("c_acctbal", 4, 18) * F.col("_n_pos") > F.col("_sum_pos"))
        .join(orders, seg.c_custkey == orders.o_custkey, "left_anti")
    )
    return idle.groupBy("segment").agg(
        F.count("*").alias("numcust"),
        as_double(F.sum(dec("c_acctbal", 4, 18))).alias("totacctbal"),
    )


ORACLE["q22_idle_customers"] = """
    WITH seg AS (
      SELECT c_custkey, c_acctbal, right(c_name, 1) AS segment
      FROM customer
      WHERE right(c_name, 1) IN ('0','2','4','6','8')
    ), pos AS (
      SELECT count(*) AS n_pos,
             SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS sum_pos
      FROM seg WHERE c_acctbal > 0
    )
    SELECT segment, count(*) AS numcust,
           CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4)
             AS DECIMAL(18,4)) AS DOUBLE) AS totacctbal
    FROM seg, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n_pos > sum_pos
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY segment
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering it at the minimum cost — the correlated-scalar-subquery
    (`= (SELECT MIN …)`) pattern.

    Adapted to the synthetic schema (no partsupp table): the supply cost
    of a (part, supplier) pair is the minimum l_extendedprice at which
    that supplier ever shipped that part.  The correlated subquery is
    expressed as a window MIN over the per-part partition — one extra
    sort within the already-shuffled partition instead of a second
    aggregate + self-join, which is exactly how a modern optimizer
    decorrelates this query.

    Scale shape: lineitem is pre-filtered by two broadcast semi-joins
    (qualifying parts, EUROPE suppliers) BEFORE its one shuffle on
    (l_partkey, l_suppkey); the window rides the same hash partitioning
    (partitionBy is a prefix of the agg keys → no second exchange).
    Cost is the exact decimal(12,4); equality against the window MIN is
    decimal equality, so ties are bit-stable."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") >= 40)
    ).select("p_partkey", "p_type", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cost = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp.select("s_suppkey")), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(money("l_extendedprice")).alias("_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("_min_cost", F.min("_cost").over(w)).filter(
        F.col("_cost") == F.col("_min_cost")
    )
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "l_partkey", "l_suppkey"
        )
        .limit(100)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_type",
            "p_size",
            as_double(F.col("_cost")).alias("supply_cost"),
        )
    )


ORACLE["q2_min_cost_supplier"] = """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(12,4))) AS c
      FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
      WHERE p_type = 'STANDARD' AND p_size >= 40 AND r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_type, p_size,
           CAST(CAST(c AS DECIMAL(18,4)) AS DOUBLE) AS supply_cost
    FROM cost
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN part     ON p_partkey = l_partkey
    WHERE c = (SELECT MIN(c) FROM cost c2 WHERE c2.l_partkey = cost.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, l_partkey, l_suppkey LIMIT 100
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6: the pure scan-filter-aggregate — revenue delta from
    discounted small-quantity lines in one year.

    Every predicate (shipdate range, discount band, quantity cap) is a
    pushable parquet filter on the SAME scan; `.explain` shows all three
    in PushedFilters and a two-column ReadSchema
    (l_extendedprice, l_discount survive pruning plus the filter cols).
    The aggregate is a single partial→final sum of the exact
    decimal(12,4)×decimal(8,4) product — the canonical 'the engine should
    be I/O-bound here' query."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.count("*").alias("n_lines"),
        as_double(F.sum(money("l_extendedprice") * dec("l_discount", 4, 8))).alias(
            "revenue"
        ),
    )


ORACLE["q6_forecast_revenue"] = """
    SELECT count(*) AS n_lines,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                               * CAST(l_discount AS DECIMAL(8,4))), 4)
                     AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < 24
"""


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: how many distinct suppliers can provide each
    (brand, type, size) bucket, excluding a blocklisted supplier set —
    the NOT-IN-subquery + COUNT(DISTINCT) pattern.

    Adapted: the part↔supplier relation is the distinct (l_partkey,
    l_suppkey) projection of lineitem (no partsupp table), and the
    'complaints' blocklist is suppliers with s_acctbal < 1000.

    Scale shape: the distinct pair-set is ONE shuffle on the composite
    key (map-side combine collapses the ~4× lineitem fan-in first); the
    blocklist NOT IN is a broadcast anti-join (never a shuffle); part is
    a broadcast map; the final COUNT(DISTINCT suppkey) per bucket
    re-shuffles only the deduplicated pair-set, which is dim-scale."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).select(
        "s_suppkey"
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_size").isin(5, 15, 25, 35, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    pairs = li.join(
        F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
    ).join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


ORACLE["q16_supplier_part_count"] = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (5, 15, 25, 35, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p_brand, p_type, p_size
"""


def q20_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: WEST-bloc suppliers who shipped more than half of
    some 'large…' part's total 1997 volume — the nested-aggregate-
    subquery (`> 0.5 * (SELECT SUM …)`) pattern.

    Adapted: availqty becomes the supplier's own shipped quantity, and
    the forest% part filter becomes p_name LIKE 'large%'.

    Scale shape: one shuffle aggregates (part, supplier) quantity; the
    correlated total-per-part subquery is the window SUM over the same
    partitioning (no second exchange, no self-join); the half-share test
    is 2·pair > total in exact decimals (no 0.5 rounding hazard).  The
    supplier dim joins broadcast AFTER the dominance filter, when the
    row set is near-empty."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("large")).select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    pair = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity", 4, 18)).alias("_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        pair.withColumn("_total", F.sum("_qty").over(w))
        .filter(F.lit(2).cast("decimal(2,0)") * F.col("_qty") > F.col("_total"))
        .select("l_suppkey")
        .distinct()
    )
    nation = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 12).select(
        "n_nationkey", "n_name"
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        dominant.join(F.broadcast(supp), dominant.l_suppkey == supp.s_suppkey)
        .orderBy("s_name", "s_suppkey")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


ORACLE["q20_dominant_shippers"] = """
    WITH pair AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'large%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_nationkey < 12
      AND s_suppkey IN (
        SELECT l_suppkey FROM pair p1
        WHERE CAST(2 AS DECIMAL(2,0)) * qty >
              (SELECT SUM(qty) FROM pair p2 WHERE p2.l_partkey = p1.l_partkey)
      )
    ORDER BY s_name, s_suppkey
"""


QUERIES["q2_min_cost_supplier"] = q2_min_cost_supplier
QUERIES["q6_forecast_revenue"] = q6_forecast_revenue
QUERIES["q16_supplier_part_count"] = q16_supplier_part_count
QUERIES["q20_dominant_shippers"] = q20_dominant_shippers
QUERIES["q7_nation_volume"] = q7_nation_volume
QUERIES["q8_market_share"] = q8_market_share
QUERIES["q10_returned_items"] = q10_returned_items
QUERIES["q12_late_priority_mix"] = q12_late_priority_mix
QUERIES["q14_promo_share"] = q14_promo_share
QUERIES["q15_top_supplier"] = q15_top_supplier
QUERIES["q18_large_orders"] = q18_large_orders
QUERIES["q19_disjunctive_revenue"] = q19_disjunctive_revenue
QUERIES["q21_sole_late_supplier"] = q21_sole_late_supplier
QUERIES["q22_idle_customers"] = q22_idle_customers
