"""Bucketed co-located joins: same-bucket tables join without a shuffle
(plans/catalog.BucketedWarehouse)."""

from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.plans.catalog import BucketedWarehouse


def test_bucketed_join_no_exchange(spark, orders, lineitem, tmp_path):
    # unique db name: a FIXED name leaves a stale warehouse directory if
    # a run is killed mid-test, and the next session's saveAsTable then
    # fails on the existing managed-table location
    import uuid

    wh = BucketedWarehouse(spark, f"bk{uuid.uuid4().hex[:10]}")
    wh.create_db()
    try:
        wh.write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=4)
        wh.write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
            ["o_orderkey"], n_buckets=4,
        )
        a = wh.read_table("b_orders")
        b = wh.read_table("b_lineitem")
        joined = a.hint("merge").join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: SMJ directly over the bucketed scans, no shuffle
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and the result is right
        assert joined.count() == lineitem.count()
    finally:
        wh.drop_db()
