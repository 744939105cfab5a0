"""Salted-join/count equivalence: salting must change the shuffle layout,
never the result (operators/skew)."""

from pyspark.sql import functions as F

from priority_data_pipeline_postgres_db_spark.operators.skew import salted_count, salted_join


def skewed_fact(spark):
    # 90% of rows on one hot key
    hot = spark.range(900).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    rest = spark.range(100).select((F.col("id") % 7 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(rest)


def test_salted_join_equals_plain_join(spark):
    fact = skewed_fact(spark)
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 9)], "k bigint, name string"
    )
    plain = fact.join(dim, ["k"]).groupBy("k", "name").count()
    salted = salted_join(fact, dim, ["k"], salts=8).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    fact = skewed_fact(spark)
    dim = spark.createDataFrame([(1, "one")], "k bigint, name string")
    out = salted_join(fact, dim, ["k"], salts=4, how="left")
    assert out.count() == fact.count()
    assert out.filter(F.col("name").isNull()).count() == 100  # non-hot keys unmatched


def test_salted_count_matches_groupby(spark):
    fact = skewed_fact(spark)
    plain = {r["k"]: r["n"] for r in fact.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count(fact, ["k"], salts=8).collect()}
    assert plain == salted
    assert salted[1] == 900


def test_plan_skew_mitigation_policy():
    """Pure policy: ceil(max/p99), mitigate iff >= 2, capped, and safe
    on degenerate inputs."""
    from priority_data_pipeline_postgres_db_spark.operators.skew import (
        MAX_SALTS,
        plan_skew_mitigation,
    )

    assert plan_skew_mitigation(900, 15) == (60, True)
    assert plan_skew_mitigation(100, 99) == (2, True)  # ceil rounds up
    assert plan_skew_mitigation(100, 100) == (1, False)  # uniform
    assert plan_skew_mitigation(10**9, 1) == (MAX_SALTS, True)  # capped
    assert plan_skew_mitigation(0, 0) == (1, False)  # empty probe


def test_skew_probe_measures_hot_key(spark):
    """The probe reads the planted 90%-hot-key fixture exactly: max is
    the hot key's 900, p99 the typical key load, salts their ceil
    ratio."""
    from priority_data_pipeline_postgres_db_spark.operators.skew import skew_probe

    plan = skew_probe(skewed_fact(spark), ["k"])
    assert plan.key_cols == ("k",)
    assert (plan.n_keys, plan.n_rows, plan.max_rows) == (8, 1000, 900)
    assert plan.p99_rows == 15  # 100 rows over 7 keys: loads 14×5 + 15×2
    assert plan.salts == 60 and plan.mitigate

    empty = skew_probe(
        skewed_fact(spark).filter(F.col("k") < 0), ["k"]
    )
    assert not empty.mitigate and empty.salts == 1


def test_salted_join_auto_sizes_from_probe(spark):
    """salts=None (the default) probes the fact side and salts the join;
    the result equals the plain join and the physical plan shuffles on
    the (key, salt) composite — the measurement→plan loop closed
    (VERDICT r10 #1)."""
    from priority_data_pipeline_postgres_db_spark.operators.skew import skew_probe

    fact = skewed_fact(spark)
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 9)], "k bigint, name string"
    )
    plain = fact.join(dim, ["k"]).groupBy("k", "name").count()
    auto = salted_join(fact, dim, ["k"]).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, auto.collect()))

    # plan pin: the join's shuffle key includes the salt, and the build
    # side is NOT broadcast (salting exists because broadcast is
    # ineligible — a broadcast of the exploded build would pay the
    # replication without spreading the hot key)
    joined = salted_join(fact, dim, ["k"], salts=skew_probe(fact, ["k"]))
    phys = joined._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in phys
    assert "BroadcastHashJoin" not in phys


def test_salted_join_uniform_probe_degrades_to_plain(spark):
    """A uniform fact side (max == p99) must produce the PLAIN join plan:
    no salt column, no build replication, Catalyst free to broadcast."""
    fact = spark.range(1000).select((F.col("id") % 8 + 1).alias("k"))
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 9)], "k bigint, name string"
    )
    out = salted_join(fact, dim, ["k"])
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" not in phys
    assert out.count() == 1000


def test_salted_count_auto_sizes(spark):
    fact = skewed_fact(spark)
    plain = {
        r["k"]: r["n"]
        for r in fact.groupBy("k").agg(F.count("*").cast("long").alias("n")).collect()
    }
    auto = {r["k"]: r["n"] for r in salted_count(fact, ["k"]).collect()}
    assert plain == auto


def test_skew_probe_on_fixture_star_key(spark, sf_dir):
    """The gate fixture's star key (lineitem.l_suppkey) measures
    near-uniform — ceil(max/p99) = 2 (pinned so the j_skew_salted_star
    gate entry demonstrably executes the SALTED path, not the plain
    degrade)."""
    from priority_data_pipeline_postgres_db_spark.operators.skew import skew_probe

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = skew_probe(li.select("l_suppkey"), ["l_suppkey"])
    assert plan.mitigate and plan.salts == 2


def test_global_row_number_matches_window(spark):
    """Distributed global rank == single-partition window row_number on a
    total order, across several partition counts."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from priority_data_pipeline_postgres_db_spark.operators.ranking import (
        global_row_number,
    )

    df = spark.range(0, 997).select(
        (F.col("id") * 37 % 997).alias("k"), F.col("id").alias("uid")
    )
    expect = {
        r["uid"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("k"), F.asc("uid")))
        ).collect()
    }
    for parts in (1, 3, 16):
        got = {
            r["uid"]: r["rn"]
            for r in global_row_number(
                df, [F.desc("k"), F.asc("uid")], partitions=parts
            ).collect()
        }
        assert got == expect


def test_global_ntile_matches_sql_ntile(spark):
    """ntile_from_rank replicates NTILE's fill rule for n % k != 0 and for
    n < k."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from priority_data_pipeline_postgres_db_spark.operators.ranking import (
        global_ntile,
    )

    for n, k in ((103, 5), (10, 4), (3, 5)):
        df = spark.range(0, n).select(F.col("id").alias("uid"))
        expect = {
            r["uid"]: r["b"]
            for r in df.withColumn(
                "b", F.ntile(k).over(Window.orderBy(F.asc("uid")))
            ).collect()
        }
        got = {
            r["uid"]: r["b"]
            for r in global_ntile(df, [F.asc("uid")], k, "b", partitions=4).collect()
        }
        assert got == expect, (n, k)


# -- persisted skew plans: probe-once across the star family (r11 #6) ----


def test_skew_plan_persist_roundtrip(spark, tmp_path):
    from priority_data_pipeline_postgres_db_spark.operators.skew import (
        load_skew_plan,
        persist_skew_plan,
        skew_probe,
    )
    from priority_data_pipeline_postgres_db_spark.sources.control import ControlStore

    store = ControlStore(str(tmp_path / "control.json"))
    plan = skew_probe(skewed_fact(spark), ["k"])
    persist_skew_plan(store, "fact", plan)
    # a fresh store handle (a new run) reads the identical plan
    got = load_skew_plan(ControlStore(store.path), "fact", ["k"])
    assert got == plan
    assert load_skew_plan(store, "fact", ["k", "other"]) is None
    assert load_skew_plan(store, "other_table", ["k"]) is None


def test_skew_plan_for_probes_once(spark, tmp_path, monkeypatch):
    """The probe-once pin: call one probes + persists; call two (fresh
    store handle, same table) reads the artifact and never probes —
    the second join in a star family pays a footer count, not the
    probe shuffle."""
    import priority_data_pipeline_postgres_db_spark.operators.skew as skew
    from priority_data_pipeline_postgres_db_spark.sources.control import ControlStore

    calls = []
    orig = skew.skew_probe

    def counting_probe(df, key_cols):
        calls.append(tuple(key_cols))
        return orig(df, key_cols)

    monkeypatch.setattr(skew, "skew_probe", counting_probe)
    fact = skewed_fact(spark)
    store = ControlStore(str(tmp_path / "control.json"))
    p1 = skew.skew_plan_for(fact, ["k"], store=store, table="fact")
    assert calls == [("k",)] and p1.mitigate and p1.salts >= 2
    p2 = skew.skew_plan_for(
        fact, ["k"], store=ControlStore(store.path), table="fact"
    )
    assert calls == [("k",)]  # no second probe
    assert p2 == p1
    # the reused plan drives the same salted result as a fresh probe
    build = spark.range(9).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    expect = sorted(tuple(r) for r in fact.join(build, ["k"]).collect())
    got = sorted(
        tuple(r) for r in skew.salted_join(fact, build, ["k"], salts=p2).collect()
    )
    assert got == expect


def test_skew_plan_staleness_fence_reprobes(spark, tmp_path, monkeypatch):
    """A stored plan whose probed row count drifted past the ratio fence
    is stale: the table's skew shape moved with its volume, so the plan
    re-probes and re-persists."""
    import priority_data_pipeline_postgres_db_spark.operators.skew as skew
    from priority_data_pipeline_postgres_db_spark.sources.control import ControlStore

    calls = []
    orig = skew.skew_probe

    def counting_probe(df, key_cols):
        calls.append(1)
        return orig(df, key_cols)

    monkeypatch.setattr(skew, "skew_probe", counting_probe)
    store = ControlStore(str(tmp_path / "control.json"))
    fact = skewed_fact(spark)
    skew.skew_plan_for(fact, ["k"], store=store, table="fact")
    assert calls == [1]
    # within the fence: 1000 stored vs 1000 now — reuse
    skew.skew_plan_for(fact, ["k"], store=store, table="fact", current_rows=1000)
    assert calls == [1]
    # past the fence (default ratio 2.0): the table tripled — re-probe
    skew.skew_plan_for(fact, ["k"], store=store, table="fact", current_rows=3000)
    assert calls == [1, 1]
    # the re-probe re-persisted: next read is fresh again (no probe)
    skew.skew_plan_for(fact, ["k"], store=store, table="fact", current_rows=1000)
    assert calls == [1, 1]
