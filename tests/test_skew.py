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
