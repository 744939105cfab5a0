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
