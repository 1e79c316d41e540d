"""Salted join/aggregate == unsalted results, on a pathologically skewed key."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from block_crawler_spark.operators.skew import salted_aggregate, salted_join


def _skewed(spark):
    # 10k rows, 95% on one hot key
    return spark.range(10_000).select(
        F.when(F.col("id") % 20 != 0, F.lit("HOT")).otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", 1), ("k1", 2), ("k3", 3), ("missing", 9)], ["k", "dim"]
    )
    plain = big.join(small, "k", "inner").groupBy("k", "dim").count()
    salted = salted_join(big, small, ["k"], salt_factor=5).groupBy("k", "dim").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    plain_l = big.join(small, "k", "left").groupBy("k").count()
    salted_l = salted_join(big, small, ["k"], salt_factor=5, how="left").groupBy("k").count()
    assert sorted(map(tuple, plain_l.collect())) == sorted(map(tuple, salted_l.collect()))


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark).withColumn("d", F.col("v").cast("decimal(18,2)"))
    plain = {
        r["k"]: (r["s"], r["mx"])
        for r in df.groupBy("k").agg(F.sum("d").alias("s"), F.max("v").alias("mx")).collect()
    }
    salted = {
        r["k"]: (r["sum_d"], r["max_v"])
        for r in salted_aggregate(df, ["k"], {"d": "sum", "v": "max"}, salt_factor=5).collect()
    }
    assert plain == salted

    counts_plain = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("v").alias("n")).collect()}
    counts_salted = {
        r["k"]: r["count_v"]
        for r in salted_aggregate(df, ["k"], {"v": "count"}, salt_factor=5).collect()
    }
    assert counts_plain == counts_salted
