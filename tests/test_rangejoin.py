"""range_join property tests: the bucketized interval join must equal the
naive BETWEEN join on arbitrary data, for any bucket width, with no
duplicate pairs — and must not plan a nested-loop join."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from block_crawler_spark.operators.rangejoin import range_join


@pytest.mark.parametrize("bucket_width", [1, 3, 7, 50])
def test_equals_naive_between(spark, bucket_width):
    rng = random.Random(42)
    pts = [(i, rng.randrange(0, 100)) for i in range(200)]
    ivs = [(j, lo := rng.randrange(0, 90), lo + rng.randrange(0, 25)) for j in range(40)]
    p = spark.createDataFrame(pts, "pid int, t int")
    i = spark.createDataFrame(ivs, "iid int, lo int, hi int")

    got = {
        (r["pid"], r["iid"])
        for r in range_join(p, i, "t", "lo", "hi", bucket_width=bucket_width).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in p.join(i, (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi"))).collect()
    }
    assert got == naive

    # exactly-one-bucket-match: no duplicate (point, interval) rows
    rows = range_join(p, i, "t", "lo", "hi", bucket_width=bucket_width).collect()
    assert len(rows) == len({(r["pid"], r["iid"]) for r in rows})


def test_closed_upper_bound(spark):
    p = spark.createDataFrame([(1, 10)], "pid int, t int")
    i = spark.createDataFrame([(1, 0, 10)], "iid int, lo int, hi int")
    assert range_join(p, i, "t", "lo", "hi", 5, half_open=True).count() == 0
    assert range_join(p, i, "t", "lo", "hi", 5, half_open=False).count() == 1


def test_plan_is_equi_join(spark):
    p = spark.createDataFrame([(1, 10)], "pid int, t int")
    i = spark.createDataFrame([(1, 0, 10)], "iid int, lo int, hi int")
    plan = range_join(p, i, "t", "lo", "hi", 5)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan[:1500]
