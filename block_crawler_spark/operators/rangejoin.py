"""Range (interval) join — points matched into [lo, hi] intervals.

Spark has no native interval join: a raw ``p.t BETWEEN i.lo AND i.hi``
predicate plans as BroadcastNestedLoopJoin (or worse, CartesianProduct) —
O(|P|·|I|) comparisons, the classic 100 TB scale-killer.  The standard
fix is bucketization: quantize the point's coordinate to a bucket, explode
each interval over the buckets it overlaps, equi-join on the bucket id,
then re-check the exact range predicate.  Each (point, interval) pair
meets in EXACTLY one bucket (the point's), so no dedup pass is needed.

Cost: |P| + Σ⌈len(interval)/w⌉ shuffled rows and only same-bucket pairs
compared — linear-ish when ``bucket_width`` tracks the typical interval
length (w ≈ median interval ⇒ ≤2 buckets per interval).

The same construction underlies time-range joins (sessions × events),
genomic overlap joins, and IP-range lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    half_open: bool = True,
) -> DataFrame:
    """Inner interval join: rows pairing each point with every interval
    containing it (``lo <= t < hi``; closed on both ends when
    ``half_open=False``).  Column sets must be disjoint apart from the
    coordinates."""

    def bucket(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    p = points.withColumn("_pb", bucket(F.col(point_col)))
    hi_bucket = bucket(F.col(hi_col) - (F.lit(1) if half_open else F.lit(0)))
    i = intervals.withColumn("_ib", F.explode(F.sequence(bucket(F.col(lo_col)), hi_bucket)))
    upper = F.col(point_col) < F.col(hi_col) if half_open else F.col(point_col) <= F.col(hi_col)
    return (
        p.join(i, p["_pb"] == i["_ib"])
        .filter((F.col(point_col) >= F.col(lo_col)) & upper)
        .drop("_pb", "_ib")
    )
