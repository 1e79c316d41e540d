"""AQE skew-join demonstration: the heavy-hitter token equi-join regime.

docs/SCALING.md's `doc_unigram_surprisal` note claims that once the
vocabulary outgrows the broadcast threshold, the occurrence ⋈ vocabulary
join degrades to sort-merge with the "the" partition hot, and that AQE's
skew-join split handles it.  That was an assertion; this probe makes it a
measurement: a synthetic occurrence table where ONE token carries half of
all rows is joined to its vocabulary with broadcasting disabled (forcing
the SMJ the claim is about), and the EXECUTED adaptive plan is inspected
for the `skew=true` marker plus the partition statistics AQE reports.

Output: one JSON line — whether the executed plan carries the
``SortMergeJoin(skew=true)`` / skewed-AQEShuffleRead markers, and the
best-of-2 wall with the split on vs off
(spark.sql.adaptive.skewJoin.enabled toggled).  At local[32] probe scale
the wall delta is small (32 parallel tasks hide a single hot partition
that is only ~25× the median); the marker is the load-bearing evidence —
on a 1000-executor cluster the unsplit hot partition IS the stage's
critical path.  Runtime SQL confs are restored afterwards; the probe
never touches registry queries.

Usage:  PYTHONPATH=/root/repo python scripts/skew_join_probe.py [--rows 2000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from block_crawler_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    args = ap.parse_args()

    spark = get_spark("skew-join-probe")
    spark.sparkContext.setLogLevel("ERROR")
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    out: dict = {"rows": args.rows}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # the synthetic frame is small next to production shuffle blocks, so
        # scale the skew detector down with it (factor 2 over the median,
        # 1 MB absolute) — production defaults (factor 5, 256 MB) fire the
        # same way on real heavy-hitter blocks
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")

        # half of all occurrences are the token "the" (incompressible md5
        # payload so shuffle-block BYTES reflect the row skew — a constant
        # hot string alone compresses under the detector threshold); the
        # rest spread over a 100k-token vocabulary.  The vocabulary side is
        # an INDEPENDENT frame: deriving it from occ would share (reuse)
        # occ's exchange, and OptimizeSkewedJoin declines to split a reused
        # exchange — two non-obvious preconditions this probe documents.
        occ = spark.range(args.rows).select(
            F.when(F.col("id") % 2 == 0, F.lit("the"))
            .otherwise(F.concat(F.lit("tok"), (F.col("id") % 100_000).cast("string")))
            .alias("token"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        vocab = spark.range(100_000).select(
            F.concat(F.lit("tok"), F.col("id").cast("string")).alias("token"),
            F.col("id").alias("n"),
        ).union(spark.range(1).select(F.lit("the").alias("token"), F.lit(0).cast("long").alias("n")))

        def run(skew_enabled: bool):
            conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
            best, plan = None, None
            for _ in range(2):
                # inspect the SAME DataFrame the action ran (count()/write()
                # wrap a fresh QueryExecution whose AQE never runs — the
                # first probe version read a never-executed plan)
                j = occ.join(vocab, "token")
                t0 = time.monotonic()
                j.collect()
                dt = time.monotonic() - t0
                best = dt if best is None or dt < best else best
                plan = j._jdf.queryExecution().executedPlan().toString()
            return best, plan

        wall_off, _plan_off = run(False)
        wall_on, plan_on = run(True)
        out["skew_marker_in_final_plan"] = "skew=true" in plan_on
        out["skewed_shuffle_read"] = "skewed" in plan_on  # AQEShuffleRead marker
        out["sortmergejoin_used"] = "SortMergeJoin" in plan_on
        out["wall_s_skew_on"] = round(wall_on, 2)
        out["wall_s_skew_off"] = round(wall_off, 2)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
