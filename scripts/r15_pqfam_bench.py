"""Bench-context timing of a registry query list (default: PQ family).

Set PQFAM_QUERIES=a,b,c to probe any subset.

Replicates bench.py's methodology (one session, load_all warm-up, noop
sink, best-of-3 per query) for ONLY the PQ family, so the r14 vs r15
`operators/pq.py` shapes can be A/B'd under identical conditions by
pointing PYTHONPATH at different checkouts:

    PYTHONPATH=/root/repo      python scripts/r15_pqfam_bench.py   # r15
    PYTHONPATH=/tmp/r14base    python scripts/r15_pqfam_bench.py   # r14

Prints one JSON line {tag, queries:{name: best}, sum, load1}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# NOTE: no sys.path.insert here — PYTHONPATH decides which checkout runs.

FAM = os.environ.get(
    "PQFAM_QUERIES",
    "emb_pq_topk,emb_pq_trained_topk,emb_pq_balanced_topk,emb_ivfpq_topk,"
    "emb_ivfpq_residual_topk,emb_ivfpq_residual_trained,emb_pq_rerank_topk,"
    "emb_ivfpq_rerank_topk",
).split(",")


def main() -> None:
    from block_crawler_spark.plans.registry import all_queries
    from block_crawler_spark.session import get_spark
    from block_crawler_spark.sources.tables import load_all

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PQFAM_TAG", "untagged")
    spark = get_spark("pqfam-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for df in load_all(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    timings = {}
    for name in FAM:
        fn = registry[name][0]
        best = None
        spark.sparkContext.setJobDescription(f"pqfam {name}")
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "tag": tag,
                "queries": timings,
                "sum": round(sum(timings.values()), 3),
                "load1": round(os.getloadavg()[0], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
