"""r15 scaling rows (VERDICT r14 task 7): the ten most expensive registry
queries, timed with bench.py's methodology (one session, load_all warm-up,
noop sink, best-of-3) at whatever $SPARK_GRAFT_CPUS / $SPARK_GRAFT_SF_DIR
the caller sets.  The driver loop in docs/SCALING.md runs this at
{c8, c32} × {sf0.01, sf0.1} — sf1 does not exist under /root/testdata, so
the 10× input step stands in for the core-count-vs-input-size separation.

    SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python scripts/r15_scaling_probe.py

Prints one JSON line {cpus, sf, queries:{name: best}, sum, load1}.
"""

from __future__ import annotations

import json
import os
import time

TOP10 = [
    "emb_ivfpq_residual_topk",
    "emb_ivfpq_topk",
    "emb_pq_rerank_topk",
    "emb_ivfpq_rerank_topk",
    "dedup_family_overlap",
    "pipeline_contamination",
    "doc_curation_pipeline",
    "media_modality_overlap",
    "nft_token_state_from_lineitem",
    "dedup_stream_semantic_admission_sim",
]


def main() -> None:
    from block_crawler_spark.plans.registry import all_queries
    from block_crawler_spark.session import get_spark
    from block_crawler_spark.sources.tables import load_all

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("r15-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for df in load_all(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    timings = {}
    for name in TOP10:
        fn = registry[name][0]
        spark.sparkContext.setJobDescription(f"r15-scaling {name}")
        best = None
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "cpus": int(cpus),
                "sf": sf_dir.rsplit("/", 1)[-1],
                "queries": timings,
                "sum": round(sum(timings.values()), 3),
                "load1": round(os.getloadavg()[0], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
