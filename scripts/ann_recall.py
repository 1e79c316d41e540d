"""Measure, don't guess: recall@k of the approximate ANN paths vs brute force.

Runs the k-NN join strategies (brute-force oracle, sign-LSH at several plane
counts, IVF at several nprobe values) over the embeddings table and reports
recall + scored-pair counts — the quality/cost tradeoff the scale paths buy.
``cost`` is scored pairs as a fraction of brute force.  Usage:

    PYTHONPATH=/root/repo python scripts/ann_recall.py [--sf DIR] [--k 5] [--queries 50]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from block_crawler_spark.operators.ann import ivf_topk, knn_join_brute, lsh_topk  # noqa: E402
from block_crawler_spark.session import get_spark  # noqa: E402
from block_crawler_spark.sources.tables import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--planes", type=int, default=8)
    ap.add_argument("--centroids", type=int, default=64)
    args = ap.parse_args()

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, args.sf, "embeddings").cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < args.queries)

    truth = {
        (r["q_id"], r["c_id"]) for r in knn_join_brute(queries, emb, k=args.k).collect()
    }

    def recall(approx_df):
        got = {(r["q_id"], r["c_id"]) for r in approx_df.collect()}
        return round(len(got & truth) / len(truth), 4), len(got)

    brute_pairs = args.queries * (n - 1)
    out = {
        "corpus": n,
        "k": args.k,
        "queries": args.queries,
        "brute_scored_pairs": brute_pairs,
        "lsh": {},
        "ivf": {},
    }
    for planes in (args.planes, args.planes // 2):
        r, cnt = recall(lsh_topk(queries, emb, k=args.k, num_planes=planes))
        # scored pairs ≈ queries × corpus / 2^planes (uniform buckets)
        out["lsh"][f"planes={planes}"] = {"recall": r, "results": cnt, "cost": round(1 / (1 << planes), 4)}
    cent = emb.filter(F.col("vec_id") < args.centroids)
    for nprobe in (1, 2, 4, 8, 16):
        r, cnt = recall(ivf_topk(queries, emb, cent, k=args.k, nprobe=nprobe))
        out["ivf"][f"nprobe={nprobe}"] = {
            "recall": r,
            "results": cnt,
            "cost": round(nprobe / args.centroids, 4),
        }
    # trained centroids (fixed-point Lloyd) vs the naive first-k seed set,
    # at matched cell counts — the recall k-means actually buys
    from block_crawler_spark.operators.ann import kmeans_lloyd_fixed

    out["ivf_trained"] = {}
    for cells in (16, args.centroids):
        _, cents = kmeans_lloyd_fixed(emb, k=cells, iters=2)
        trained = cents.select(F.col("cid").alias("vec_id"), F.col("c").alias("embedding"))
        seeded = emb.filter(F.col("vec_id") < cells)
        for nprobe in (2, 4, 8):
            rt, _ = recall(ivf_topk(queries, emb, trained, k=args.k, nprobe=nprobe))
            rs, _ = recall(ivf_topk(queries, emb, seeded, k=args.k, nprobe=nprobe))
            out["ivf_trained"][f"cells={cells},nprobe={nprobe}"] = {
                "recall_trained": rt,
                "recall_seeded": rs,
                "cost": round(nprobe / cells, 4),
            }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
