"""lsh_topk: bucket-join ANN respects its own bucketing and ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from block_crawler_spark.operators.ann import lsh_sign_buckets, lsh_topk
from block_crawler_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_lsh_topk_properties(spark):
    emb = load_table(spark, SF, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 6)
    got = lsh_topk(queries, emb, k=3, num_planes=4).collect()
    assert len(got) > 0
    buckets = {r["vec_id"]: r["bucket"] for r in lsh_sign_buckets(emb, num_planes=4).collect()}
    by_q = {}
    for r in got:
        # candidates only ever come from the query's own bucket
        assert buckets[r["q_id"]] == buckets[r["c_id"]]
        assert r["q_id"] != r["c_id"]
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_kmeans_lloyd_fixed_separable(spark):
    """Two well-separated blobs, k=2: every vector lands with its blob and
    centroids converge to the blob means (exact integer math)."""
    from block_crawler_spark.operators.ann import kmeans_lloyd_fixed

    rows = []
    for i in range(6):  # blob A around +0.3, ids 0-5
        rows.append((i, [0.3 + 0.001 * i, 0.3]))
    for i in range(6):  # blob B around -0.3, ids 10-15
        rows.append((10 + i, [-0.3 - 0.001 * i, -0.3]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assign, cents = kmeans_lloyd_fixed(emb, k=2, iters=2)
    got = {r["vid"]: r["cid"] for r in assign.collect()}
    # seeds are ids 0 and 1 (both in blob A); after the update steps the
    # two centroids split the blobs: one cluster = blob A, the other = blob B
    a_cids = {got[i] for i in range(6)}
    b_cids = {got[10 + i] for i in range(6)}
    assert len(a_cids) == 1 and len(b_cids) == 1 and a_cids != b_cids
    c = {r["cid"]: r["c"] for r in cents.collect()}
    b_cid = b_cids.pop()
    # blob B's centroid is the exact integer mean of its members:
    # floor(mean of floor(float32(x)*1e6)) per dim — the float32 round-trip
    # matters (-0.3 is -0.30000001192 as float32 → micro -300001)
    import math

    import numpy as np

    def micro(x):
        return math.floor(float(np.float32(x)) * 1_000_000)

    xs = [micro(-0.3 - 0.001 * i) for i in range(6)]
    assert c[b_cid][0] == math.floor(sum(xs) / 6)
    assert c[b_cid][1] == math.floor(sum([micro(-0.3)] * 6) / 6)
