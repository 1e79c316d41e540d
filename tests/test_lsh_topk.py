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
