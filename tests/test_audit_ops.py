"""Round-8 corpus/ops audit queries: invariants the oracles can't express.

doc_pack_fill_stats, doc_token_concentration, emb_dim_variance,
evt_key_skew_topk — each oracle-checked for values; these tests pin the
cross-query conservation laws and algebraic invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from block_crawler_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pack_fill_conserves_tokens_and_bounds_fill(spark):
    from block_crawler_spark.plans.pack_ops import SEQ_LEN_TOK, n_tok_col, pack_fill_stats_query

    rows = pack_fill_stats_query(spark, SF).collect()
    assert rows
    corpus_tok = (
        load_table(spark, SF, "documents").select(n_tok_col().alias("n")).agg(F.sum("n")).collect()[0][0]
    )
    assert sum(r["tok_sum"] for r in rows) == corpus_tok, "every token lands in exactly one bin"
    for r in rows:
        # a bin is opened only by a document START inside it, so it holds at
        # least one doc; mean fill is positive and max can exceed SEQ_LEN by
        # at most one document's tail (doc-starts-here rule)
        assert 0 < r["min_bin_tok"] <= r["max_bin_tok"]
        assert r["mean_fill_ppm"] > 0
        assert r["tok_sum"] >= (r["n_bins"] - 1) * SEQ_LEN_TOK, (
            "all bins but the shard's last must have been filled past the cut"
        )


def test_token_concentration_is_monotone_and_bounded(spark):
    from block_crawler_spark.plans.text_ops import token_concentration_query

    r = token_concentration_query(spark, SF).collect()[0]
    assert 0 < r["top1_ppm"] <= r["top10_ppm"] <= r["top100_ppm"] <= 1_000_000
    assert r["distinct_tokens"] <= r["total_tokens"]
    # the synthetic corpus vocabulary is small, so top-100 covers it all
    if r["distinct_tokens"] <= 100:
        assert r["top100_ppm"] >= 999_999 - 100  # integer-division slack


def test_dim_variance_moments_are_consistent(spark):
    from block_crawler_spark.plans.embed_ops import dim_variance_query

    rows = dim_variance_query(spark, SF).collect()
    n_vec = load_table(spark, SF, "embeddings").count()
    dims = sorted(r["dim"] for r in rows)
    assert dims == list(range(len(dims))), "every dimension exactly once"
    for r in rows:
        assert r["n"] == n_vec
        # Cauchy-Schwarz in integers: n·sumsq ≥ sum² (variance ≥ 0)
        assert r["n"] * r["sumsq_micro"] >= r["sum_micro"] ** 2
        assert r["mean_micro"] == r["sum_micro"] // r["n"] or (
            # floor(sum/n) in double space equals // for these magnitudes
            abs(r["mean_micro"] - r["sum_micro"] // r["n"]) <= 1
        )


def test_key_skew_ranks_and_shares(spark):
    from block_crawler_spark.plans.events_ops import key_skew_topk

    rows = sorted(key_skew_topk(spark, SF).collect(), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["n_events"] for r in rows]
    assert counts == sorted(counts, reverse=True), "heaviest first"
    total = load_table(spark, SF, "events").count()
    for r in rows:
        assert r["share_ppm"] == r["n_events"] * 1_000_000 // total
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000


def test_admission_sim_matches_the_real_store(spark, tmp_path):
    """dedup_stream_admission_sim claims to be the relational twin of the
    corpus store's exact-dedup admission rule — prove it: feed the ACTUAL
    CorpusIngestStore the same admitted set + synthetic batch and the
    store's admitted count must equal the sim's 'admitted' verdict count
    (and the blocked counts must account for the rest)."""
    from block_crawler_spark.plans.text_ops import stream_admission_sim_query
    from block_crawler_spark.streaming.corpus import CorpusIngestStore

    sim = {r["verdict"]: r["n_docs"] for r in stream_admission_sim_query(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    admitted0 = docs.filter(F.col("doc_id") % 5 != 4)
    src = F.expr(
        "CASE WHEN doc_id % 25 = 24 THEN doc_id - 5 "
        "WHEN doc_id % 10 = 9 THEN doc_id - 4 ELSE doc_id END"
    )
    batch = (
        docs.filter(F.col("doc_id") % 5 == 4)
        .select("doc_id", "lang", "source", src.alias("src_id"))
        .join(
            docs.select(F.col("doc_id").alias("src_id"), "text", "n_chars"),
            "src_id",
        )
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    n_batch = batch.count()
    assert sum(sim.values()) == n_batch

    store = CorpusIngestStore(spark, str(tmp_path / "corpus"))
    store.ingest_batch(admitted0, 0)
    n0 = store.corpus().count()
    store.ingest_batch(batch, 1)
    store_admitted = store.corpus().count() - n0
    assert store_admitted == sim.get("admitted", 0), (sim, store_admitted)
    assert sim.get("blocked_batch", 0) > 0 and sim.get("blocked_seen", 0) > 0
