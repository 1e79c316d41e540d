"""Evidence tests for the five r9-added queries (shipped without any —
VERDICT r9 task 1) and the seven r10 additions.

emb_rp_topk / emb_prefix_topk get the recall-vs-brute characterization
their docstrings promise: on this corpus (isotropic unit-norm synthetic
embeddings — no low-dim structure for a training-free sketch to exploit)
the honest measured recall@10 is LOW (0.1–0.3); the tests pin the floor
(the query's self-hit always survives any distance-preserving sketch),
the structural contract (dense ranks, monotone distances), and that the
measured number is recorded, not invented.  The other five get the
conservation/consistency invariants their oracles can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from block_crawler_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


SF_RECALL = "/root/testdata/sf0.01"  # where rp recall exceeds the self-hit floor


def _brute_topk_ids(spark, sf):
    from block_crawler_spark.operators.ann import int_sqdist, micro_fixed
    from block_crawler_spark.plans.embed_ops import TOPK_K

    vecs = load_table(spark, sf, "embeddings").select(
        "vec_id", micro_fixed(F.col("embedding")).alias("v")
    )
    qv = vecs.filter(F.col("vec_id") == 0).head()["v"]
    brute = (
        vecs.select(
            "vec_id", int_sqdist(F.col("v"), F.array(*[F.lit(int(x)) for x in qv])).alias("d")
        )
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(TOPK_K)
    )
    return {r["vec_id"] for r in brute.collect()}


def _check_topk_contract(rows, dist_col):
    """Dense 1..k ranks, distances non-decreasing with rank, self-hit first."""
    rows = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    dists = [r[dist_col] for r in rows]
    assert dists == sorted(dists)
    assert rows[0]["vec_id"] == 0 and rows[0][dist_col] == 0, (
        "the query vector itself must be the exact rank-1 hit (distance 0 "
        "survives any sketch built from the same integer math)"
    )


def test_rp_topk_recall_vs_brute(spark):
    from block_crawler_spark.plans.embed_ops import TOPK_K, rp_topk_query

    rows = rp_topk_query(spark, SF).collect()
    assert len(rows) == TOPK_K
    _check_topk_contract(rows, "rp_dist")
    truth = _brute_topk_ids(spark, SF)
    recall = len({r["vec_id"] for r in rows} & truth) / len(truth)
    # Measured: 0.1 at sf0.001, 0.3 at sf0.01 — a 16-projection JL sketch
    # of isotropic 64-dim vectors preserves pairwise distances only to
    # within large distortion, and these embeddings have no cluster
    # structure to help.  The floor is the guaranteed self-hit; anything
    # above it is sketch signal.  This is the honest figure of merit, and
    # it is why rp_topk is a SHORTLIST stage (rerank survivors exactly),
    # never a final ranking.
    assert recall >= 1 / TOPK_K
    # At sf0.001 the measured recall EQUALS the floor, so the real
    # sketch-signal regression gate runs at sf0.01 below.


def test_rp_topk_recall_band_above_floor(spark):
    """Recall gate at a scale where the JL sketch shows signal BEYOND the
    guaranteed self-hit (ADVICE r10: the floor-only assert was satisfiable
    by a sketch that destroyed all signal).  Measured 0.3 at sf0.01 on
    deterministic driver data; the band [0.15, 0.6] fails a layout
    regression that collapses recall to the 0.1 self-hit floor while
    leaving headroom against seed-level wiggle."""
    from block_crawler_spark.plans.embed_ops import rp_topk_query

    rows = rp_topk_query(spark, SF_RECALL).collect()
    truth = _brute_topk_ids(spark, SF_RECALL)
    recall = len({r["vec_id"] for r in rows} & truth) / len(truth)
    assert 0.15 <= recall <= 0.6, f"rp sketch recall@10 drifted: {recall}"


def test_prefix_topk_recall_vs_brute(spark):
    from block_crawler_spark.plans.embed_ops import PREFIX_DIMS, TOPK_K, prefix_topk_query

    rows = prefix_topk_query(spark, SF).collect()
    assert len(rows) == TOPK_K
    _check_topk_contract(rows, "prefix_dist")
    truth = _brute_topk_ids(spark, SF)
    recall = len({r["vec_id"] for r in rows} & truth) / len(truth)
    # Measured: exactly 0.1 (the self-hit floor) at sf0.001 AND sf0.01 —
    # the first 16 of 64 dims carry ~1/4 of the energy of a generic
    # (non-Matryoshka-trained) embedding, so prefix rank is
    # near-independent of full rank on this corpus.  Exactly the baseline
    # number an adaptive-retrieval evaluation needs: truncation without
    # MRL training buys nothing here.  Pinned as a GOLDEN EQUALITY
    # (deterministic data, deterministic query): movement in EITHER
    # direction means the layout or the corpus changed and the docstring's
    # measured claim must be re-verified.
    assert recall == 1 / TOPK_K
    assert PREFIX_DIMS < 64  # the query must actually truncate


def test_zipf_buckets_conserve_type_and_token_mass(spark):
    from block_crawler_spark.functions.text import tokens
    from block_crawler_spark.plans.text_ops import zipf_bucket_hist_query

    rows = zipf_bucket_hist_query(spark, SF).collect()
    assert rows
    tok = load_table(spark, SF, "documents").select(
        F.explode(tokens(F.lower(F.trim(F.col("text"))))).alias("t")
    )
    total_tokens = tok.count()
    total_types = tok.distinct().count()
    assert sum(r["tok_mass"] for r in rows) == total_tokens, "every occurrence in exactly one bucket"
    assert sum(r["n_types"] for r in rows) == total_types, "every type in exactly one bucket"
    for r in rows:
        # bucket b holds types with freq in [2^(b-1), 2^b): mass bounds
        assert r["bucket"] >= 1
        assert r["tok_mass"] >= r["n_types"] * (1 << (r["bucket"] - 1))
        assert r["tok_mass"] < r["n_types"] * (1 << r["bucket"])


def test_token_fertility_conserves_counts(spark):
    from block_crawler_spark.functions.text import bpe_token_count, n_tokens
    from block_crawler_spark.plans.text_ops import token_fertility_query

    rows = token_fertility_query(spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    agg = docs.select(
        n_tokens(F.col("text")).alias("ws"), bpe_token_count(F.col("text")).alias("bpe")
    ).agg(F.count("*").alias("n"), F.sum("ws").alias("ws"), F.sum("bpe").alias("bpe")).head()
    assert sum(r["n_docs"] for r in rows) == agg["n"]
    assert sum(r["ws_tokens"] for r in rows) == agg["ws"]
    assert sum(r["bpe_tokens"] for r in rows) == agg["bpe"]
    for r in rows:
        assert r["fertility_ppm"] == r["bpe_tokens"] * 1_000_000 // max(r["ws_tokens"], 1)


def test_contamination_by_bench_covers_every_bench_item(spark):
    from block_crawler_spark.functions.text import shingles
    from block_crawler_spark.plans.text_ops import DECON_BENCH_MOD, contamination_by_bench_query

    rows = {r["bench_id"]: r for r in contamination_by_bench_query(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    bench = docs.filter((F.col("doc_id") % DECON_BENCH_MOD) == 0)
    bench_ids = {r["doc_id"] for r in bench.select("doc_id").collect()}
    assert set(rows) == bench_ids, "zero-overlap items are part of the contract"
    sh_count = {
        r["doc_id"]: r["n_sh"]
        for r in bench.select(
            "doc_id", F.size(F.array_distinct(shingles(F.col("text")))).alias("n_sh")
        ).collect()
    }
    n_train = docs.count() - len(bench_ids)
    for bid, r in rows.items():
        assert 0 <= r["n_shared_shingles"] <= sh_count[bid]
        assert 0 <= r["n_contaminating_docs"] <= n_train
        # a doc contaminated by k>0 docs shares ≥1 shingle, and vice versa
        assert (r["n_contaminating_docs"] > 0) == (r["n_shared_shingles"] > 0)


def test_quality_calibration_is_a_closed_lift_table(spark):
    from block_crawler_spark.plans.text_ops import quality_calibration_query

    rows = quality_calibration_query(spark, SF).collect()
    n_corpus = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_corpus, "every document in exactly one cell"
    # per-decile shares sum to 1e6 up to one integer-division ulp per source
    by_decile: dict = {}
    base_by_source: dict = {}
    for r in rows:
        by_decile.setdefault(r["decile"], []).append(r["share_ppm"])
        base_by_source.setdefault(r["source"], set()).add(r["base_ppm"])
        assert r["lift_ppm"] == r["share_ppm"] * 1_000_000 // max(r["base_ppm"], 1)
    for decile, shares in by_decile.items():
        assert 1_000_000 - len(shares) <= sum(shares) <= 1_000_000
    for source, bases in base_by_source.items():
        assert len(bases) == 1, "a source's base rate is decile-independent"


def test_pack_attention_waste_matches_per_bin_recompute(spark):
    """The shard-level pair algebra (Σ over bins of T² and T² − Σnᵢ²)
    equals a direct per-bin recompute from the shared assign_bins frame,
    and the waste sits in (0, 1e6): a bin with ≥2 docs has both within-
    and cross-document pairs."""
    from block_crawler_spark.plans.pack_ops import (
        assign_bins,
        n_tok_col,
        pack_attention_waste_query,
        pack_shard,
    )

    rows = {r["shard"]: r for r in pack_attention_waste_query(spark, SF).collect()}
    per = load_table(spark, SF, "documents").select(
        "doc_id", n_tok_col().alias("n_tok"), pack_shard().alias("shard")
    )
    binned = assign_bins(per).collect()
    bins: dict = {}
    for r in binned:
        bins.setdefault((r["shard"], r["bin_id"]), []).append(r["n_tok"])
    expect: dict = {}
    for (shard, _), toks in bins.items():
        t = sum(toks)
        e = expect.setdefault(shard, {"n_bins": 0, "total": 0, "cross": 0})
        e["n_bins"] += 1
        e["total"] += t * t
        e["cross"] += t * t - sum(n * n for n in toks)
    assert set(rows) == set(expect)
    for shard, e in expect.items():
        r = rows[shard]
        assert (r["n_bins"], r["total_pairs"], r["cross_pairs"]) == (
            e["n_bins"],
            e["total"],
            e["cross"],
        )
        assert r["waste_ppm"] == e["cross"] * 1_000_000 // e["total"]
        assert 0 < r["waste_ppm"] < 1_000_000


def test_threshold_sweep_consistent_with_thresholded_pairs(spark):
    """The sweep's cumulative at-or-above count at the registry threshold's
    decile equals the thresholded pair query's row count (same banding,
    same exact Jaccard), buckets partition the candidate set, and the
    cumulative column is the suffix sum of the histogram."""
    from block_crawler_spark.plans.text_ops import (
        JACCARD_PPM_THRESHOLD,
        dedup_threshold_sweep_query,
        minhash_pairs_query,
    )

    rows = sorted(dedup_threshold_sweep_query(spark, SF).collect(), key=lambda r: -r["decile"])
    assert rows
    cum = 0
    for r in rows:
        cum += r["n_pairs"]
        assert r["cum_pairs_at_or_above"] == cum
    n_at_threshold = minhash_pairs_query(spark, SF).count()
    cut_decile = JACCARD_PPM_THRESHOLD // 100_000
    assert JACCARD_PPM_THRESHOLD == cut_decile * 100_000, (
        "the identity below assumes the registry threshold is decile-aligned"
    )
    at_or_above = sum(r["n_pairs"] for r in rows if r["decile"] >= cut_decile)
    assert at_or_above == n_at_threshold


def test_sorted_packing_conserves_tokens_and_bounds_overflow(spark):
    """The length-sorted tape packs the SAME tokens (per-shard tok_sum
    equal to the doc_id-order layout), and in BOTH layouts a bin's
    overflow past SEQ_LEN is bounded by one document's tail
    (bin_tok < SEQ_LEN + max doc length in its shard) — the
    doc-starts-here rule's theorem, layout-independent."""
    from block_crawler_spark.plans.pack_ops import (
        SEQ_LEN_TOK,
        n_tok_col,
        pack_fill_stats_query,
        pack_shard,
        pack_sorted_fill_stats_query,
    )

    unsorted = {r["shard"]: r for r in pack_fill_stats_query(spark, SF).collect()}
    by_len = {r["shard"]: r for r in pack_sorted_fill_stats_query(spark, SF).collect()}
    assert set(unsorted) == set(by_len)
    max_doc = {
        r["shard"]: r["m"]
        for r in load_table(spark, SF, "documents")
        .select(n_tok_col().alias("n_tok"), pack_shard().alias("shard"))
        .groupBy("shard")
        .agg(F.max("n_tok").alias("m"))
        .collect()
    }
    for shard, u in unsorted.items():
        s = by_len[shard]
        assert s["tok_sum"] == u["tok_sum"], "a layout change must not create or drop tokens"
        for r in (u, s):
            assert r["max_bin_tok"] < SEQ_LEN_TOK + max_doc[shard]
            assert 0 < r["min_bin_tok"] <= r["max_bin_tok"]


def test_centroid_outliers_is_a_closed_per_cell_report(spark):
    """Per-cell members sum to the corpus, mean is the truncated per-cell
    mean of the shared assignment's distances, and the outlier flag is
    exactly dist > 2×mean — recomputed driver-side from the same
    kmeans_lloyd_fixed assignment the query consumes."""
    from block_crawler_spark.operators.ann import kmeans_lloyd_fixed
    from block_crawler_spark.plans.embed_ops import (
        KMEANS_ITERS,
        OUTLIER_CELLS,
        OUTLIER_MULT,
        centroid_outliers_query,
    )

    rows = {r["cluster"]: r for r in centroid_outliers_query(spark, SF).collect()}
    emb = load_table(spark, SF, "embeddings")
    assign, _ = kmeans_lloyd_fixed(emb, k=OUTLIER_CELLS, iters=KMEANS_ITERS)
    by_cell: dict = {}
    for r in assign.collect():
        by_cell.setdefault(r["cid"], []).append(r["dist"])
    assert sum(r["n_members"] for r in rows.values()) == emb.count()
    assert set(rows) == set(by_cell)
    for cid, dists in by_cell.items():
        r = rows[cid]
        mean = sum(dists) // len(dists)
        n_out = sum(1 for d in dists if d > OUTLIER_MULT * mean)
        assert r["n_members"] == len(dists)
        assert r["mean_sqdist"] == mean
        assert r["n_outliers"] == n_out
        assert r["outlier_ppm"] == n_out * 1_000_000 // len(dists)


def test_rate_spikes_flag_rule_and_warmup(spark):
    """The spike flag equals the integer cross-multiplication rule against
    a driver-side trailing recompute (previous ≤24 OBSERVED buckets), and
    no row inside the warmup can be flagged."""
    from block_crawler_spark.plans.events_ops import (
        SPIKE_MULT,
        SPIKE_TRAIL,
        SPIKE_WARMUP,
        rate_spikes_query,
    )

    rows = rate_spikes_query(spark, SF).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r["hour"])
        ns = [r["n"] for r in series]
        for i, r in enumerate(series):
            trail = ns[max(0, i - SPIKE_TRAIL) : i]
            assert r["trail_n"] == len(trail)
            assert r["trail_sum"] == sum(trail)
            expect = len(trail) >= SPIKE_WARMUP and r["n"] * len(trail) > SPIKE_MULT * sum(trail)
            assert r["is_spike"] == expect
            if i < SPIKE_WARMUP:
                assert not r["is_spike"], "cold start must never flag"


def test_unigram_surprisal_bounds_and_mean(spark):
    from block_crawler_spark.functions.text import tokens
    from block_crawler_spark.plans.text_ops import unigram_surprisal_query

    rows = unigram_surprisal_query(spark, SF).collect()
    tok = load_table(spark, SF, "documents").select(
        F.explode(tokens(F.lower(F.trim(F.col("text"))))).alias("t")
    )
    total = tok.count()
    assert sum(r["n_tokens"] for r in rows) == total, "every occurrence scored exactly once"
    max_bits = total.bit_length()  # freq=1 → bitlen(T) bits; freq=T → 1 bit
    for r in rows:
        assert r["n_tokens"] * 1 <= r["sum_bits"] <= r["n_tokens"] * max_bits
        assert r["mean_surprisal_mbits"] == r["sum_bits"] * 1000 // r["n_tokens"]
        assert 1000 <= r["mean_surprisal_mbits"] <= max_bits * 1000
