"""Invariant tests for the training-data shaping queries (plans/pack_ops).

The oracle gate certifies value equality vs DuckDB; these tests pin the
*semantic* invariants the SQL alone doesn't make obvious: chunk coverage,
packing conservation, and mixture-rate bounds.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from block_crawler_spark.plans.pack_ops import (
    CHUNK_CHARS,
    PACK_SHARDS,
    SEQ_LEN_TOK,
    STRIDE_CHARS,
    chunk_stats_query,
    mixture_plan_query,
    pack_sequences_query,
)
from block_crawler_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_chunk_coverage_and_content(spark):
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF, "documents").collect()}
    chunks = chunk_stats_query(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, t in docs.items() if len(t) > 0}
    for doc_id, rows in by_doc.items():
        text = docs[doc_id]
        rows.sort(key=lambda r: r["chunk_idx"])
        # contiguous indexes, exactly while i*STRIDE < len(text)
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        # exactly the starts with i*STRIDE < len(text): one too many or too
        # few chunk rows fails one of these two bounds
        assert (len(rows) - 1) * STRIDE_CHARS < len(text)
        assert len(rows) * STRIDE_CHARS >= len(text)
        for r in rows:
            expect = text[r["chunk_idx"] * STRIDE_CHARS : r["chunk_idx"] * STRIDE_CHARS + CHUNK_CHARS]
            assert r["chunk_len"] == len(expect)
            assert r["chunk_md5"] == hashlib.md5(expect.encode("utf-8")).hexdigest()
        # every character of the doc is inside at least one chunk
        assert (len(rows) - 1) * STRIDE_CHARS + rows[-1]["chunk_len"] == len(text)


def test_pack_conserves_tokens_and_orders_bins(spark):
    docs = load_table(spark, SF, "documents")
    total_tok = docs.select(F.expr("size(split(trim(text), '\\\\s+'))").cast("long").alias("n")).agg(F.sum("n")).first()[0]
    bins = pack_sequences_query(spark, SF).collect()
    assert sum(r["tok_sum"] for r in bins) == total_tok
    assert sum(r["n_docs"] for r in bins) == docs.count()
    by_shard: dict[int, list] = {}
    for r in bins:
        assert 0 <= r["shard"] < PACK_SHARDS
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["bin_id"])
        # bins start at 0; a bin may span >SEQ_LEN (a doc straddles a cut) but
        # consecutive bin ids never skip more than the largest doc can cover
        assert rows[0]["bin_id"] == 0
        # doc ranges per bin are disjoint and ordered with the bins
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] < b["first_doc"]
        for r in rows:
            assert r["first_doc"] <= r["last_doc"]


def test_chunk_dup_stats_flags_shared_windows(spark):
    from block_crawler_spark.plans.pack_ops import chunk_dup_stats_query

    rows = chunk_dup_stats_query(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        assert r["dup_ppm"] == r["n_dup_chunks"] * 1_000_000 // r["n_chunks"]
    # the synthetic corpus has exact-duplicate documents (dedup_exact finds
    # them), so SOME chunk somewhere must be shared
    assert any(r["n_dup_chunks"] > 0 for r in rows)


def test_mixture_rates_and_caps(spark):
    plan = mixture_plan_query(spark, SF).collect()
    assert plan, "at least one source"
    for r in plan:
        assert 0 <= r["rate_ppm"] <= 1_000_000
        assert r["n_sampled"] <= r["n_docs"]
        assert r["sampled_tok"] <= r["avail_tok"]
        assert 1 <= r["weight"] <= 4
        if r["target_tok"] >= r["avail_tok"]:
            assert r["rate_ppm"] == 1_000_000
    # the realized sample is in the neighborhood of the plan: every fully-kept
    # source samples everything
    for r in plan:
        if r["rate_ppm"] == 1_000_000:
            assert r["n_sampled"] == r["n_docs"] and r["sampled_tok"] == r["avail_tok"]


def test_pack_bin_fill_is_near_budget(spark):
    """All but the last bin of each shard must have reached the cut point:
    tok_sum of bin b plus the straddling doc's carry ≥ SEQ_LEN_TOK.  Weaker
    but order-free form: per shard, (#bins - 1) * SEQ_LEN ≤ total tokens."""
    bins = pack_sequences_query(spark, SF).collect()
    by_shard: dict[int, list] = {}
    for r in bins:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        shard_tok = sum(r["tok_sum"] for r in rows)
        max_bin = max(r["bin_id"] for r in rows)
        assert max_bin * SEQ_LEN_TOK <= shard_tok


def test_bpe_merge_chain_matches_python_reference(spark):
    """The toy-BPE count must equal a straight Python replay of the merges
    table (replace is leftmost-first non-overlapping in both engines —
    the property the SQL oracle also rests on), across unicode, overlap
    ('thth'), second-order merges ('the', 'ing') and empty inputs."""
    import re

    from pyspark.sql import functions as F

    from block_crawler_spark.functions.text import BPE_MERGES, TOKEN_PATTERN, bpe_token_count

    def py_count(text):
        total = 0
        for t in re.findall(TOKEN_PATTERN, text.lower()):
            for pair, sym in BPE_MERGES:
                t = t.replace(pair, sym)
            total += len(t)
        return total

    samples = [
        "The testing internet!",
        "Reorganization, at the stationer's art.",
        "",
        "   ",
        "aaa thth inging ththe",
        "étude naïve — ünïcode? 12345",
        "the the the ing ing ing",
    ]
    df = spark.createDataFrame(list(enumerate(samples)), "id long, text string")
    got = {r["id"]: r["n"] for r in df.select("id", bpe_token_count(F.col("text")).alias("n")).collect()}
    for i, s in enumerate(samples):
        assert got[i] == py_count(s), (s, got[i], py_count(s))


def test_n_tok_mode_switch_changes_budget_unit_not_shape(spark):
    """Packing under mode='bpe' uses strictly finer units (BPE tokens ≥
    regex words never holds in general, but total BPE tokens > total ws
    tokens on prose), conserves every document exactly once, and keeps the
    bin math; mode='ws' stays byte-identical to the default."""
    import pytest as _pytest

    from block_crawler_spark.plans.pack_ops import n_tok_col, pack_sequences_query

    sf = "/root/testdata/sf0.001"
    ws = pack_sequences_query(spark, sf)
    ws2 = pack_sequences_query(spark, sf, n_tok_mode="ws")
    bpe = pack_sequences_query(spark, sf, n_tok_mode="bpe")
    assert sorted(map(str, ws.collect())) == sorted(map(str, ws2.collect()))
    n_docs_ws = sum(r["n_docs"] for r in ws.collect())
    rows_bpe = bpe.collect()
    assert sum(r["n_docs"] for r in rows_bpe) == n_docs_ws, "every doc packed exactly once"
    assert sum(r["tok_sum"] for r in rows_bpe) > sum(r["tok_sum"] for r in ws.collect())
    with _pytest.raises(ValueError, match="unknown mode"):
        n_tok_col("words")


def test_bpe_pair_freqs_counts_post_merge_symbols(spark):
    """Induction must count pairs in the CURRENT merge state: a component
    pair of an existing rule can never surface (its occurrences always
    fused), every reported pair is a next-merge candidate, and counts are
    positive and rank-ordered."""
    from block_crawler_spark.functions.text import BPE_MERGES
    from block_crawler_spark.plans.text_ops import bpe_pair_freqs_query

    rows = bpe_pair_freqs_query(spark, "/root/testdata/sf0.001").collect()
    assert rows and len(rows) <= 50
    merged = {pair for pair, _sym in BPE_MERGES}
    seen = [r["pair"] for r in rows]
    assert not (set(seen) & merged), f"already-merged pairs surfaced: {set(seen) & merged}"
    counts = [r["n_occ"] for r in rows]
    assert counts == sorted(counts, reverse=True) and counts[-1] > 0
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_bpe_count_fuzz_matches_python_reference(spark):
    """Seeded fuzz: 200 random strings over a mixed alphabet (letters,
    digits, punctuation, whitespace runs, unicode) must count identically
    in Spark and a pure-Python replay — one Spark job for the whole set."""
    import random
    import re

    from pyspark.sql import functions as F

    from block_crawler_spark.functions.text import BPE_MERGES, TOKEN_PATTERN, bpe_token_count

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz" * 4 + "0123456789.,;:!?'\"()- \t\n" + "éüïñç东"
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120))) for _ in range(200)
    ]

    def py_count(text):
        total = 0
        for t in re.findall(TOKEN_PATTERN, text.lower()):
            for pair, sym in BPE_MERGES:
                t = t.replace(pair, sym)
            total += len(t)
        return total

    df = spark.createDataFrame(list(enumerate(samples)), "id long, text string")
    got = {r["id"]: r["n"] for r in df.select("id", bpe_token_count(F.col("text")).alias("n")).collect()}
    bad = [(samples[i], got[i], py_count(samples[i])) for i in range(200) if got[i] != py_count(samples[i])]
    assert not bad, bad[:3]


def test_ppm_exprs_survive_int64_overflow_region(spark):
    """The r10 ppm expressions multiplied int64 pair/token sums by 1e6
    BEFORE dividing; past ~9.2e12 per-shard sum the product overflows
    int64 — under Spark 4's default ANSI mode the whole query DIES with
    ArithmeticException (legacy mode would wrap silently), while DuckDB
    promotes to HUGEINT and keeps going — a scale cliff at ~72 GB/shard
    plus a cross-engine divergence (ADVICE r11).  The fixed helpers widen
    to DECIMAL(38,0) first.  This synthetic frame puts the cross-pair sum
    at ~1.9e13: the old expression must fail here and the new one must
    return the exact ppm."""
    import pytest
    from pyspark.sql import functions as F

    from block_crawler_spark.plans.pack_ops import SEQ_LEN_TOK, fill_ppm_expr, waste_ppm_expr

    t = 3_100_000  # a bin of 3.1M single-token docs: s2 = t, cross = t*t - t
    s2 = t  # sum(cross) over two bins = 2*(t*t - t) = 1.922e13 -> *1e6 wraps
    big_tok = 5_000_000_000_000  # sum(bin_tok) = 1e13 -> *1e6 wraps too
    bins = spark.createDataFrame(
        [(t, s2, big_tok), (t, s2, big_tok)], "t long, s2 long, bin_tok long"
    )
    with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
        bins.agg(
            F.expr("CAST(sum(t * t - s2) * 1000000 DIV sum(t * t) AS BIGINT)").alias("w")
        ).head()
    exp_waste = (2 * (t * t - t)) * 1_000_000 // (2 * t * t)
    got_waste = bins.agg(waste_ppm_expr().alias("w")).head()["w"]
    assert got_waste == exp_waste

    with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
        bins.agg(
            F.expr(
                f"CAST(sum(bin_tok) * 1000000 DIV (count(*) * {SEQ_LEN_TOK}) AS BIGINT)"
            ).alias("f")
        ).head()
    exp_fill = (2 * big_tok) * 1_000_000 // (2 * SEQ_LEN_TOK)
    got_fill = bins.agg(fill_ppm_expr().alias("f")).head()["f"]
    assert got_fill == exp_fill
