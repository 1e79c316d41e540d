"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Each query is forced end-to-end with a noop sink (full column computation,
no driver collect overhead).  Prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from block_crawler_spark.plans.registry import all_queries
from block_crawler_spark.session import get_spark

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
    "tpch_q8_market_share",
    "agg_orders_monthly",
    "agg_rollup_region_nation",
    "doc_winnow_fingerprint",
    "evt_token_state_fold",
    "evt_json_balances",
    "evt_window_hourly",
    "evt_sessionize",
    "doc_quality_ppm",
    "media_binary_features",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "emb_topk_cosine",
    "emb_knn_join",
    "emb_lsh_buckets",
    "emb_ivf_topk",
    "dedup_embedding_cosine_pairs",
    "join_asof_last_signup",
    "join_range_ship_windows",
    "evt_value_percentiles",
    "dedup_simhash_pairs",
    "doc_decontaminate",
    "doc_pii_stats",
    "media_frame_stats",
    "doc_chunk_stats",
    "doc_chunk_dup_stats",
    "doc_pack_sequences",
    "doc_mixture_plan",
    "doc_curation_pipeline",
    "nft_uint256_clamp_policy",
    "nft_token_state_from_lineitem",
    "nft_owners_from_lineitem",
    "nft_transfers_decode_from_lineitem",
    "nft_1155_balances_from_events",
    "tx_sender_gas_stats",
    "emb_pq_topk",
    "doc_shuffle_shards",
    "emb_pq_trained_topk",
    "emb_ivfpq_topk",
    "doc_bpe_token_stats",
    "doc_pack_sequences_bpe",
    "emb_ivfpq_residual_topk",
    "doc_bpe_pair_freqs",
    "doc_source_overlap",
    "doc_quality_hist_by_source",
    "dedup_containment_pairs",
    # round 8: the r7-added tail (previously untrended — ADVICE r7) and the
    # round's new trained-residual query
    "dedup_winnow_span_pairs",
    "dedup_cluster_size_hist",
    "doc_quality_budget_cut",
    "doc_token_cms_estimates",
    "emb_ivf_cell_balance",
    "emb_ivfpq_residual_trained",
    "doc_pack_fill_stats",
    "doc_token_concentration",
    "emb_dim_variance",
    "evt_key_skew_topk",
    "emb_pq_balanced_topk",
    "evt_funnel_counts",
    "evt_retention_cohorts",
    "dedup_stream_admission_sim",
    "doc_hapax_per_source",
    "doc_ngram_novelty",
    "doc_tfidf_top_terms",
    "doc_intradoc_dup_stats",
    "doc_gopher_rules",
    "emb_sq_topk",
    "dedup_semantic_cells",
    "doc_lang_confusion",
    "dedup_minhash_est_error",
    "emb_power_topdim",
    "dedup_pair_pagerank",
    "evt_funnel_latency",
    "dedup_semantic_keep",
    "evt_window_sliding",
    "evt_markov_transitions",
    "evt_cube_type_day",
    "dedup_edit_distance_pairs",
    "emb_balanced_sample",
    "emb_ivfsq_topk",
    "dedup_rate_by_source",
    "doc_length_percentiles",
    # round 10: the r9-added tail (previously untrended — VERDICT r9 task 1)
    # and the round's seven new queries
    "emb_rp_topk",
    "emb_prefix_topk",
    "doc_zipf_bucket_hist",
    "doc_token_fertility",
    "doc_contamination_by_bench",
    "doc_quality_calibration",
    "doc_unigram_surprisal",
    "doc_pack_attention_waste",
    "dedup_threshold_sweep",
    "doc_pack_sorted_fill_stats",
    "emb_centroid_outliers",
    "evt_rate_spikes",
    # round 11
    "pipeline_contamination",
    "doc_bigram_surprisal",
    "dedup_semantic_cells_mp2",
    "dedup_semantic_keep_mp2",
    "emb_rp_rerank_topk",
    "doc_shard_mixing_audit",
    # round 12
    "emb_balanced_sample_mp2",
    "doc_bigram_quality_calibration",
    "dedup_semantic_threshold_sweep",
    "emb_bitsign_rerank_topk",
    "dedup_family_overlap",
    "doc_span_dup_coverage",
    "emb_cell_label_purity",
    "emb_ivf_recall_audit",
    "emb_bitsign_knn_join",
    "evt_attribution_interval_join",
    # round 13
    "media_phash_near_dup_pairs",
    "media_dup_family_overlap",
    "media_image_dhash_pairs",
    "media_audio_energy_pairs",
    "doc_lm_gated_quality",
    # round 14
    "emb_pq_rerank_topk",
    "media_video_dhash_pairs",
    "doc_lm_gated_quality_planted",
    "media_modality_overlap",
    "emb_ivfpq_rerank_topk",
    "media_stream_phash_admission_sim",
    "dedup_stream_minhash_admission_sim",
    "dedup_stream_semantic_admission_sim",
]

# Session-memoized families (VERDICT r13 "What's wrong" #1 / task 3): for
# these, best-of-3 measures the WARM (memo-hit) steady state — honest for
# consumers whose memo feeds real downstream plans, but the record owes the
# COLD cost a fresh session pays.  Each family lists its HEADLINE members in
# bench order; the FIRST member's FIRST sample is the cold number (it
# executes the training/pair/closure build; every later sample and member
# replays the memo).  Cold attribution follows bench order by design: e.g.
# the mp2 pair stage's first sample already benefits from the centroid memo
# the p1 family trained — exactly what a fresh session replaying this bench
# would pay.
MEMO_FAMILIES = {
    "semantic_p1": [
        "dedup_semantic_cells",
        "dedup_semantic_keep",
        "emb_balanced_sample",
        "dedup_semantic_threshold_sweep",
    ],
    "semantic_mp2": [
        "dedup_semantic_cells_mp2",
        "dedup_semantic_keep_mp2",
        "emb_balanced_sample_mp2",
    ],
    "pq_codebook": ["emb_pq_trained_topk", "emb_pq_rerank_topk", "emb_ivfpq_rerank_topk"],
    "residual_codebook": ["emb_ivfpq_residual_trained"],
    "kmeans_outliers": ["emb_centroid_outliers"],
    # r14: the four under-valve overlap pair-frame memos (simhash exceeds
    # the valve and stays live, so warm still pays its DAG)
    "overlap_pairs": ["dedup_family_overlap"],
    # r14: the admission sim trains its own admitted-split codebook
    "semantic_admsim": ["dedup_stream_semantic_admission_sim"],
    # r14: the minhash pair stage + transitive closure ride session memos
    # shared by the closure/pagerank consumers (dedup_minhash_lsh_pairs
    # itself stays live — it returns the pair frame verbatim); members in
    # HEADLINE order so [0]'s first sample is the cold build
    "minhash_closure": [
        "doc_curation_pipeline",  # first memo consumer in HEADLINE order
        "dedup_cluster_size_hist",
        "dedup_pair_pagerank",
        "dedup_rate_by_source",
        "pipeline_contamination",
    ],
    # r14: the five modality pair frames ride session memos (standalone
    # media pair queries stay live)
    "modality_pairs": ["media_modality_overlap"],
    # r14: the OPQ-lite permutation's ≤dim-row moments frame rides a memo
    # (emb_dim_variance itself stays live)
    "dim_moments": ["emb_pq_balanced_topk"],
}


def _last_round_timings() -> dict[str, float]:
    """Per-query seconds for the outlier re-run baseline.

    The ``bench_telemetry.json`` sidecar wins when it parses: it is
    REWRITTEN by every bench run (including the driver's per-round run),
    so its content is always the most recent completed run's timings — it
    cannot be staler than any per-query data a BENCH_r*.json holds.  The
    r9-advice alternative (mtime competition) was tried and rejected in
    r10 review: r9+ driver records carry NO per-query dict (their captured
    tail truncates the telemetry line's head), and in a fresh clone every
    file shares checkout mtime — so mtime order could only ever promote an
    ANCIENT (≤ r8) record's timings over the sidecar's.  Fallback, for
    clones without a sidecar: BENCH_r*.json by round number descending.
    {} when nothing parses."""
    import glob
    import re as _re

    def _q_or_none(path: str) -> dict[str, float] | None:
        with open(path) as f:
            rec = json.load(f)
        # driver records wrap our JSON line: check 'parsed', then the
        # top level, then the last JSON-looking line captured in 'tail'
        for cand in (rec.get("parsed") if isinstance(rec, dict) else None, rec):
            if isinstance(cand, dict) and isinstance(cand.get("queries"), dict) and cand["queries"]:
                return {k: float(v) for k, v in cand["queries"].items()}
        tail = rec.get("tail", "") if isinstance(rec, dict) else ""
        i = tail.rfind('{"metric"')
        if i >= 0:
            q = json.loads(tail[i:].splitlines()[0]).get("queries")
            if isinstance(q, dict) and q:
                return {k: float(v) for k, v in q.items()}
        return None

    def _round_no(path: str) -> int:
        m = _re.search(r"BENCH_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    bench_records = sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json")), key=_round_no, reverse=True)
    for path in [os.path.join(_REPO, "bench_telemetry.json")] + bench_records:
        try:
            q = _q_or_none(path)
        except (OSError, ValueError, TypeError):  # TypeError: float(non-scalar)
            continue
        if q:
            return q
    return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # warm the JVM/codegen path and build the bronze compaction cache once
    from block_crawler_spark.sources.tables import load_all

    for df in load_all(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    registry["tpch_q6_revenue_forecast"][0](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-3 per query with a load-average guard: the harness box runs
    # co-tenant load and a single sample routinely swings ±50%; min-of-N
    # measures the engine, not the neighbors.  When the 1-min load average
    # is already high at sample time, one extra sample is taken — cheap
    # insurance against scoring a query entirely under neighbor noise.
    ncpu = os.cpu_count() or 1
    timings: dict[str, float] = {}
    query_loads: dict[str, list[float]] = {}
    query_samples: dict[str, list[float]] = {}

    def sample(name, fn, extra=0):
        best = timings.get(name)
        runs, i = 3 + extra if name not in timings else extra, 0
        while i < runs:
            load1 = os.getloadavg()[0]
            query_loads.setdefault(name, []).append(round(load1, 1))
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            query_samples.setdefault(name, []).append(round(dt, 3))
            best = dt if best is None or dt < best else best
            if i == runs - 1 and extra == 0 and runs == 3 and load1 > ncpu * 0.5:
                runs = 4  # noisy box: one extra sample
            i += 1
        timings[name] = round(best, 3)

    for name in HEADLINE:
        sample(name, registry[name][0])

    # outlier re-run (round-5, VERDICT r4 #7): co-tenant load alone produces
    # 1.5x swings between local runs, so any query >1.3x its last recorded
    # round gets two more samples before its number is published — a real
    # regression survives, a noise spike clears
    prev = _last_round_timings()
    reruns = []
    for name in HEADLINE:
        base = prev.get(name)
        if base and timings[name] > 1.3 * base:
            reruns.append(name)
            sample(name, registry[name][0], extra=2)

    total = round(sum(timings.values()), 3)
    # cold-vs-warm for the memoized families (VERDICT r13 task 3): warm is
    # what `total` already sums (best-of-N, memo-hit); cold is the family's
    # first member's FIRST sample — the one that executed the build.  The
    # extra is what a fresh session pays on top of the warm sum.
    memo_cold: dict[str, dict[str, float]] = {}
    for fam, members in MEMO_FAMILIES.items():
        first = next((m for m in members if query_samples.get(m)), None)
        if first is None:
            continue
        memo_cold[fam] = {
            "first_member_cold": query_samples[first][0],
            "first_member_warm": timings[first],
            "warm_family_sum": round(sum(timings[m] for m in members if m in timings), 3),
        }
    cold_extra = round(
        sum(v["first_member_cold"] - v["first_member_warm"] for v in memo_cold.values()), 3
    )
    # Telemetry goes to the sidecar file; stdout carries only two compact
    # lines.  History: the driver captures a bounded TAIL of stdout, and a
    # long final line truncates its own HEAD (BENCH_r05/r08 parsed:null);
    # r9-r14 printed the full telemetry dict (samples + per-query load
    # averages, ~10 KB by r14) on the second-to-last line, which grew past
    # the capture window and left PERF_r14 with per_query:{} and 47 phantom
    # drops (VERDICT r14 "What's wrong" #3 / task 2).  r15: `samples` and
    # `load_avg_per_query` live ONLY in bench_telemetry.json; the
    # second-to-last stdout line is a compact 2-dp {"queries":{name:sec}}
    # dict (~3 KB at 127 queries, no spaces) so the driver's tail keeps
    # per-query visibility, and the FINAL line stays a compact
    # constant-size object that survives any registry size.
    telemetry = {
        "queries": timings,
        "samples": query_samples,
        "memo_cold": memo_cold,
        "load_avg_per_query": query_loads,
        "rerun_outliers": reruns,
    }
    try:
        with open(os.path.join(_REPO, "bench_telemetry.json"), "w") as f:
            json.dump(telemetry, f)
    except OSError:
        pass
    print(
        json.dumps(
            {"queries": {k: round(v, 2) for k, v in timings.items()}},
            separators=(",", ":"),
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline query wall-clock (noop sink), best-of-3 per query, sum",
                "value": total,
                "unit": "sec",
                "sf": sf_dir,
                "n_queries": len(timings),
                # fresh-session sum = value + this (memoized families' first
                # builds at their first-sample cost; detail in telemetry)
                "memo_cold_extra_sec": cold_extra,
                "value_cold": round(total + cold_extra, 3),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
