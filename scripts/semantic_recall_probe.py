"""Pair-RECALL probe for the semantic dedup family across the SEM_K_MAX knee.

VERDICT r10 task 1: the SEM_K_MAX cap closed the COST side of the semantic
family's scale story (assignment O(N·4096), pair budget ≤ N·CAP/2 under any
skew), but the price of the two pruning stages was asserted, never measured:

* CELL-boundary loss — a true near-dup pair whose members land in different
  Lloyd cells is never generated (the SemDeDup trade, present at every N);
* SHARD-boundary loss — once a cell outgrows ``SEM_CELL_CAP`` the shard
  split discards true pairs that straddle shards (only past the knee,
  N ≳ SEM_K_MAX·TARGET ≈ 102k vectors, where the cap binds and cells grow
  linearly).  Measuring the r8–r10 ``vid % n_shards`` key at exactly the
  predicted 1 − 1/n_shards loss is what motivated the r11 switch to the
  distance-band key; the ``planted-tight`` rows give the band-vs-modulo
  head-to-head on true near-dups.

This probe measures both, separately, against the BRUTE-FORCE truth (every
pair with integer sqdist ≤ SEM_SQDIST_MAX — exactly the filter the family
applies after candidate generation, so recall isolates candidate pruning):

    recall      = retained / truth          (what dedup_semantic_cells keeps)
    cell_loss   = (truth − same_cell) / truth
    shard_loss  = (same_cell − retained) / truth

``retained`` is BY CONSTRUCTION the truth pairs whose members share both
cell and shard, so the split is exact, not sampled.

The graded corpora stop at 2 000 vectors — three orders below the knee — so
the knee is probed by SCALING THE KNOBS DOWN instead of the data up: the
``knee`` rows force k to ``N // 250`` (what `_sem_k` yields when the cap
binds at TARGET·CAP/2 ≫ N) so mean cell population ≈ 250 > SEM_CELL_CAP and
``n_shards = 2`` actually fires — the same regime a 10⁶-vector corpus hits
with the committed constants.  The ``harsh`` row drops the cap to 25 on top
(n_shards ≈ 10), the deep-past-the-knee regime (~10⁸ vectors).

Brute-force truth is a deliberate all-pairs join — fine for a ≤2k-vector
probe, never a registry pattern.

Usage:  PYTHONPATH=/root/repo python scripts/semantic_recall_probe.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from block_crawler_spark.operators.ann import int_sqdist, kmeans_lloyd_fixed, micro_fixed  # noqa: E402
from block_crawler_spark.plans.embed_ops import (  # noqa: E402
    SEM_CELL_CAP,
    SEM_CELLS_ITERS,
    SEM_SQDIST_MAX,
    _sem_k,
    _semantic_pairs,
)
from block_crawler_spark.session import get_spark  # noqa: E402
from block_crawler_spark.sources.tables import load_table  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _recall_metrics(spark, vecs, assign, cell_cap: int) -> dict:
    """The shared measurement body: brute-force truth vs the committed
    pair stage on an arbitrary (vid, v) corpus and (vid, cid, dist)
    assignment — used by the graded-corpus probe and the clustered
    synthetic fixture so the metrics can't drift."""
    # brute-force truth: every within-threshold pair, no pruning.  TIGHT
    # pairs (sqdist ≤ MAX/4, cosine ≳ 0.86 at unit norm) are the actual
    # near-dup regime — reported separately because the locality of the
    # r11 distance-band shard key is distance-correlated: the tighter the
    # pair, the narrower its centroid-distance spread (triangle
    # inequality), the likelier it shares a band.
    tight = SEM_SQDIST_MAX // 4
    a = vecs.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    b = vecs.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sqdist", int_sqdist(F.col("va"), F.col("vb")))
        .filter(F.col("sqdist") <= SEM_SQDIST_MAX)
        .select("id_a", "id_b", "sqdist")
    )
    truth = spark.createDataFrame(truth.collect(), truth.schema)  # reused 3×, tiny
    t_pairs = int(truth.count())
    t_tight = int(truth.filter(F.col("sqdist") <= tight).count())

    aa = assign.select(F.col("vid").alias("id_a"), F.col("cid").alias("cid_a"))
    ab = assign.select(F.col("vid").alias("id_b"), F.col("cid").alias("cid_b"))
    # a multi-probe pair can share two cells: count pairs, not meetings
    same_cell = int(
        truth.join(aa, "id_a").join(ab, "id_b").filter(F.col("cid_a") == F.col("cid_b"))
        .select("id_a", "id_b").distinct().count()
    )
    kept_rows = {
        (r["id_a"], r["id_b"], r["sqdist"])
        for r in _semantic_pairs(assign, vecs, cell_cap=cell_cap)
        .select("id_a", "id_b", "sqdist")
        .collect()
    }
    retained = len(kept_rows)
    r_tight = sum(1 for _, _, sq in kept_rows if sq <= tight)

    cells = assign.groupBy("cid").agg(F.count("*").alias("pop"))
    shard_stats = cells.agg(
        F.max(F.expr(f"(pop + {cell_cap - 1}) DIV {cell_cap}")).alias("max_shards"),
        F.sum((F.expr(f"(pop + {cell_cap - 1}) DIV {cell_cap}") > 1).cast("long")).alias(
            "sharded_cells"
        ),
        F.count("*").alias("cells"),
        F.max("pop").alias("max_pop"),
    ).head()

    r3 = lambda x: round(x, 3)  # noqa: E731
    return {
        "cells": shard_stats["cells"],
        "max_pop": shard_stats["max_pop"],
        "max_shards": int(shard_stats["max_shards"]),
        "sharded_cells": int(shard_stats["sharded_cells"]),
        "truth_pairs": t_pairs,
        "same_cell_pairs": same_cell,
        "retained_pairs": retained,
        "recall": r3(retained / t_pairs) if t_pairs else None,
        "cell_loss": r3((t_pairs - same_cell) / t_pairs) if t_pairs else None,
        "shard_loss": r3((same_cell - retained) / t_pairs) if t_pairs else None,
        "tight_pairs": t_tight,
        "tight_recall": r3(r_tight / t_tight) if t_tight else None,
    }


def probe(spark, sf: str, regime: str, k: int, cell_cap: int, probes: int = 1) -> dict:
    emb = load_table(spark, sf, "embeddings")
    vecs = emb.select(F.col("vec_id").alias("vid"), micro_fixed(F.col("embedding")).alias("v"))
    n = vecs.count()
    if probes == 2:
        from block_crawler_spark.plans.embed_ops import _top2_assign

        assign = _top2_assign(emb, sf, k=k, iters=SEM_CELLS_ITERS)
    else:
        assign, _ = kmeans_lloyd_fixed(emb, k=k, iters=SEM_CELLS_ITERS)
    base = {"sf": sf.rsplit("/", 1)[-1], "regime": regime, "n": n, "k": k, "cell_cap": cell_cap}
    return base | _recall_metrics(spark, vecs, assign, cell_cap)


CLUSTER_DIM = 64


def probe_clustered(
    spark, regime: str, n: int, n_clusters: int, jitter_milli: int, k: int,
    cell_cap: int, probes: int = 1,
) -> dict:
    """Round 12 (VERDICT r11 optional b): the same measurement on a corpus
    WITH cluster structure — the honest caveat of the graded rows is that
    the synthetic embeddings are isotropic (no density modes), the
    single-assignment worst case.  Here every vector is a deterministic
    md5-derived cluster center (vid % n_clusters) plus a small md5 jitter
    (±jitter_milli/1000 per dim), so near-dup truth is exactly the
    within-cluster pair set (cross-cluster distances are ~40× the
    threshold) and Lloyd cells have real structure to find.  No RNG —
    both the centers and the jitter are content-hash functions of the
    ids, reproducible anywhere.  Round 13: the generator is
    ``operators.ann.clustered_embeddings`` — ONE fixture definition shared
    with scripts/ann_recall.py's --clustered grid."""
    from block_crawler_spark.operators.ann import centroid_assign_top2, clustered_embeddings

    emb = clustered_embeddings(spark, n, n_clusters, jitter_milli, CLUSTER_DIM)
    vecs = emb.select(F.col("vec_id").alias("vid"), micro_fixed(F.col("embedding")).alias("v"))
    assign, cents = kmeans_lloyd_fixed(emb, k=k, iters=SEM_CELLS_ITERS)
    if probes == 2:
        assign = centroid_assign_top2(vecs, cents)
    base = {
        "sf": f"clustered(n={n},c={n_clusters},jitter={jitter_milli}m)",
        "regime": regime,
        "n": n,
        "k": k,
        "cell_cap": cell_cap,
    }
    return base | _recall_metrics(spark, vecs, assign, cell_cap)


def probe_planted(spark, sf: str, k: int, cell_cap: int, probes: int = 1) -> dict:
    """The TIGHT-pair regime the graded corpus lacks (it has zero pairs
    under cos ≈ 0.86 — memory: the synthetic embeddings plant no near
    dups): append one jittered copy of every vector (+500 micro on dim 0,
    sqdist 2.5e5 ≪ tight) under a HASH-SCRAMBLED id (a multiplier
    bijection mod the Mersenne prime 2^31−1 — a structured offset, or an
    odd multiplier mod a power of two, which preserves the LOW BIT, would
    make the modulo counterfactual systematically biased), force the sharded regime, and measure how many
    of the N known-true near-dup pairs each shard key retains:

      band_tight_recall   — what _semantic_pairs (r11 distance-band key)
                            actually keeps, measured from its output;
      modulo_tight_recall — the r8–r10 ``vid % n_shards`` counterfactual,
                            replayed on the SAME assignment.

    ``probes=2`` (round 12 — VERDICT r11 task 2) runs the head-to-head on
    the TOP-2 assignment: multi-probe doubles memberships, inflating cell
    populations (n_shards 2→3 at the knee), so whether the band key's
    0.96+ tight retention survives mp2's fatter cells decides the
    at-scale knob order (band key free → mp2 ×2 → raise CAP).  A planted
    pair is retained if it survives in ANY shared cell; the modulo
    counterfactual gets the same any-shared-cell credit.
    """
    emb = load_table(spark, sf, "embeddings")
    plant = emb.select(
        (F.lit(10**9) + F.pmod(F.col("vec_id") * F.lit(2654435761) + F.lit(911), F.lit(2147483647))).alias("vec_id"),
        F.expr("transform(embedding, (x, i) -> CASE WHEN i = 0 THEN x + CAST(0.0005 AS FLOAT) ELSE x END)").alias(
            "embedding"
        ),
        "label",
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(plant)
    vecs = corpus.select(F.col("vec_id").alias("vid"), micro_fixed(F.col("embedding")).alias("v"))
    n = vecs.count()
    assign, cents = kmeans_lloyd_fixed(corpus, k=k, iters=SEM_CELLS_ITERS)
    if probes == 2:
        from block_crawler_spark.operators.ann import centroid_assign_top2

        assign = centroid_assign_top2(vecs, cents)
    tight = SEM_SQDIST_MAX // 4

    kept_tight = {
        (r["id_a"], r["id_b"])
        for r in _semantic_pairs(assign, vecs, cell_cap=cell_cap)
        .filter(F.col("sqdist") <= tight)
        .select("id_a", "id_b")
        .collect()
    }
    arows = assign.collect()
    cells_of: dict = {}  # vid -> set of probe cells (singleton at probes=1)
    pops: dict = {}  # cid -> MEMBERSHIP population (what the band key bands)
    for r in arows:
        cells_of.setdefault(r["vid"], set()).add(r["cid"])
        pops[r["cid"]] = pops.get(r["cid"], 0) + 1
    planted_pairs = [
        tuple(sorted((v, 10**9 + (v * 2654435761 + 911) % 2147483647)))
        for v in (r["vec_id"] for r in emb.select("vec_id").collect())
    ]
    t_tight = len(planted_pairs)
    band_keep = sum(1 for p in planted_pairs if p in kept_tight)
    mod_keep = 0
    for x, y in planted_pairs:
        # any-shared-cell credit (trivial at probes=1): the counterfactual
        # keeps a pair if vid-modulo agrees in AT LEAST one shared cell
        for c in cells_of[x] & cells_of[y]:
            ns = -(-pops[c] // cell_cap)
            if x % ns == y % ns:
                mod_keep += 1
                break
    same_cell = sum(1 for x, y in planted_pairs if cells_of[x] & cells_of[y])
    r3 = lambda x: round(x, 3)  # noqa: E731
    return {
        "sf": sf.rsplit("/", 1)[-1],
        "regime": "planted-tight" + ("-mp2" if probes == 2 else ""),
        "n": n,
        "k": k,
        "cell_cap": cell_cap,
        "max_shards": max(-(-p // cell_cap) for p in pops.values()),
        "tight_pairs": t_tight,
        "same_cell_tight": same_cell,
        "band_tight_recall": r3(band_keep / t_tight),
        "modulo_tight_recall": r3(mod_keep / t_tight),
    }


def main() -> int:
    spark = get_spark("semantic-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for sf in SFS:
        n = load_table(spark, sf, "embeddings").count()
        rows.append(probe(spark, sf, "derived", _sem_k(n), SEM_CELL_CAP))
    # knee emulation (cap binds, cells ≈ TARGET·CAP/K ≈ 250, n_shards = 2)
    n = load_table(spark, SFS[-1], "embeddings").count()
    rows.append(probe(spark, SFS[-1], "knee", max(8, n // 250), SEM_CELL_CAP))
    # deep past the knee: n_shards ≈ 10
    rows.append(probe(spark, SFS[-1], "harsh", max(8, n // 250), 25))
    # multi-probe p=2: how much of the DOMINANT cell-boundary loss does the
    # second-nearest cell recover, at committed constants and at the knee?
    rows.append(probe(spark, SFS[-1], "derived-mp2", _sem_k(n), SEM_CELL_CAP, probes=2))
    rows.append(probe(spark, SFS[-1], "knee-mp2", max(8, n // 250), SEM_CELL_CAP, probes=2))
    # tight-pair (true near-dup) retention, band key vs modulo
    # counterfactual — knee and deep-past-the-knee
    rows.append(probe_planted(spark, SFS[-1], max(8, (2 * n) // 250), 200))
    rows.append(probe_planted(spark, SFS[-1], max(8, (2 * n) // 250), 25))
    # round 12: a corpus WITH cluster structure (the graded rows' honest
    # isotropic-worst-case caveat, answered): 32 deterministic clusters,
    # jitter sized so within-cluster pairs are near-dups
    rows.append(probe_clustered(spark, "clustered", 2000, 32, 70, _sem_k(2000), SEM_CELL_CAP))
    rows.append(
        probe_clustered(spark, "clustered-mp2", 2000, 32, 70, _sem_k(2000), SEM_CELL_CAP, probes=2)
    )
    # round 12: the same head-to-head under MULTI-PROBE (p=2) — doubled
    # memberships inflate the banded populations; decides the at-scale
    # knob order for the mp2-composed curation consumers
    rows.append(probe_planted(spark, SFS[-1], max(8, (2 * n) // 250), 200, probes=2))
    rows.append(probe_planted(spark, SFS[-1], max(8, (2 * n) // 250), 25, probes=2))
    for r in rows:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
