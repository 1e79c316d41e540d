"""Connected-components dedup assignment (transitive closure) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from block_crawler_spark.operators.dedup import (
    dedup_assignments,
    dedup_assignments_cc,
    dedup_components,
)


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["doc_id"])


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["id_a", "id_b"])


def test_chain_collapses_to_one_component(spark):
    # 1-2, 2-3, 3-4: multi-hop chain needs >1 propagation round
    comp = {r["id"]: r["comp"] for r in dedup_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)])).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1}


def test_star_where_greedy_over_drops(spark):
    """Pairs (1,2),(1,3): closure and greedy agree here — but with pairs
    (2,3),(2,4) plus doc 1 unrelated, the cluster keeps its true minimum
    (2), and 1 stays independent."""
    docs = _docs(spark, [1, 2, 3, 4])
    pairs = _pairs(spark, [(2, 3), (2, 4)])
    got = {r["doc_id"]: (r["keep_id"], r["is_duplicate"]) for r in dedup_assignments_cc(docs, pairs).collect()}
    assert got == {1: (1, False), 2: (2, False), 3: (2, True), 4: (2, True)}


def test_transitive_keep_id_on_partial_pair_enumeration(spark):
    """Edges (11,12),(12,13): 13 is a near-dup of 11 only transitively —
    LSH never emitted (11,13) — yet closure assigns it keep_id 11.  The
    greedy rule can only say drop/keep; closure additionally names the
    cluster survivor for every member."""
    docs = _docs(spark, [11, 12, 13])
    pairs = _pairs(spark, [(11, 12), (12, 13)])
    cc = {r["doc_id"]: r["keep_id"] for r in dedup_assignments_cc(docs, pairs).collect()}
    assert cc == {11: 11, 12: 11, 13: 11}
    # greedy agrees on is_duplicate for this shape (sanity cross-check)
    greedy = {r["doc_id"]: r["is_duplicate"] for r in dedup_assignments(docs, pairs).collect()}
    assert greedy == {11: False, 12: True, 13: True}


def test_no_pairs_everything_kept(spark):
    docs = _docs(spark, [1, 2])
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = {r["doc_id"]: (r["keep_id"], r["is_duplicate"]) for r in dedup_assignments_cc(docs, empty).collect()}
    assert got == {1: (1, False), 2: (2, False)}


def test_minhash_stage_path_materializes_and_matches_cache(spark, tmp_path):
    """The 100 TB materialization path: stage_path writes the shingle table
    to parquet and reads it back; results must equal the cache() path and
    the stage files must actually exist on disk."""
    import os

    from block_crawler_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated text about spark shuffles"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    stage = str(tmp_path / "shingle_stage")
    via_stage = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(docs, threshold=0.3, stage_path=stage).collect()
    }
    via_cache = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(docs, threshold=0.3).collect()
    }
    assert via_stage == via_cache and via_stage, "stage path must not change results"
    assert any(n.endswith(".parquet") for n in os.listdir(stage)), "stage table written"


def test_simhash_band_pairs_pigeonhole_and_hamming(spark):
    """Banded SimHash pairs: any pair within Hamming < bands shares a band
    (pigeonhole → found); verified distance is exact; pairs with a shared
    band but distance > max_hamming are filtered; fully distinct sigs with
    no shared band never surface."""
    from block_crawler_spark.operators.dedup import simhash_band_pairs

    base = 0b1010_1100_0011_0101_1111_0000_1100_1010  # arbitrary 32-bit sig
    sigs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                     # identical → hamming 0
            (3, base ^ 0b11),              # 2 low bits differ (one band) → hamming 2
            (4, base ^ 0x11111111),        # 1 bit per nibble: every band differs, hamming 8
            (5, base ^ 0x000000FF),        # last band differs fully; shares 3 bands, hamming 8 → filtered
        ],
        "doc_id long, simhash long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_band_pairs(sigs, bits=32, bands=4, max_hamming=3).collect()
    }
    assert got[(1, 2)] == 0 and got[(2, 3)] == 2 and got[(1, 3)] == 2
    assert not any(4 in p for p in got), "no shared band → never a candidate"
    assert not any(5 in p for p in got), "candidate but hamming 8 > 3 → verified away"


def test_pii_primitives(spark):
    """Email/URL counts and redaction: spans counted, replaced with typed
    placeholders; PII-free text passes through (case-normalized) unchanged."""
    from pyspark.sql import functions as F

    from block_crawler_spark.functions.text import pii_email_count, pii_url_count, redact_pii

    rows = [
        (1, "Mail A.B+c@Ex.org or x@y.io, docs at https://d.io/p?q=1"),
        (2, "no personal data here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        pii_email_count(F.col("text")).alias("e"),
        pii_url_count(F.col("text")).alias("u"),
        redact_pii(F.col("text")).alias("red"),
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert (got[1]["e"], got[1]["u"]) == (2, 1)
    assert got[1]["red"] == "mail <email> or <email>, docs at <url>"
    assert (got[2]["e"], got[2]["u"]) == (0, 0)
    assert got[2]["red"] == "no personal data here"
