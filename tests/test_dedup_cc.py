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
