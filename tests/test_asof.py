"""asof_join unit tests: at-or-before semantics, NULL when nothing
precedes, and the round-2 deterministic duplicate tiebreak (ADVICE r1,
asof.py:58)."""

from __future__ import annotations

from block_crawler_spark.operators.asof import asof_join


def _left(spark):
    return spark.createDataFrame(
        [(1, 10), (1, 20), (2, 15)], "k int, t int"
    )


def test_at_or_before_and_null(spark):
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 20, "b"), (2, 16, "late")], "k int, t int, payload string"
    )
    out = {
        (r["k"], r["t"]): r["asof_payload"]
        for r in asof_join(_left(spark), right, on=["k"], order_col="t", payload_cols=["payload"]).collect()
    }
    assert out[(1, 10)] == "a"  # latest at-or-before 10
    assert out[(1, 20)] == "b"  # equality counts ("at-or-before")
    assert out[(2, 15)] is None  # right row is later → no match


def test_duplicate_right_rows_tiebreak_deterministic(spark):
    """Several right rows at the SAME (key, order) must resolve identically
    on every run/partitioning — the xxhash64 payload tiebreak (ADVICE r1)
    makes `last()` independent of shuffle arrival order."""
    dup_payloads = [f"p{i}" for i in range(8)]
    right_rows = [(1, 10, p) for p in dup_payloads]
    results = set()
    for n_parts in (1, 3, 7):
        right = spark.createDataFrame(right_rows, "k int, t int, payload string").repartition(n_parts)
        left = spark.createDataFrame([(1, 10), (1, 99)], "k int, t int")
        out = asof_join(left, right, on=["k"], order_col="t", payload_cols=["payload"]).collect()
        results.add(tuple(sorted((r["k"], r["t"], r["asof_payload"]) for r in out)))
    assert len(results) == 1, f"nondeterministic across partitionings: {results}"
    # both left rows see the same winning duplicate
    (rows,) = results
    winners = {p for (_k, _t, p) in rows}
    assert len(winners) == 1 and winners.pop() in dup_payloads
