"""Unified query registry: every driver-checkable query in one dict.

Keys are stable operator names (SURVEY §2 families + beyond-parity ops);
values are (spark_fn, duckdb_sql | None).  ``None`` SQL ⇒ the driver records
a weaker rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import embed_ops, events_ops, media_ops, nft_ops, pack_ops, pipeline, text_ops, tpch, tx_ops

# Ordering matters to external samplers that take a prefix of the merged
# dict (Python dicts preserve insertion order).  The prefix is rotated per
# round so every family accumulates current driver-green rows — and any
# query ADDED in a round must sit inside the prefix that round (ADVICE r6:
# new code gets verified the round it lands, not rounds later).  Round 5
# fronted the LLM-pipeline families; round 6 fronted the relational tail
# (all r6-green); round 7 fronts embed_ops (the two r6-added ANN queries'
# first driver rows) + text/pack (r7-added BPE queries, r6-changed dedup
# family) + pipeline/media, with the r6-certified relational modules last.
_MODULES = (embed_ops, text_ops, pack_ops, pipeline, media_ops, tpch, events_ops, nft_ops, tx_ops)


def all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    merged: dict = {}
    for m in _MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(m.QUERIES)
    return merged
