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
# round so every family accumulates current driver-green rows: round 5
# fronted the LLM-pipeline families (text/pack/pipeline/media/embed — all
# CORRECTNESS_r05-green); round 6 fronts the relational tail
# (tpch/events/nft/tx + set_ops/agg/join) whose newest rows were r04.
_MODULES = (tpch, events_ops, nft_ops, tx_ops, text_ops, pack_ops, pipeline, media_ops, embed_ops)


def all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    merged: dict = {}
    for m in _MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(m.QUERIES)
    return merged
