"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (NFT decode→fold pipeline) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 + the
beyond-parity training-data operators, as (spark, sf_dir) callables.
``oracle_sql()`` — exact DuckDB equivalents for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from block_crawler_spark.plans.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic ERC-721 log stream derived from lineitem →
    JVM-side ABI decode → A1 token-state fold (SURVEY §2.4-2.5)."""
    from block_crawler_spark.plans.nft_ops import token_state_query

    return token_state_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in all_queries().items() if sql is not None}
