"""Block-time cache (reference S9, ``evm/util.py:6-24``).

The reference persists a (block_id, timestamp) CSV so repeated runs skip
re-fetching block headers just for timestamps.  Spark-first this is a small
dimension table: load from CSV (or build from a blocks DataFrame), persist,
and broadcast-join onto any block-keyed fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = "block_id long, timestamp long"


def load_block_times(spark: SparkSession, csv_path: str) -> DataFrame:
    return spark.read.schema(_SCHEMA).csv(csv_path)


def save_block_times(df: DataFrame, csv_path: str) -> None:
    """Single-task CSV write by design: it mirrors the reference's one cache
    file (``evm/util.py:6-24``) and the table is two longs per block —
    ~16 MB per million blocks, so even a full mainnet history (~20M blocks,
    ~320 MB) coalesces safely.  If a chain ever outgrows that, drop the
    ``coalesce(1)`` and read the directory back as sharded CSV."""
    df.select(F.col("block_id"), F.col("timestamp")).coalesce(1).write.mode("overwrite").csv(csv_path)


def block_times_from_blocks(blocks: DataFrame) -> DataFrame:
    return blocks.select(F.col("number").alias("block_id"), F.col("timestamp"))


def with_block_times(df: DataFrame, times: DataFrame, block_col: str = "block_number") -> DataFrame:
    """Broadcast-join timestamps onto a block-keyed fact table."""
    t = F.broadcast(times.select(F.col("block_id").alias(block_col), F.col("timestamp")))
    return df.join(t, block_col, "left")
