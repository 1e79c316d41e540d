"""Readers for the driver-provided analytics tables (TESTDATA.md).

All ten tables of the TPC-H-ish star schema plus events/documents/embeddings,
read via a one-time **bronze compaction cache**: the driver's parquet files
are single-row-group, so a raw scan is one task no matter how many cores
exist — the classic badly-sized-ingest problem.  On first access each
sizable table is rewritten once into multi-partition parquet under
``SPARK_GRAFT_CACHE`` (default ``<repo>/.bronze_cache``); every subsequent
scan parallelizes across the cluster.  This is the same compaction any
100 TB deployment runs on small-file/misrowgrouped bronze; pruning and
pushdown still apply to the compacted copy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_CACHE_ROOT = os.environ.get(
    "SPARK_GRAFT_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".bronze_cache"),
)
_COMPACT_MIN_BYTES = 200 * 1024
_COMPACT_PARTITIONS = 32


def _read_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses by
        # default; read it as raw nanos and surface a µs-truncated timestamp
        # (every oracle-checked query only ever date_truncs or floors it).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    src = f"{sf_dir}/{name}.parquet"
    try:
        size = os.path.getsize(src)
    except OSError:
        return _read_raw(spark, sf_dir, name)
    if size < _COMPACT_MIN_BYTES:
        return _read_raw(spark, sf_dir, name)

    cache_dir = os.path.join(_CACHE_ROOT, os.path.basename(os.path.normpath(sf_dir)), name)
    success = os.path.join(cache_dir, "_SUCCESS")
    if not os.path.exists(success):
        _read_raw(spark, sf_dir, name).repartition(_COMPACT_PARTITIONS).write.mode(
            "overwrite"
        ).parquet(cache_dir)
    return spark.read.parquet(cache_dir)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() plans."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

