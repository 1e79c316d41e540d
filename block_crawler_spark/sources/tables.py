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


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Surface ``events.ts`` as a timestamp regardless of how the parquet
    writer encoded it.

    Driver-generated testdata has shipped ``ts`` both as TIMESTAMP(NANOS)
    (which Spark 4 only reads via the nanos-as-long legacy conf, i.e. as a
    raw ``bigint`` of epoch-nanos) and as plain ``timestamp[us]``.  Inspect
    the *loaded* dtype instead of assuming either: only the raw-long case
    needs the ``timestamp_micros(ts div 1000)`` conversion; a real timestamp
    column passes through untouched.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dtype = df.schema["ts"].dataType
    if isinstance(dtype, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dtype, TimestampNTZType):
        # parquet micros without isAdjustedToUTC loads as TIMESTAMP_NTZ;
        # downstream plans (and the DuckDB oracle) treat the wall-clock as
        # UTC instants, so surface the session-tz TIMESTAMP type every other
        # code path produces (session tz is pinned to UTC in session.py).
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _read_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Tolerate TIMESTAMP(NANOS) encodings: the conf makes Spark read a
        # nanos column as bigint instead of refusing the file outright; it is
        # a no-op for micros/millis encodings.  The dtype check below decides
        # whether any conversion is actually needed.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _normalize_events_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
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
    # A cache entry older than its source is stale — the driver regenerates
    # the testdata between rounds (possibly with a different schema), so a
    # compaction from a previous generation must be rebuilt, not trusted.
    stale = os.path.exists(success) and os.path.getmtime(success) < os.path.getmtime(src)
    if stale or not os.path.exists(success):
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

