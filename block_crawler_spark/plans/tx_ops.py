"""Transaction-level analytics, driver-oracle-checked.

The reference fetches blocks WITH transaction bodies in one call and fans
each ``EvmTransaction`` out as its own package
(``evm/transformers.py:48-87``; field set ``evm/types.py:37-55``) — the
tx-level questions a user asks of that stream are gas economics, contract
creations (``to_`` NULL), value flows, and input decoding.  The RPC side of
that path is ``sources.rpc.fetch_transactions`` (pytest-covered against the
fake chain); these registry queries exercise the same TRANSACTION_SCHEMA
shape and the hex machinery over driver testdata by deriving a
deterministic transactions bronze from ``lineitem`` with pure column
expressions (same technique as ``nft_ops.lineitem_logs``).

Mapping (lineitem → transactions bronze):
  block = l_orderkey, tx index = l_linenumber, nonce = l_linenumber
  sender = addr(1e9 + l_suppkey)
  to_    = NULL when l_linenumber = 1 (contract creation) else addr(l_partkey)
  gas    = l_quantity * 1000          gas_price = round(l_extendedprice*100)
  value_hex = hex(l_partkey*7 + l_suppkey)   (decoded back in the query)

Everything is built-in column expressions — single shuffle per aggregate,
whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hexint import hex_to_long, long_to_hex
from ..sources.tables import load_table

SENDER_BASE = 1_000_000_000


def lineitem_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → TRANSACTION_SCHEMA-shaped bronze, all column expressions."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_orderkey").alias("block_number"),
        F.col("l_linenumber").cast("int").alias("transaction_index"),
        long_to_hex(F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("hash"),
        long_to_hex(F.lit(SENDER_BASE) + F.col("l_suppkey"), 40).alias("from_"),
        F.when(F.col("l_linenumber") == 1, F.lit(None).cast("string"))
        .otherwise(long_to_hex(F.col("l_partkey"), 40))
        .alias("to_"),
        (F.col("l_quantity") * 1000).cast("long").alias("gas"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("gas_price"),
        F.col("l_linenumber").cast("long").alias("nonce"),
        long_to_hex(F.col("l_partkey") * 7 + F.col("l_suppkey")).alias("value_hex"),
        F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(F.col("l_partkey"))), 8, "0")).alias("input"),
    )


def sender_gas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sender gas economics over the tx bronze: tx counts, creation
    counts, gas totals, fee totals (gas × gas_price), and value totals
    decoded back out of the canonical hex representation — one hash
    aggregate, map-side partials, no shuffle beyond the groupBy."""
    tx = lineitem_transactions(spark, sf_dir)
    return (
        tx.groupBy("from_")
        .agg(
            F.count("*").alias("n_tx"),
            F.count(F.when(F.col("to_").isNull(), 1)).alias("n_creations"),
            F.sum("gas").alias("total_gas"),
            F.sum(F.col("gas") * F.col("gas_price")).alias("total_fee"),
            F.sum(hex_to_long(F.col("value_hex"))).alias("total_value"),
            F.max("nonce").alias("max_nonce"),
        )
        # no presentation orderBy: the per-sender key domain is unbounded,
        # so a final sort is a gratuitous corpus-wide range shuffle — the
        # driver's oracle compare is order-insensitive (round-8 scanner)
    )


SENDER_GAS_STATS_SQL = """
WITH tx AS (
  SELECT '0x' || lpad(lower(hex(1000000000 + l_suppkey)), 40, '0') AS from_,
         CASE WHEN l_linenumber = 1 THEN NULL ELSE l_partkey END AS to_key,
         CAST(l_quantity * 1000 AS BIGINT) AS gas,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS gas_price,
         CAST(l_linenumber AS BIGINT) AS nonce,
         l_partkey * 7 + l_suppkey AS value
  FROM lineitem
)
SELECT from_,
       COUNT(*) AS n_tx,
       COUNT(*) FILTER (WHERE to_key IS NULL) AS n_creations,
       CAST(SUM(gas) AS BIGINT) AS total_gas,
       CAST(SUM(gas * gas_price) AS BIGINT) AS total_fee,
       CAST(SUM(value) AS BIGINT) AS total_value,
       MAX(nonce) AS max_nonce
FROM tx GROUP BY from_ ORDER BY from_
"""


def creations_by_block_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 at tx level: contract creations (NULL ``to_``) per 1000-block
    bucket with distinct-deployer counts.  The NULL filter pushes to the
    scan; distinct-count is a two-phase hash aggregate."""
    tx = lineitem_transactions(spark, sf_dir)
    return (
        tx.filter(F.col("to_").isNull())
        .groupBy((F.col("block_number") / 1000).cast("long").alias("block_bucket"))
        .agg(
            F.count("*").alias("n_creations"),
            F.countDistinct("from_").alias("n_deployers"),
            F.sum("gas").alias("creation_gas"),
        )
        # no presentation orderBy (same rationale as sender_gas_stats)
    )


CREATIONS_BY_BLOCK_BUCKET_SQL = """
SELECT CAST(floor(l_orderkey / 1000) AS BIGINT) AS block_bucket,
       COUNT(*) AS n_creations,
       COUNT(DISTINCT '0x' || lpad(lower(hex(1000000000 + l_suppkey)), 40, '0')) AS n_deployers,
       CAST(SUM(CAST(l_quantity * 1000 AS BIGINT)) AS BIGINT) AS creation_gas
FROM lineitem
WHERE l_linenumber = 1
GROUP BY 1 ORDER BY block_bucket
"""


QUERIES = {
    "tx_sender_gas_stats": (sender_gas_stats, SENDER_GAS_STATS_SQL),
    "tx_creations_by_block_bucket": (creations_by_block_bucket, CREATIONS_BY_BLOCK_BUCKET_SQL),
}
