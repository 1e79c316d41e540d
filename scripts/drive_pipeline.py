"""Drive the engine as a user would: public package imports only."""
from pyspark.sql import functions as F
from block_crawler_spark.session import get_spark
from block_crawler_spark.schemas import LOG_SCHEMA
from block_crawler_spark.sources.chainfix import standard_scenario
from block_crawler_spark.operators.decode import decode_token_transfers, decode_uri_updates
from block_crawler_spark.operators.folds import fold_token_state, fold_owners

spark = get_spark("drive1")
fb = standard_scenario()
logs = spark.createDataFrame(fb.rows, LOG_SCHEMA).cache()
print("logs:", logs.count())

transfers = decode_token_transfers(logs).withColumn("blockchain", F.lit("testnet")).cache()
uris = decode_uri_updates(logs)
print("decoded transfers:", transfers.count())
transfers.groupBy("specification", "transaction_type").count().orderBy("specification", "transaction_type").show()

tokens = fold_token_state(transfers, uris)
print("token state:")
tokens.orderBy("collection_id", "token_id_hex").show(12, truncate=45)

owners = fold_owners(transfers)
print("owners:")
owners.orderBy("collection_id", "token_id_hex", "account").show(10, truncate=45)

# probe: empty logs table → should produce empty outputs, not crash
empty = spark.createDataFrame([], LOG_SCHEMA)
et = decode_token_transfers(empty).withColumn("blockchain", F.lit("t"))
print("empty-input tokens rows:", fold_token_state(et, decode_uri_updates(empty)).count())

# probe: garbage topics (wrong lengths, non-hex data) → decoder must skip/not crash
garbage = spark.createDataFrame([
    {"block_number": 1, "transaction_index": 0, "log_index": 0, "transaction_hash": "0x00",
     "address": "0x" + "c"*40, "topics": [], "data": "0x", "removed": False},
    {"block_number": 1, "transaction_index": 0, "log_index": 1, "transaction_hash": "0x00",
     "address": "0x" + "c"*40, "topics": ["0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"], "data": None, "removed": False},
], LOG_SCHEMA)
print("garbage decoded rows:", decode_token_transfers(garbage).count())
spark.stop()
