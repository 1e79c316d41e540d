"""Fixed StructType schemas for the bronze chain tables and silver entity tables.

Bronze mirrors the reference's raw-chain dataclasses (``evm/types.py:37-124``);
silver mirrors the five durable DynamoDB tables (``nft/data/models.py:14-86``,
item layouts ``nft/data_services/dynamodb.py:618-668``) re-expressed as
partitioned columnar tables: DynamoDB's composite string HASH keys
("{blockchain}::{collection_id}") become ordinary multi-column keys, with
``blockchain`` as the partition column.

Hex-value policy per ``functions.hexint``: canonical zero-padded lowercase hex
strings for uint256-bearing columns, parallel Decimal/long columns where
magnitude is bounded.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .functions.keccak import event_topic, function_selector

# ---------------------------------------------------------------------------
# ABI constant catalog (public ERC-721 / ERC-1155 / ERC-165 signatures; the
# reference keeps the same catalog at evm/types.py:144-313). Recomputed here
# from signatures with our own keccak, not copied.
# ---------------------------------------------------------------------------

ERC721_TRANSFER_TOPIC = event_topic("Transfer(address,address,uint256)")
ERC1155_TRANSFER_SINGLE_TOPIC = event_topic("TransferSingle(address,address,address,uint256,uint256)")
ERC1155_TRANSFER_BATCH_TOPIC = event_topic("TransferBatch(address,address,address,uint256[],uint256[])")
ERC1155_URI_TOPIC = event_topic("URI(string,uint256)")

SELECTOR_SUPPORTS_INTERFACE = function_selector("supportsInterface(bytes4)")
SELECTOR_NAME = function_selector("name()")
SELECTOR_SYMBOL = function_selector("symbol()")
SELECTOR_TOTAL_SUPPLY = function_selector("totalSupply()")
SELECTOR_OWNER = function_selector("owner()")
SELECTOR_TOKEN_URI = function_selector("tokenURI(uint256)")
SELECTOR_URI = function_selector("uri(uint256)")
SELECTOR_OWNER_OF = function_selector("ownerOf(uint256)")
SELECTOR_TOKEN_BY_INDEX = function_selector("tokenByIndex(uint256)")

# ERC-165 interface ids (XOR of member selectors — public constants)
INTERFACE_ID_ERC721 = "0x80ac58cd"
INTERFACE_ID_ERC721_METADATA = "0x5b5e139f"
INTERFACE_ID_ERC721_ENUMERABLE = "0x780e9d63"
INTERFACE_ID_ERC1155 = "0xd9b67a26"
INTERFACE_ID_ERC1155_METADATA_URI = "0x0e89341c"

SPEC_ERC721 = "ERC-721"
SPEC_ERC1155 = "ERC-1155"

TX_MINT = "mint"
TX_BURN = "burn"
TX_TRANSFER = "transfer"

# ---------------------------------------------------------------------------
# Bronze (raw chain) schemas — reference evm/types.py:37-124
# ---------------------------------------------------------------------------

BLOCK_SCHEMA = StructType(
    [
        StructField("number", LongType(), False),
        StructField("hash", StringType(), False),
        StructField("parent_hash", StringType(), True),
        StructField("miner", StringType(), True),
        StructField("timestamp", LongType(), False),  # epoch seconds
        StructField("gas_limit", LongType(), True),
        StructField("gas_used", LongType(), True),
        StructField("size", LongType(), True),
        StructField("difficulty", LongType(), True),
        StructField("transaction_hashes", ArrayType(StringType()), True),
    ]
)

TRANSACTION_SCHEMA = StructType(
    [
        StructField("block_number", LongType(), False),
        StructField("transaction_index", IntegerType(), False),
        StructField("hash", StringType(), False),
        StructField("from_", StringType(), True),
        StructField("to_", StringType(), True),  # NULL ⇒ contract creation
        StructField("gas", LongType(), True),
        StructField("gas_price", LongType(), True),
        StructField("nonce", LongType(), True),
        StructField("value_hex", StringType(), True),
        StructField("input", StringType(), True),
    ]
)

RECEIPT_SCHEMA = StructType(
    [
        StructField("transaction_hash", StringType(), False),
        StructField("block_number", LongType(), False),
        StructField("transaction_index", IntegerType(), False),
        StructField("from_", StringType(), True),
        StructField("to_", StringType(), True),
        StructField("contract_address", StringType(), True),  # set iff creation tx
        StructField("gas_used", LongType(), True),
        StructField("cumulative_gas_used", LongType(), True),
        StructField("status", IntegerType(), True),
    ]
)

LOG_SCHEMA = StructType(
    [
        StructField("block_number", LongType(), False),
        StructField("transaction_index", IntegerType(), False),
        StructField("log_index", IntegerType(), False),
        StructField("transaction_hash", StringType(), True),
        StructField("address", StringType(), False),  # emitting contract = collection_id
        StructField("topics", ArrayType(StringType()), False),
        StructField("data", StringType(), True),  # hex-encoded ABI blob
        StructField("removed", BooleanType(), True),
    ]
)

# Stand-in for live eth_call probes (FIXTURES.md §1.5): collection detection
# joins this instead of calling ERC-165/metadata functions when offline.
CONTRACT_SCHEMA = StructType(
    [
        StructField("address", StringType(), False),
        StructField("supports_erc721", BooleanType(), True),
        StructField("supports_erc1155", BooleanType(), True),
        StructField("name", StringType(), True),
        StructField("symbol", StringType(), True),
        StructField("total_supply_hex", StringType(), True),
        StructField("owner", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Silver (entity) schemas — reference nft/data/models.py + dynamodb.py:618-668
# ---------------------------------------------------------------------------

COLLECTION_SCHEMA = StructType(
    [
        StructField("blockchain", StringType(), False),
        StructField("collection_id", StringType(), False),
        StructField("creator", StringType(), True),
        StructField("owner", StringType(), True),
        StructField("name", StringType(), True),
        StructField("name_lower", StringType(), True),  # first 1024 chars, lowered
        StructField("symbol", StringType(), True),
        StructField("total_supply_hex", StringType(), True),
        StructField("specification", StringType(), True),  # ERC-721 | ERC-1155
        StructField("block_created", LongType(), True),
        StructField("date_created", LongType(), True),  # epoch seconds
        StructField("data_version", LongType(), False),
    ]
)

TOKEN_SCHEMA = StructType(
    [
        StructField("blockchain", StringType(), False),
        StructField("collection_id", StringType(), False),
        StructField("token_id_hex", StringType(), False),  # canonical 0x+64
        StructField("mint_block", LongType(), True),
        StructField("mint_timestamp", LongType(), True),
        StructField("original_owner", StringType(), True),
        StructField("current_owner", StringType(), True),  # NULL for ERC-1155
        StructField("current_owner_version_hex", StringType(), True),
        StructField("quantity", DecimalType(38, 0), True),  # NULL on uint256 overflow
        StructField("metadata_url", StringType(), True),
        StructField("metadata_url_version_hex", StringType(), True),
        StructField("data_version", LongType(), False),
    ]
)

TOKEN_TRANSFER_SCHEMA = StructType(
    [
        StructField("blockchain", StringType(), False),
        StructField("collection_id", StringType(), False),
        StructField("attribute_version_hex", StringType(), False),  # 40-char total order
        StructField("token_id_hex", StringType(), False),
        StructField("timestamp", LongType(), True),
        StructField("block_id", LongType(), False),
        StructField("transaction_hash", StringType(), True),
        StructField("transaction_index", IntegerType(), False),
        StructField("log_index", IntegerType(), False),
        StructField("transaction_type", StringType(), False),  # mint|burn|transfer
        StructField("from_", StringType(), True),
        StructField("to_", StringType(), True),
        StructField("quantity_hex", StringType(), True),
        StructField("data_version", LongType(), False),
    ]
)

OWNER_SCHEMA = StructType(
    [
        StructField("blockchain", StringType(), False),
        StructField("account", StringType(), False),
        StructField("collection_id", StringType(), False),
        StructField("token_id_hex", StringType(), False),
        StructField("quantity", DecimalType(38, 0), True),
        StructField("data_version", LongType(), False),
    ]
)

CRAWLER_CONFIG_SCHEMA = StructType(
    [
        StructField("blockchain", StringType(), False),
        StructField("data_version", LongType(), False),
        StructField("last_block_id", LongType(), True),
    ]
)
