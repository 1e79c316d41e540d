"""Tests for the last SURVEY §2 parity pieces: A4/T12 tokenURI backfill,
T13 force-load, J1 collection reconciliation, S9 block-time cache, IVF."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from block_crawler_spark.operators.ann import ivf_assign, ivf_topk, knn_join_brute
from block_crawler_spark.operators.verify import reconcile_collections
from block_crawler_spark.plans.crawl import force_load_collection
from block_crawler_spark.schemas import (
    COLLECTION_SCHEMA,
    CONTRACT_SCHEMA,
    INTERFACE_ID_ERC721,
    SELECTOR_NAME,
    SELECTOR_TOKEN_URI,
)
from block_crawler_spark.sources.blocktimes import (
    block_times_from_blocks,
    load_block_times,
    save_block_times,
    with_block_times,
)
from block_crawler_spark.sources.chainfix import addr, enc_string, enc_uint
from block_crawler_spark.sources.rpc import (
    FakeChainTransport,
    _supports_interface_data,
    fetch_token_uris,
)


def test_fetch_token_uris(spark):
    coll = addr(0xAA01)
    tid = "0x" + enc_uint(7)
    t = FakeChainTransport(
        calls={(coll, SELECTOR_TOKEN_URI + tid[2:]): enc_string("ipfs://meta/7")}
    )
    tokens = spark.createDataFrame(
        [(coll, tid), (coll, "0x" + enc_uint(8))], ["collection_id", "token_id_hex"]
    )
    got = {r["token_id_hex"]: r["metadata_url"] for r in fetch_token_uris(tokens, t).collect()}
    assert got[tid] == "ipfs://meta/7"
    assert got["0x" + enc_uint(8)] is None  # revert → NULL, not an error


def test_fetch_token_uris_pinned_at_mint_block(spark):
    """T12 parity: the reference calls tokenURI at the token's mint block
    (nft/evm/consumers.py:328-374); a mint_block column pins each call."""
    coll = addr(0xAA01)
    tid = "0x" + enc_uint(7)
    data = SELECTOR_TOKEN_URI + tid[2:]
    t = FakeChainTransport(
        calls={
            (coll, data, hex(5)): enc_string("ipfs://at-mint/7"),
            (coll, data): enc_string("https://latest/7"),  # tag-less fallback
        }
    )
    tokens = spark.createDataFrame(
        [(coll, tid, 5)], ["collection_id", "token_id_hex", "mint_block"]
    )
    pinned = fetch_token_uris(tokens, t).collect()[0]["metadata_url"]
    assert pinned == "ipfs://at-mint/7"
    # explicit tag overrides the mint_block column
    latest = fetch_token_uris(tokens, t, block_tag="latest").collect()[0]["metadata_url"]
    assert latest == "https://latest/7"


def test_fetch_token_uris_latest_fallback_on_pruned_node(spark):
    """Against a pruned (non-archive) node the pinned historical call
    reverts; ``latest_fallback=True`` retries once at the head, the default
    keeps the reference-matching NULL."""
    coll = addr(0xAA01)
    tid = "0x" + enc_uint(7)
    data = SELECTOR_TOKEN_URI + tid[2:]
    # only head state is servable — the archive pin at block 5 reverts
    t = FakeChainTransport(calls={(coll, data, "latest"): enc_string("https://head/7")})
    tokens = spark.createDataFrame(
        [(coll, tid, 5)], ["collection_id", "token_id_hex", "mint_block"]
    )
    assert fetch_token_uris(tokens, t).collect()[0]["metadata_url"] is None
    got = fetch_token_uris(tokens, t, latest_fallback=True).collect()[0]["metadata_url"]
    assert got == "https://head/7"


def test_force_load_collection(spark):
    coll = addr(0xAA01)
    t = FakeChainTransport(
        blocks={
            99: {"number": "0x63", "hash": "0x" + "9" * 64, "parentHash": "0x" + "8" * 64,
                 "miner": addr(1), "timestamp": hex(1_600_001_287), "gasLimit": "0x1",
                 "gasUsed": "0x1", "size": "0x1", "difficulty": "0x1", "transactions": []}
        },
        receipts={
            "0xcafe": {"transactionHash": "0xcafe", "blockNumber": "0x63", "transactionIndex": "0x0",
                       "from": addr(0xC0), "to": None, "contractAddress": coll,
                       "gasUsed": "0x1", "cumulativeGasUsed": "0x1", "status": "0x1"}
        },
        calls={
            (coll, _supports_interface_data(INTERFACE_ID_ERC721)): "0x" + enc_uint(1),
            (coll, SELECTOR_NAME): enc_string("Forced"),
        },
    )
    row = force_load_collection(spark, t, coll, "0xcafe", "testnet", 3).collect()[0]
    assert row["specification"] == "ERC-721"
    assert row["creator"] == addr(0xC0)
    assert row["block_created"] == 99
    assert row["date_created"] == 1_600_001_287
    assert row["name"] == "Forced"
    assert row["name_lower"] == "forced"

    # fallback spec when ERC-165 answers nothing
    t2 = FakeChainTransport(receipts=t.receipts, blocks=t.blocks)
    row2 = force_load_collection(spark, t2, coll, "0xcafe", "testnet", 3, "ERC-1155").collect()[0]
    assert row2["specification"] == "ERC-1155"


def test_reconcile_collections(spark):
    coll_ok, coll_bad, coll_ghost = addr(1), addr(2), addr(3)
    db = spark.createDataFrame(
        [
            ("t", coll_ok, None, addr(9), "Good", "good", "G", None, "ERC-721", 1, 1, 1),
            ("t", coll_bad, None, addr(9), "WrongName", "wrongname", "W", None, "ERC-721", 1, 1, 1),
            ("t", coll_ghost, None, None, "Ghost", "ghost", "GH", None, "ERC-721", 1, 1, 1),
        ],
        COLLECTION_SCHEMA,
    )
    truth = spark.createDataFrame(
        [
            (coll_ok, True, False, "Good", "G", None, addr(9)),
            (coll_bad, True, False, "Actual", "W", None, addr(9)),
            (coll_ghost, False, False, None, None, None, None),  # not a collection
            (addr(4), True, False, "Missing", "M", None, None),  # absent from DB
        ],
        CONTRACT_SCHEMA,
    )
    errs = {r["collection_id"]: r["error"] for r in reconcile_collections(db, truth).collect()}
    assert coll_ok not in errs
    assert errs[coll_bad] == "name_mismatch"
    assert errs[coll_ghost] == "not_a_collection"
    assert errs[addr(4)] == "missing_in_db"


def test_block_times_cache(spark, tmp_path):
    blocks = spark.createDataFrame([(5, 100), (6, 113)], "number long, timestamp long")
    times = block_times_from_blocks(blocks)
    path = str(tmp_path / "bt")
    save_block_times(times, path)
    loaded = load_block_times(spark, path)
    fact = spark.createDataFrame([(5,), (6,), (7,)], "block_number long")
    joined = {r["block_number"]: r["timestamp"] for r in with_block_times(fact, loaded).collect()}
    assert joined == {5: 100, 6: 113, 7: None}


def test_ivf_recall_vs_brute(spark):
    from block_crawler_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = emb.filter(F.col("vec_id") < 8)
    # assignment: every vector lands in exactly one cell
    assigned = ivf_assign(emb, centroids)
    assert assigned.count() == emb.count()
    assert assigned.select("centroid_id").distinct().count() <= 8
    # IVF (nprobe=1) property: every returned neighbor shares the query's cell
    ivf = ivf_topk(queries, emb, centroids, k=3).collect()
    assert len(ivf) > 0
    cell = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    for r in ivf:
        assert cell[r["q_id"]] == cell[r["c_id"]]
    # and ranks are dense starting at 1 per query
    by_q = {}
    for r in ivf:
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_fetch_token_uris_null_mint_block_falls_back_to_latest(spark):
    """A token first seen via transfer has NULL mint_block — the pinned
    path must fall back to 'latest', not crash on int(NaN)."""
    coll = addr(0xAA01)
    tid = "0x" + enc_uint(9)
    t = FakeChainTransport(calls={(coll, SELECTOR_TOKEN_URI + tid[2:]): enc_string("https://latest/9")})
    tokens = spark.createDataFrame(
        [(coll, tid, None)], "collection_id string, token_id_hex string, mint_block long"
    )
    got = fetch_token_uris(tokens, t).collect()[0]["metadata_url"]
    assert got == "https://latest/9"
