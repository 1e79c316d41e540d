"""`load` / `force-load` CLI subcommands (reference ``nft/bin/load.py:202-280``,
``nft/bin/force.py``; round-2 per VERDICT r1 "What's missing" #2/#3).

`load` is the fixed-height bulk backfill: over the same block range it must
produce exactly the silver that `crawl` produces, and pin ``last_block_id``
to HEIGHT so a tail takes over at HEIGHT+1.
"""

from __future__ import annotations

import json

import pytest

from block_crawler_spark.cli import main
from block_crawler_spark.schemas import LOG_SCHEMA
from block_crawler_spark.sources.chainfix import standard_scenario
from block_crawler_spark.streaming.store import SilverStore

BLOCKS_DDL = (
    "number long, hash string, parent_hash string, miner string, timestamp long, "
    "gas_limit long, gas_used long, size long, difficulty long, transaction_hashes array<string>"
)


@pytest.fixture(scope="module")
def bronze(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bronze")
    fb = standard_scenario()
    spark.createDataFrame(fb.rows, LOG_SCHEMA).write.parquet(str(root / "logs"))
    spark.createDataFrame(fb.blocks(), BLOCKS_DDL).write.parquet(str(root / "blocks"))
    height = max(b["number"] for b in fb.blocks())
    return str(root / "logs"), str(root / "blocks"), height


def _table_set(store: SilverStore, table: str) -> set[tuple]:
    return {tuple(r) for r in store.read(table).collect()}


def test_load_equals_crawl_over_same_range(spark, bronze, tmp_path, capsys):
    logs, blocks, height = bronze
    s_load, s_crawl = str(tmp_path / "sl"), str(tmp_path / "sc")
    assert main(["load", "--logs", logs, "--blocks", blocks, "--silver", s_load,
                 "--blockchain", "testnet", "--height", str(height)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["loaded_to"] == height
    assert main(["crawl", "--logs", logs, "--blocks", blocks, "--silver", s_crawl,
                 "--blockchain", "testnet"]) == 0
    st_l, st_c = SilverStore(spark, s_load), SilverStore(spark, s_crawl)
    for table in ("token_transfers", "tokens", "owners"):
        assert _table_set(st_l, table) == _table_set(st_c, table), table
    assert st_l.get_config("testnet") == st_c.get_config("testnet")


def test_load_height_clips_and_tail_resumes(spark, bronze, tmp_path, capsys):
    """Loading to height-1 must exclude the top block's transfers and leave
    last_block_id = height-1 (the tail's resume point)."""
    logs, blocks, height = bronze
    s = str(tmp_path / "clip")
    assert main(["load", "--logs", logs, "--blocks", blocks, "--silver", s,
                 "--blockchain", "testnet", "--height", str(height - 1),
                 "--increment-data-version"]) == 0
    store = SilverStore(spark, s)
    dv, last = store.get_config("testnet")
    assert (dv, last) == (2, height - 1)  # epoch bumped 1→2, pinned to HEIGHT
    from pyspark.sql import functions as F

    assert store.read("token_transfers").filter(F.col("block_id") > height - 1).count() == 0


def test_force_load_fixture(spark, tmp_path, capsys):
    s = str(tmp_path / "forced")
    collection = "0x" + "ab" * 20
    assert main(["force-load", "--silver", s, "--blockchain", "testnet",
                 "--collection", collection, "--tx", "0x" + "01" * 32,
                 "--fixture", "--spec", "ERC-721"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"collection": collection, "specification": "ERC-721"}
    store = SilverStore(spark, s)
    rows = store.read("collections").collect()
    assert len(rows) == 1 and rows[0]["collection_id"] == collection


def test_recrawl_same_range_is_idempotent(spark, bronze, tmp_path, capsys):
    """Re-running crawl over the same bronze must rewrite identical silver —
    the additive token quantity must not double-count (ST5 retry
    idempotence; caught by `verify` returning token errors after a second
    crawl)."""
    logs, blocks, _height = bronze
    s = str(tmp_path / "twice")
    for _ in range(2):
        assert main(["crawl", "--logs", logs, "--blocks", blocks, "--silver", s,
                     "--blockchain", "testnet"]) == 0
    capsys.readouterr()
    assert main(["verify", "--logs", logs, "--silver", s]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["clean"] is True, out
