"""Deterministic synthetic chain fixtures (FIXTURES.md §1) for tests.

Generates bronze ``logs`` (plus blocks) rows covering the reference's edge
cases — ERC-721 mints/transfers/burns/re-mints, ERC-20 3-topic decoys,
ERC-1155 single/batch transfers (including same-token-twice batches and
balances netting to zero), URI events with literal ``{id}``, and uint256
token ids beyond Decimal(38,0) — using a minimal pure-Python ABI encoder
(public Solidity ABI layout; we deliberately do not depend on eth_abi).

This module is test-support: the engine itself never generates data.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from ..schemas import (
    ERC721_TRANSFER_TOPIC,
    ERC1155_TRANSFER_BATCH_TOPIC,
    ERC1155_TRANSFER_SINGLE_TOPIC,
    ERC1155_URI_TOPIC,
)

ZERO = "0x" + "0" * 40


def addr(i: int) -> str:
    return "0x" + f"{i:040x}"


def enc_uint(v: int) -> str:
    return f"{v:064x}"


def topic_uint(v: int) -> str:
    return "0x" + enc_uint(v)


def topic_addr(a: str) -> str:
    return "0x" + a[2:].rjust(64, "0")


def enc_uint_array_pair(ids: list[int], vals: list[int]) -> str:
    """ABI-encode (uint256[] ids, uint256[] vals) as the data blob."""
    head = enc_uint(0x40) + enc_uint(0x40 + 32 * (1 + len(ids)))
    body1 = enc_uint(len(ids)) + "".join(enc_uint(i) for i in ids)
    body2 = enc_uint(len(vals)) + "".join(enc_uint(v) for v in vals)
    return "0x" + head + body1 + body2


def enc_string(s: str) -> str:
    b = s.encode("utf-8")
    padded = b.hex().ljust(((len(b) + 31) // 32) * 64, "0")
    return "0x" + enc_uint(0x20) + enc_uint(len(b)) + padded


@dataclass
class FixtureBuilder:
    """Accumulates log rows with monotonically increasing positions."""

    seed: int = 42
    block: int = 100
    tx: int = 0
    log: int = 0
    rows: list[dict] = field(default_factory=list)

    def _advance(self) -> tuple[int, int, int]:
        pos = (self.block, self.tx, self.log)
        self.log += 1
        if self.log >= 3:
            self.log, self.tx = 0, self.tx + 1
        if self.tx >= 3:
            self.tx, self.block = 0, self.block + 1
        return pos

    def _emit(self, address: str, topics: list[str], data: str) -> None:
        b, t, l = self._advance()
        self.rows.append(
            {
                "block_number": b,
                "transaction_index": t,
                "log_index": l,
                "transaction_hash": "0x" + f"{(b << 24) | (t << 8):064x}",
                "address": address,
                "topics": topics,
                "data": data,
                "removed": False,
            }
        )

    # -- event emitters ----------------------------------------------------
    def erc721_transfer(self, coll: str, frm: str, to: str, token_id: int) -> None:
        self._emit(coll, [ERC721_TRANSFER_TOPIC, topic_addr(frm), topic_addr(to), topic_uint(token_id)], "0x")

    def erc20_decoy(self, coll: str, frm: str, to: str, value: int) -> None:
        """Same Transfer signature, 3 topics — must be skipped by the decoder."""
        self._emit(coll, [ERC721_TRANSFER_TOPIC, topic_addr(frm), topic_addr(to)], "0x" + enc_uint(value))

    def erc1155_single(self, coll: str, op: str, frm: str, to: str, token_id: int, value: int) -> None:
        self._emit(
            coll,
            [ERC1155_TRANSFER_SINGLE_TOPIC, topic_addr(op), topic_addr(frm), topic_addr(to)],
            "0x" + enc_uint(token_id) + enc_uint(value),
        )

    def erc1155_batch(self, coll: str, op: str, frm: str, to: str, ids: list[int], vals: list[int]) -> None:
        self._emit(
            coll,
            [ERC1155_TRANSFER_BATCH_TOPIC, topic_addr(op), topic_addr(frm), topic_addr(to)],
            enc_uint_array_pair(ids, vals),
        )

    def erc1155_uri(self, coll: str, token_id: int, uri: str) -> None:
        self._emit(coll, [ERC1155_URI_TOPIC, topic_uint(token_id)], enc_string(uri))

    def blocks(self) -> list[dict]:
        """One row per touched block; timestamps ~13 s apart (FIXTURES §1.1)."""
        nums = sorted({r["block_number"] for r in self.rows})
        return [
            {"number": n, "hash": "0x" + f"{n:064x}", "parent_hash": "0x" + f"{n - 1:064x}",
             "miner": addr(999), "timestamp": 1_600_000_000 + 13 * n,
             "gas_limit": 30_000_000, "gas_used": 1_000_000, "size": 5_000,
             "difficulty": 1, "transaction_hashes": []}
            for n in nums
        ]


BIG_ID = (1 << 255) + 12345  # uint256 beyond Decimal(38,0) — overflow territory


def standard_scenario(seed: int = 42) -> FixtureBuilder:
    """The FIXTURES.md §1.4 coverage list as one deterministic fixture."""
    fb = FixtureBuilder(seed=seed)
    rng = random.Random(seed)
    c721, c1155 = addr(0xAA01), addr(0xBB02)
    alice, bob, carol, dave = addr(1), addr(2), addr(3), addr(4)

    # ERC-721: mint → transfer → burn → re-mint; mint-from-contract; decoys
    fb.erc721_transfer(c721, ZERO, alice, 1)           # mint
    fb.erc721_transfer(c721, alice, bob, 1)            # transfer
    fb.erc721_transfer(c721, ZERO, carol, 2)           # mint
    fb.erc721_transfer(c721, bob, ZERO, 1)             # burn
    fb.erc721_transfer(c721, ZERO, dave, 1)            # re-mint after burn
    fb.erc721_transfer(c721, c721, alice, 3)           # mint from contract address
    fb.erc721_transfer(c721, carol, dave, 2)           # transfer
    fb.erc20_decoy(c721, alice, bob, 777)              # 3-topic decoy — skip
    fb.erc721_transfer(c721, ZERO, alice, BIG_ID)      # uint256 > 1e38 token id
    fb.erc721_transfer(c721, alice, bob, BIG_ID)

    # ERC-1155: singles, batches (same token twice), net-to-zero balances, URI
    op = addr(0xEE)
    fb.erc1155_single(c1155, op, ZERO, alice, 10, 5)   # mint 5 of #10 to alice
    fb.erc1155_single(c1155, op, alice, bob, 10, 2)    # alice→bob 2
    fb.erc1155_batch(c1155, op, ZERO, carol, [10, 11, 11], [1, 4, 4])  # batch, same id twice
    fb.erc1155_single(c1155, op, carol, ZERO, 11, 8)   # burn all of carol's #11 → net zero
    fb.erc1155_single(c1155, op, bob, carol, 10, 2)    # bob's #10 nets to zero
    fb.erc1155_uri(c1155, 10, "https://meta.example/{id}.json")
    fb.erc1155_uri(c1155, 11, "ipfs://fixed/11")
    fb.erc1155_uri(c1155, 10, "https://meta2.example/{id}.json")  # later version wins
    fb.erc1155_single(c1155, op, ZERO, dave, BIG_ID, 3)  # huge token id, small qty
    fb.erc1155_single(c1155, op, ZERO, alice, 12, 1 << 200)  # qty overflows Decimal(38)

    # deterministic volume with consistent ownership (mint → transfer from
    # the actual current owner → occasional burn), so the additive incremental
    # fold (A5) and the last-writer-wins snapshot fold (A2) agree — the same
    # consistency a real chain guarantees
    owner_of: dict[int, str] = {}
    for i in range(50):
        token = 100 + i % 13
        actor = addr(10 + rng.randrange(6))
        cur = owner_of.get(token)
        if cur is None:
            fb.erc721_transfer(c721, ZERO, actor, token)  # mint
            owner_of[token] = actor
        elif i % 11 == 0:
            fb.erc721_transfer(c721, cur, ZERO, token)  # burn
            del owner_of[token]
        else:
            fb.erc721_transfer(c721, cur, actor, token)  # transfer
            owner_of[token] = actor
    return fb
