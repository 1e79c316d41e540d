"""Pure-Python Keccak-256 (the pre-NIST-padding SHA-3 variant Ethereum uses).

Needed only off the hot path: computing 4-byte function selectors and 32-byte
event topic hashes from ABI signatures (reference: ``evm/bin.py:18-35``
``function_digest``).  hashlib's ``sha3_256`` is NIST SHA-3 (0x06 padding),
not Keccak (0x01 padding), so we implement the public Keccak-f[1600] sponge
directly.  This runs driver-side over a handful of constant signatures — it is
never inside a Spark job.
"""

from __future__ import annotations

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROTATIONS = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_MASK = (1 << 64) - 1


def _rol(value: int, shift: int) -> int:
    return ((value << shift) | (value >> (64 - shift))) & _MASK


def _keccak_f(state: list[list[int]]) -> None:
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [state[x][0] ^ state[x][1] ^ state[x][2] ^ state[x][3] ^ state[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(state[x][y], _ROTATIONS[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                state[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        state[0][0] ^= rc


def keccak256(data: bytes) -> bytes:
    rate_bytes = 136  # (1600 - 2*256) / 8
    state = [[0] * 5 for _ in range(5)]

    # multi-rate padding: 0x01 ... 0x80 (Keccak, NOT sha3's 0x06)
    padded = bytearray(data)
    pad_len = rate_bytes - (len(padded) % rate_bytes)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"

    for block_start in range(0, len(padded), rate_bytes):
        block = padded[block_start : block_start + rate_bytes]
        for i in range(rate_bytes // 8):
            lane = int.from_bytes(block[i * 8 : i * 8 + 8], "little")
            state[i % 5][i // 5] ^= lane
        _keccak_f(state)

    out = bytearray()
    while len(out) < 32:
        for i in range(rate_bytes // 8):
            out += state[i % 5][i // 5].to_bytes(8, "little")
            if len(out) >= 32:
                break
        if len(out) < 32:
            _keccak_f(state)
    return bytes(out[:32])


def event_topic(signature: str) -> str:
    """ABI event signature → 32-byte topic hash hex (reference ``evm/bin.py:33``)."""
    return "0x" + keccak256(signature.encode("ascii")).hex()


def function_selector(signature: str) -> str:
    """ABI function signature → 4-byte selector hex."""
    return "0x" + keccak256(signature.encode("ascii")).hex()[:8]
