"""JVM-side ABI decoding as pure column expressions.

The reference decodes event payloads row-at-a-time with ``eth_abi``
(``nft/evm/transformers.py:200-376``).  Here the hot-path decodes — 32-byte
words, addresses from topics, ``(uint256,uint256)`` tuples, dynamic
``uint256[]`` arrays, and ABI strings — are all built-in Spark expressions
(`substring`/`conv`/`sequence`/`transform`/`unhex`), so they run inside
whole-stage codegen with no Python round-trip.  At 100 TB of logs this is the
difference between a scan-speed decode and an Arrow-serialization bottleneck.

ABI layout (public Solidity ABI spec): data blob = "0x" + N×64 hex chars.
Static slots hold values; dynamic slots hold byte offsets into the blob;
a dynamic value starts with a length word followed by its payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hexint import hex_to_dec, hex_to_long

_WORD_HEX = 64


def word(data: Column, slot: Column | int) -> Column:
    """0-based 32-byte word from a "0x"-prefixed hex blob, as 64 hex chars."""
    if isinstance(slot, int):
        return F.substring(data, 3 + _WORD_HEX * slot, _WORD_HEX)
    return F.substring(data, (F.lit(3) + F.lit(_WORD_HEX) * slot).cast("int"), F.lit(_WORD_HEX))


def word_uint(data: Column, slot: Column | int) -> Column:
    """Word interpreted as uint → Decimal(38,0) (NULL on overflow)."""
    return hex_to_dec(word(data, slot))


def _offset_words(data: Column, slot: int) -> Column:
    """Dynamic-slot head word = byte offset; convert to a word index."""
    return (hex_to_long(word(data, slot)) / F.lit(32)).cast("long")


def decode_uint256_array(data: Column, slot: int) -> Column:
    """Dynamic ``uint256[]`` at head-slot `slot` → array of 64-hex-char strings.

    Fully JVM-side: offset word → length word → `sequence`+`transform` over the
    element words.  Keeping elements as canonical hex defers the
    Decimal-overflow policy to the consumer (see functions.hexint).
    """
    start = _offset_words(data, slot)
    n = hex_to_long(word(data, start))
    return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), n.cast("int")), lambda i: word(data, start + i.cast("long")))
    )


def decode_string(data: Column, slot: int) -> Column:
    """Dynamic ABI ``string`` at head-slot `slot` → StringType (UTF-8)."""
    start = _offset_words(data, slot)
    nbytes = hex_to_long(word(data, start))
    payload = F.substring(
        data,
        (F.lit(3) + F.lit(_WORD_HEX) * (start + 1)).cast("int"),
        (nbytes * 2).cast("int"),
    )
    return F.when(nbytes <= 0, F.lit("")).otherwise(F.decode(F.unhex(payload), "UTF-8"))
