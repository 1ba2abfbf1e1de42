"""Pure-Python twin of Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(col)`` hashes a string column's UTF-8 bytes with
XXH64 at seed 42 (``XxHash64`` -> ``XXH64.hashUnsafeBytes``).  The
golden-oracle replays need the SAME 64-bit values so that derived
structures whose behavior depends on hash internals — Bloom-filter bit
positions and their false positives — replay bit-exactly (the same
discipline as ``sparkrng.py`` for RAND/RANDN).

Implements the public xxHash64 specification (Collet,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md); output
is interpreted as a SIGNED 64-bit long to match Spark SQL's LongType.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

#: Spark's fixed seed for the xxhash64 expression (XxHash64 default)
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """xxHash64 of ``data``; returns a SIGNED 64-bit int (Spark long)."""
    seed &= _M
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(
                v2, int.from_bytes(data[pos + 8 : pos + 16], "little")
            )
            v3 = _round(
                v3, int.from_bytes(data[pos + 16 : pos + 24], "little")
            )
            v4 = _round(
                v4, int.from_bytes(data[pos + 24 : pos + 32], "little")
            )
            pos += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while pos + 8 <= n:
        k1 = _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _M
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Twin of ``F.xxhash64(string_col)``: XXH64 over the UTF-8 bytes."""
    return xxh64(s.encode("utf-8"), seed)
