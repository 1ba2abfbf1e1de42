"""Bit-exact pure-Python replay of Spark's seeded RAND / RANDN streams.

Spark's ``Rand(seed)`` / ``Randn(seed)`` expressions draw from
``org.apache.spark.util.random.XORShiftRandom(seed + partitionIndex)``
(``spark/util/random/XORShiftRandom.scala``): a ``java.util.Random``
subclass that replaces ``next(bits)`` with a 64-bit xorshift step over a
hashed seed.  Re-implemented here from the public sources so the golden
oracle for the generation surface (``golden.seeded_table_golden_sql``)
can replay the exact value stream WITHOUT calling Spark — an independent
single-process oracle per the repo's golden conventions.

Semantics replicated:

* ``hashSeed``: the 8-byte big-endian long, hashed by two chained
  ``scala.util.hashing.MurmurHash3.bytesHash`` calls (x86_32, default
  ``arraySeed = 0x3c074a61``) into the 64-bit starting state (verified
  bit-exact against Spark 4.1 ``RAND(seed)`` output in
  ``tests/test_sparkrng.py``).
* ``next(bits)``: ``s ^= s << 21; s ^= s >>> 35; s ^= s << 4`` over the
  64-bit state, masked to ``bits``.
* ``nextDouble``: ``((next(26) << 27) + next(27)) * 2^-53``
  (``java.util.Random``).
* ``nextGaussian``: Marsaglia polar method with the one-value cache
  (``java.util.Random``), which consumes ``nextDouble`` pairs.
* Each ``RAND(seed)`` occurrence in a plan is its OWN expression instance
  with its own stream (non-deterministic expressions are never CSE'd),
  all seeded ``seed + partitionIndex``; an instance advances once per
  EVALUATION, so a stream under a lazy ``CASE WHEN`` branch advances only
  on rows that take the branch.
"""

from __future__ import annotations

import math

_M64 = (1 << 64) - 1


def _murmur3_x86_32(data: bytes, seed: int) -> int:
    """scala.util.hashing.MurmurHash3.bytesHash == murmur3 x86_32 over
    little-endian 4-byte blocks."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) == 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


_ARRAY_SEED = 0x3C074A61  # scala.util.hashing.MurmurHash3.arraySeed


def _hash_seed(init: int) -> int:
    buf = (init & _M64).to_bytes(8, "big")
    low = _murmur3_x86_32(buf, _ARRAY_SEED)
    high = _murmur3_x86_32(buf, low)
    return ((high << 32) | low) & _M64


class XORShiftRandom:
    """One RAND/RANDN expression instance for one partition."""

    def __init__(self, seed: int, partition_index: int = 0):
        self._s = _hash_seed(seed + partition_index)
        self._have_g = False
        self._g = 0.0

    def _next(self, bits: int) -> int:
        s = self._s
        s = (s ^ (s << 21)) & _M64
        s ^= s >> 35
        s = (s ^ (s << 4)) & _M64
        self._s = s
        return s & ((1 << bits) - 1)

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)

    def next_gaussian(self) -> float:
        # java.util.Random.nextGaussian: Marsaglia polar with cache
        if self._have_g:
            self._have_g = False
            return self._g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        mult = math.sqrt(-2 * math.log(s) / s)
        self._g = v2 * mult
        self._have_g = True
        return v1 * mult
