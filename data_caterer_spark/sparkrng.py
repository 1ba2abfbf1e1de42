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
  (``java.util.Random``), which consumes ``nextDouble`` pairs.  Java
  evaluates it with ``StrictMath`` (fdlibm); :func:`_strict_log`
  reimplements fdlibm's log so RANDN replay is bit-exact on every
  platform (``math.log`` = platform libm drifts 1 ulp on ~3-5% of draws,
  enough to flip a rounded golden-oracle cell).
* Each ``RAND(seed)`` occurrence in a plan is its OWN expression instance
  with its own stream (non-deterministic expressions are never CSE'd),
  all seeded ``seed + partitionIndex``; an instance advances once per
  EVALUATION, so a stream under a lazy ``CASE WHEN`` branch advances only
  on rows that take the branch.
"""

from __future__ import annotations

import math
import struct

_M64 = (1 << 64) - 1

# ---------------------------------------------------------------------------
# StrictMath.log == fdlibm __ieee754_log (Sun's public fdlibm e_log.c),
# re-expressed in Python.  Every arithmetic op below is an IEEE-double op in
# CPython, so the result is bit-identical to Java's StrictMath.log — unlike
# math.log, which calls the platform libm and drifts by 1 ulp on ~3-5% of
# inputs (enough to flip a rounded RANDN cell in the golden oracle).
# ---------------------------------------------------------------------------

_LN2_HI = 6.93147180369123816490e-01
_LN2_LO = 1.90821492927058770002e-10
_TWO54 = 1.80143985094819840000e16
_LG1 = 6.666666666666735130e-01
_LG2 = 3.999999999940941908e-01
_LG3 = 2.857142874366239149e-01
_LG4 = 2.222219843214978396e-01
_LG5 = 1.818357216161805012e-01
_LG6 = 1.531383769920937332e-01
_LG7 = 1.479819860511658591e-01


def _hi_lo(x: float) -> tuple[int, int]:
    b = struct.unpack(">q", struct.pack(">d", x))[0]
    return (b >> 32) & 0xFFFFFFFF, b & 0xFFFFFFFF


def _set_hi(x: float, hi: int) -> float:
    b = struct.unpack(">q", struct.pack(">d", x))[0]
    b = (hi << 32) | (b & 0xFFFFFFFF)
    if b >= 1 << 63:
        b -= 1 << 64
    return struct.unpack(">d", struct.pack(">q", b))[0]


def _strict_log(x: float) -> float:
    hx, lx = _hi_lo(x)
    if hx >= 0x80000000:
        hx -= 1 << 32  # C signed-int view of the high word
    k = 0
    if hx < 0x00100000:  # x < 2^-1022, or negative/zero
        if ((hx & 0x7FFFFFFF) | lx) == 0:
            return float("-inf")  # log(+-0)
        if hx < 0:
            return float("nan")  # log(negative)
        k -= 54
        x *= _TWO54  # scale up subnormal
        hx, lx = _hi_lo(x)
    if hx >= 0x7FF00000:  # inf/nan
        return x + x
    k += (hx >> 20) - 1023
    hx &= 0x000FFFFF
    i = (hx + 0x95F64) & 0x100000
    x = _set_hi(x, hx | (i ^ 0x3FF00000))  # normalize x or x/2
    k += i >> 20
    f = x - 1.0
    if (0x000FFFFF & (2 + hx)) < 3:  # |f| < 2^-20
        if f == 0.0:
            if k == 0:
                return 0.0
            dk = float(k)
            return dk * _LN2_HI + dk * _LN2_LO
        r = f * f * (0.5 - 0.33333333333333333 * f)
        if k == 0:
            return f - r
        dk = float(k)
        return dk * _LN2_HI - ((r - dk * _LN2_LO) - f)
    s = f / (2.0 + f)
    dk = float(k)
    z = s * s
    i = hx - 0x6147A
    w = z * z
    j = 0x6B851 - hx
    t1 = w * (_LG2 + w * (_LG4 + w * _LG6))
    t2 = z * (_LG1 + w * (_LG3 + w * (_LG5 + w * _LG7)))
    i |= j
    r = t2 + t1
    if i > 0:
        hfsq = 0.5 * f * f
        if k == 0:
            return f - (hfsq - s * (hfsq + r))
        return dk * _LN2_HI - ((hfsq - (s * (hfsq + r) + dk * _LN2_LO)) - f)
    if k == 0:
        return f - s * (f - r)
    return dk * _LN2_HI - ((s * (f - r) - dk * _LN2_LO) - f)


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
        # java.util.Random.nextGaussian: Marsaglia polar with cache.
        # Java uses StrictMath.log (fdlibm) — platform libm can differ in
        # the last ulp, and the seeded-table golden oracle rounds RANDN
        # outputs, so a boundary-adjacent ulp would flip a rounded cell.
        # _strict_log reimplements fdlibm's log, making this replay
        # bit-exact on every platform; math.sqrt is already the correctly
        # rounded IEEE sqrt (== StrictMath.sqrt).
        if self._have_g:
            self._have_g = False
            return self._g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        mult = math.sqrt(-2 * _strict_log(s) / s)
        self._g = v2 * mult
        self._have_g = True
        return v1 * mult
