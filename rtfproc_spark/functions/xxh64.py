"""Pure-Python XXH64 matching Spark SQL's ``xxhash64`` expression.

XXH64 is a public algorithm (Yann Collet's xxHash, BSD); Spark's
``xxhash64(c1, c2, ...)`` chains it over the columns: the running hash
starts at seed 42 and each column's hash output seeds the next —
integers hash as their 4 little-endian bytes, longs as 8, strings as
their UTF-8 bytes. This driver-side implementation (no Spark, no JVM)
exists so staged-expected differentials can predict ``xxhash64``-based
results (minhash signatures, LSH band buckets) independently of the
cluster; tests/test_entry_oracles.py pins literal-for-literal equality
against the real Spark expression.

No third-party ``xxhash`` package is used (not available in this
environment, and independence from Spark is the point).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int) -> int:
    """Canonical XXH64 of ``data`` with unsigned 64-bit ``seed`` -> unsigned."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = _round(v1, k1), _round(v2, k2), _round(v3, k3), _round(v4, k4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ _round(0, k1), 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ ((k1 * _P1) & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _to_signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def spark_xxhash64(*values) -> int:
    """Spark's ``xxhash64(v1, v2, ...)`` over Python values -> SIGNED int64.

    Type mapping mirrors Spark's literal inference: Python int in int32
    range hashes as IntegerType (4 LE bytes), wider ints / values tagged
    ``("long", v)`` as LongType (8 LE bytes), str as UTF-8 bytes, bytes
    verbatim. The running hash chains through the columns from seed 42.
    """
    h = 42
    for v in values:
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "long":
            h = xxh64(struct.pack("<q", v[1]), h)
        elif isinstance(v, bool):
            raise TypeError("bool hashing not needed/implemented")
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                h = xxh64(struct.pack("<i", v), h)
            else:
                h = xxh64(struct.pack("<q", v), h)
        elif isinstance(v, str):
            h = xxh64(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = xxh64(v, h)
        else:
            raise TypeError(f"unsupported type {type(v)}")
    return _to_signed(h)
