"""Pure-Python / numpy XXH64 compatible with Spark's ``xxhash64`` SQL
function, used by driver-side oracle mirrors to recompute hash-derived
engine outputs (MinHash signatures, LSH buckets) INDEPENDENTLY of the
JVM under test.

Algorithm: xxHash64 (Yann Collet, public BSD spec); Spark's
``org.apache.spark.sql.catalyst.expressions.XXH64`` is a faithful port,
hashing each argument's memory representation little-endian and chaining
the running hash as the seed for the next argument:

- string column  -> xxh64(utf8_bytes, seed)
- long column    -> xxh64(little_endian_8_bytes, seed)
- array<long>    -> fold: seed' = xxh64(elem_bytes, seed) per element
- multiple args  -> same fold across arguments, initial seed 42

``spark_hash_long_vec`` vectorizes the 8-byte case over numpy uint64
arrays (the hot path for MinHash permutation mixing).
"""

from __future__ import annotations

import struct

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

DEFAULT_SEED = 42  # Spark's Murmur3/xxhash64 default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """xxHash64 of ``data``; returns Spark's SIGNED 64-bit value."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                k = struct.unpack_from("<Q", data, i + off)[0]
                cur = (v1, v2, v3, v4)[v - 1]
                cur = (cur + k * _P2) & _M
                cur = (_rotl(cur, 31) * _P1) & _M
                if v == 1:
                    v1 = cur
                elif v == 2:
                    v2 = cur
                elif v == 3:
                    v3 = cur
                else:
                    v4 = cur
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h ^ k) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = struct.unpack_from("<Q", data, i)[0]
        k = (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = struct.unpack_from("<I", data, i)[0]
        h = ((_rotl(h ^ ((k * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_hash_string(s: str, seed: int = DEFAULT_SEED) -> int:
    """= Spark ``xxhash64(string_col)`` (utf8 bytes, seed 42)."""
    return xxh64(s.encode("utf-8"), seed & _M)


def spark_hash_long(l: int, seed: int = DEFAULT_SEED) -> int:
    """= one fold step of Spark ``xxhash64`` over a LongType value."""
    return xxh64(struct.pack("<q", l), seed & _M)


def spark_hash_longs(vals, seed: int = DEFAULT_SEED) -> int:
    """= Spark ``xxhash64(array<long>)`` or ``xxhash64(l1, l2, ...)``:
    fold each 8-byte element through the running hash."""
    h = seed
    for v in vals:
        h = spark_hash_long(int(v), h)
    return h


def spark_hash_long_vec(vals: np.ndarray, seed) -> np.ndarray:
    """Vectorized :func:`spark_hash_long` over an int64/uint64 array.
    ``seed`` may be a scalar or an array broadcastable to ``vals``.
    Returns int64 (Spark-signed) values.

    This is the 8-byte xxh64 special case: h = seed + P5 + 8, one
    8-byte mix round, fmix."""
    with np.errstate(over="ignore"):
        k = vals.astype(np.uint64, copy=False)
        seed = np.asarray(seed).astype(np.uint64)
        p1 = np.uint64(_P1); p2 = np.uint64(_P2); p4 = np.uint64(_P4)
        k = k * p2
        k = (k << np.uint64(31)) | (k >> np.uint64(33))
        k = k * p1
        h = seed + np.uint64(_P5) + np.uint64(8)
        h = h ^ k
        h = (h << np.uint64(27)) | (h >> np.uint64(37))
        h = h * p1 + p4
        h ^= h >> np.uint64(33)
        h *= p2
        h ^= h >> np.uint64(29)
        h *= np.uint64(_P3)
        h ^= h >> np.uint64(32)
        return h.astype(np.int64)
