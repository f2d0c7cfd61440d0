"""Deterministic hashing that exactly matches Spark's ``F.xxhash64``.

Why this exists: every "random" value in this engine (fixture degrees,
edge weights, minhash seeds, LSH planes) is hash-derived so that pure
Python/NumPy oracles and distributed Spark generators agree bit-for-bit.
This deliberately replaces the reference's non-reproducible
``time(NULL)``-seeded weights (/root/reference/convert/process_adjlist.cpp:25-30,
process_edgelist.cpp:72) — FOG's weighted outputs change on every convert.

Implements the XXH64 specializations Spark uses (seed 42, per-column
chaining): hashLong for BIGINT columns, hashInt for INT, and the generic
byte-stream hash for STRING (UTF-8). Multi-column ``xxhash64(a, b)`` chains:
``h = 42; h = xxh(a, seed=h); h = xxh(b, seed=h)``.

Scalar and NumPy-vectorized variants are provided; the vectorized form is
what test oracles use on whole arrays.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 8-byte long, as Spark's XXH64.hashLong. Signed result."""
    seed &= _M
    value &= _M
    h = (seed + _P5 + 8) & _M
    k1 = (_rotl((value * _P2) & _M, 31) * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _to_signed(_fmix(h))


def xxh64_int(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 4-byte int, as Spark's XXH64.hashInt. Signed result."""
    seed &= _M
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _to_signed(_fmix(h))


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Generic XXH64 over a byte string (Spark's hashUnsafeBytes path for
    STRING columns; standard XXH64 layout). Signed result."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (_rotl((v + k * _P2) & _M, 31) * _P1) & _M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _to_signed(_fmix(h))


def xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """Spark-compatible multi-column xxhash64 chain over python values.

    int -> hashLong (Spark BIGINT), str/bytes -> byte-stream hash.
    Matches ``F.xxhash64(cast(... as long)...)`` / string columns.
    """
    h = seed
    for v in values:
        if isinstance(v, (int, np.integer)):
            h = xxh64_long(int(v), seed=h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), seed=h)
        elif isinstance(v, bytes):
            h = xxh64_bytes(v, seed=h)
        else:
            raise TypeError(f"unsupported hash input type {type(v)}")
    return h


def pmod(x, m):
    """Sign-safe modulus matching Spark's F.pmod (works on ints & arrays)."""
    return ((x % m) + m) % m


# ---------------------------------------------------------------- vectorized

def _v_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _v_fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(_P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(_P3)
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_long_vec(values: np.ndarray, seed=SPARK_SEED) -> np.ndarray:
    """Vectorized xxh64_long over an int64 array -> int64 (signed) array.

    ``seed`` may be a scalar or an array (for multi-column chaining).
    """
    with np.errstate(over="ignore"):
        v = values.astype(np.int64).view(np.uint64) if values.dtype != np.uint64 else values
        s = np.asarray(seed)
        s = s.astype(np.int64).view(np.uint64) if s.dtype != np.uint64 else s
        h = s + np.uint64((_P5 + 8) & _M)
        k1 = _v_rotl(v * np.uint64(_P2), 31) * np.uint64(_P1)
        h = h ^ k1
        h = _v_rotl(h, 27) * np.uint64(_P1) + np.uint64(_P4)
        return _v_fmix(h).view(np.int64)


def xxhash64_vec(*arrays, seed=SPARK_SEED) -> np.ndarray:
    """Vectorized Spark xxhash64 chain over int64 arrays."""
    h = np.full(len(arrays[0]), seed, dtype=np.int64).view(np.uint64)
    for a in arrays:
        h = xxh64_long_vec(np.asarray(a, dtype=np.int64), seed=h).view(np.uint64)
    return h.view(np.int64)
