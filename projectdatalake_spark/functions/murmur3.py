"""Murmur3_x86_32 — the hash behind Iceberg's ``bucket[N]`` partition
transform (public domain algorithm by Austin Appleby; spec Appendix B).

Iceberg buckets a value by hashing its single-value binary form with
seed 0 and taking ``(hash & Integer.MAX_VALUE) % N``:

- int / long / date / time / timestamp(tz): the LONG value (days /
  micros for temporals) as 8 little-endian bytes;
- string: its UTF-8 bytes;
- decimal / fixed / uuid: not supported here (refused upstream).

Two implementations, both spec-vector-tested (tests/test_iceberg_interop.py):
``murmur3_32`` — scalar, any byte string (driver-side pruning, string
columns); ``mmh3_long_np`` — numpy-vectorized over int64 arrays for the
Arrow-batched write path (one column pass, no per-row Python).

Spec test vectors (iceberg spec Appendix B "Bucket transform details"):
    hash(int 34)                    = 2017239379
    hash(long 34)                   = 2017239379
    hash(date 2017-11-16)           = -653330422
    hash(timestamp 2017-11-16T22:31:08) = -2047944441
    hash(string "iceberg")          = 1210000089
"""

from __future__ import annotations

import numpy as np

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3_x86_32 of ``data``; returns a SIGNED 32-bit int (Java
    parity — Iceberg masks with Integer.MAX_VALUE afterwards)."""
    h = seed & _M32
    n = len(data)
    rounds = n // 4
    for i in range(rounds):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[rounds * 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def mmh3_long_np(vals: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32(seed=0) of int64 values serialized as 8
    little-endian bytes (two 4-byte blocks, no tail) — the hot path for
    bucketing int/long/date/timestamp columns: whole Arrow batches in a
    handful of numpy column ops. Returns int32 (signed, Java parity)."""
    v = vals.astype(np.int64).view(np.uint64)
    k1 = (v & np.uint64(_M32)).astype(np.uint32)
    k2 = (v >> np.uint64(32)).astype(np.uint32)
    h = np.zeros(len(v), dtype=np.uint32)
    for k in (k1, k2):
        k = k * np.uint32(_C1)
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * np.uint32(_C2)
        h = h ^ k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h = h ^ np.uint32(8)  # len
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h.view(np.int32)


def bucket_of_long(v: int, n: int) -> int:
    """Iceberg bucket id of a long-serialized value (driver-side twin of
    the vectorized write path)."""
    h = murmur3_32(int(v).to_bytes(8, "little", signed=True))
    return (h & 0x7FFFFFFF) % n


def bucket_of_bytes(data: bytes, n: int) -> int:
    h = murmur3_32(data)
    return (h & 0x7FFFFFFF) % n
