"""Hash parity with the reference's bloom-filter hashes ([Q-hash]).

Reference (file:line into /root/reference):
- murmur3 -> gotimer_web/pkg/hash/murmur3.go:14-16: `murmur3.Sum32`
  (x86 32-bit, seed 0).
- SHA-1   -> gotimer_web/pkg/hash/sha1.go:17-24: sha1 digest ->
  base32-hex string -> parsed as a base-32 big integer -> low 64 bits.
- bloom   -> gotimer_web/pkg/bloom/fillter.go:10-15: k=2 (the two
  hashes above), m = 2^32 bits, sized for n = 1e6 tasks/day.

Spark's built-in `hash()` is murmur3 x86_32 with seed 42, so exact
reference parity needs these reimplementations (public algorithm /
public Go stdlib behavior). They ship as Arrow-batched pandas UDFs —
the bloom-key path is a tiny fraction of row width, and at scale the
engine's actual dedup is the state-store + MERGE (SURVEY T12), with
these hashes kept for drop-in compatibility with reference bitmaps.
"""

from __future__ import annotations

import base64
import hashlib

import pandas as pd

from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MASK32 = 0xFFFFFFFF
BLOOM_M_BITS = 1 << 32  # fillter.go:12 (m = 2^32)


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (Austin Appleby's public algorithm),
    matching spaolacci/murmur3.Sum32 with seed 0."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK32
    length = len(data)
    rounded = length & ~3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK32
        h = (h * 5 + 0xE6546B64) & _MASK32
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h


def sha1_uint64(s: str) -> int:
    """sha1.go:17-24 exactly: digest -> base32-hex (20 bytes -> 32
    chars, no padding) -> lowercase -> parse base 32 -> low 64 bits."""
    digest = hashlib.sha1(s.encode()).digest()
    b32 = base64.b32hexencode(digest).decode().lower()
    return int(b32, 32) & 0xFFFFFFFFFFFFFFFF


def bloom_positions(key: str, m_bits: int = BLOOM_M_BITS) -> tuple[int, int]:
    """The two k=2 bloom bit positions for a task key."""
    return murmur3_32(key.encode()) % m_bits, sha1_uint64(key) % m_bits


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


@pandas_udf(T.LongType())
def murmur3_32_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: murmur3_32(x.encode()) if x is not None else None)


@pandas_udf(T.LongType())
def sha1_uint64_udf(s: pd.Series) -> pd.Series:
    """Signed-int64 view of the uint64 (LongType has no unsigned)."""
    return s.map(lambda x: _to_signed64(sha1_uint64(x)) if x is not None else None)
