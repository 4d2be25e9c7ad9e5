"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` on string columns.

The materialized search index hash-partitions its postings and vocab on
``pmod(xxhash64(token), N_BUCKETS)``. Serving a term query therefore needs
the BUCKET IDS of a handful of literal query terms — query *planning*, not
data processing. Computing them with a Spark job (createDataFrame +
collect) costs a full job launch per query; this module computes the exact
same buckets driver-side in microseconds, the way a real search engine
resolves its term-dictionary segment without touching the cluster.

Spark's ``xxhash64`` over a STRING column is XXH64 (Yann Collet's xxHash,
public spec) over the UTF-8 bytes with seed 42, returned as a SIGNED
64-bit long; ``pmod`` then maps it to a non-negative bucket. Parity with
the JVM implementation is pinned by ``tests/test_bucketing.py``
(every fixture vocab token + adversarial lengths 0..40 covering all three
tail paths).
"""

from __future__ import annotations

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

#: Spark's seed for xxhash64 (Murmur3's sibling; XxHash64Function.seed).
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Reference XXH64 over ``data`` — unsigned 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(string_col)`` twin: SIGNED 64-bit, UTF-8 bytes."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_bucket(s: str, n_buckets: int) -> int:
    """``pmod(xxhash64(s), n_buckets)`` twin (non-negative bucket id)."""
    return xxhash64_str(s) % n_buckets


def xxhash64_long(v: int, seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(long_col)`` twin: Spark hashes the value as one
    8-byte little-endian word (XxHash64.hashLong)."""
    import struct

    h = xxh64(struct.pack("<q", v), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_bucket_long(v: int, n_buckets: int) -> int:
    """``pmod(xxhash64(long), n_buckets)`` twin (doc-bucket pruning)."""
    return xxhash64_long(v) % n_buckets
