"""Pure-Python XXH64 — Spark-compatible ``xxhash64`` for processes
without a JVM (the Python Data Source batch writer's executors assign
buckets worker-side; ``keygen.bucket_expr`` is
``pmod(xxhash64(_key), buckets)`` JVM-side, and the two MUST agree or a
format-written file would land in a bucket its keys don't hash to,
breaking bucket-pruned merges and point lookups).

Algorithm: the public xxHash64 specification (Yann Collet,
github.com/Cyan4973/xxHash, BSD) — the same spec Spark's
``org.apache.spark.sql.catalyst.expressions.XxHash64`` implements over
a string's UTF-8 bytes with seed 42. Agreement with the JVM expression
is property-tested (tests/test_lake_writer.py).

Throughput note: this is a per-key Python loop — fine for write-path
batches (µs/key against a parquet write that already dominates), and
the write path is the ONLY caller; reads derive buckets from directory
layout and manifests, never by re-hashing.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42  # XxHash64's fixed default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """xxHash64 of ``data``; returns Spark's SIGNED long."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(key: str, buckets: int) -> int:
    """``keygen.bucket_expr`` worker-side: pmod(xxhash64(key), buckets)
    (pmod, not %, so negative hashes land non-negative — Python's %
    already does, but keep the JVM formulation explicit)."""
    return xxh64(key.encode("utf-8")) % buckets
