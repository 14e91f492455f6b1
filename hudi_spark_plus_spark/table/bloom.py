"""Per-file record-key Bloom filter — the engine's own key index probe.

Reimplements the capability of the reference's vendored Bloom filter
(BloomFilter.java:31-104) that round 1 left half-done: parquet-native
blooms were WRITTEN (row-group skipping for external readers) but the
engine's own pruning used only bucket + min/max stats — useless for
uniformly-distributed md5 keys, so every merge read ALL live files of an
affected bucket.

Sizing follows the reference exactly (BloomFilter.java:53-57):

    bit_size   = ceil(n * -ln(eps) / ln(2)^2)
    num_hashes = ceil(ln(2) * bit_size / n)

Membership uses standard double hashing (h1 + i*h2 mod bit_size) over
the two 64-bit halves of the key's md5 — pure Python on both the build
and probe side, so no cross-engine hash agreement is needed. Serde is
base64 of the bit array plus the two integers, stored inline in the
manifest ``FileEntry`` (the reference serializes its filter the same
way, BloomFilter.java:92-103).

False positives cost one unnecessary file read; false negatives cannot
occur, so pruning is always safe.
"""

from __future__ import annotations

import base64
import hashlib
import math
from collections.abc import Iterable

import numpy as np

DEFAULT_FPP = 0.01
_LN2 = math.log(2.0)


def _hash_pair(key: str) -> tuple[int, int]:
    d = hashlib.md5(key.encode("utf-8")).digest()
    return (
        int.from_bytes(d[:8], "big"),
        int.from_bytes(d[8:], "big") | 1,  # odd h2: full-cycle stride
    )


class KeyBloom:
    __slots__ = ("bits", "bit_size", "num_hashes")

    def __init__(self, bits: bytearray, bit_size: int, num_hashes: int):
        self.bits = bits
        self.bit_size = bit_size
        self.num_hashes = num_hashes

    # -- build -------------------------------------------------------------

    @classmethod
    def sized(cls, n: int, eps: float = DEFAULT_FPP) -> "KeyBloom":
        """Empty filter sized for ~``n`` keys (BloomFilter.java:53-57);
        lets a builder that knows the count up front (parquet footer
        ``num_rows``) add keys incrementally without materializing them."""
        n = max(1, n)
        bit_size = max(8, math.ceil(n * -math.log(eps) / (_LN2 * _LN2)))
        num_hashes = max(1, math.ceil(_LN2 * bit_size / n))
        return cls(bytearray((bit_size + 7) // 8), bit_size, num_hashes)

    def add(self, key: str) -> None:
        h1, h2 = _hash_pair(key)
        for i in range(self.num_hashes):
            b = (h1 + i * h2) % self.bit_size
            self.bits[b >> 3] |= 1 << (b & 7)

    def bulk_add(self, keys: Iterable[str | None]) -> None:
        """Vectorized ``add`` over a key batch; bit-identical to serial
        adds (OR is commutative). ``None`` keys are skipped. Exactness:
        ``(h1 + i*h2) % m == ((h1 % m) + i*(h2 % m)) % m`` with every
        intermediate ``< num_hashes * m``, so int64 math never wraps
        while ``num_hashes * bit_size < 2**63`` (guarded — absurd
        deserialized geometries fall back to the scalar loop)."""
        ks = [k for k in keys if k is not None]
        if not ks:
            return
        if self.num_hashes * self.bit_size >= 2**63:
            for k in ks:
                self.add(k)
            return
        digests = b"".join(
            hashlib.md5(k.encode("utf-8")).digest() for k in ks
        )
        pairs = (
            np.frombuffer(digests, dtype=">u8")
            .astype(np.uint64)
            .reshape(-1, 2)
        )
        m = np.uint64(self.bit_size)
        base_ = pairs[:, 0] % m
        step = (pairs[:, 1] | np.uint64(1)) % m
        i = np.arange(self.num_hashes, dtype=np.uint64)
        idx = (
            (base_[:, None] + i[None, :] * step[:, None]) % m
        ).ravel()
        bits = np.frombuffer(self.bits, dtype=np.uint8)
        np.bitwise_or.at(
            bits,
            (idx >> np.uint64(3)).astype(np.int64),
            (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8),
        )

    @classmethod
    def from_keys(
        cls, keys: Iterable[str], eps: float = DEFAULT_FPP
    ) -> "KeyBloom":
        keys = list(keys)
        bf = cls.sized(len(keys), eps)
        bf.bulk_add(keys)
        return bf

    # -- probe -------------------------------------------------------------

    def might_contain_hashed(self, pair: tuple[int, int]) -> bool:
        h1, h2 = pair
        for i in range(self.num_hashes):
            b = (h1 + i * h2) % self.bit_size
            if not self.bits[b >> 3] & (1 << (b & 7)):
                return False
        return True

    def might_contain(self, key: str) -> bool:
        return self.might_contain_hashed(_hash_pair(key))

    def might_contain_any(self, pairs) -> bool:
        """Any-key membership probe. Accepts an iterable of hash pairs
        (scalar, short-circuiting) or a ``hash_pairs``/``pairs_array``
        ndarray — the vectorized path, same double-hash math in uint64
        (exact: see ``bulk_add``). The all-miss case — the pruning WIN,
        where every pair must be scanned — is where the vector path
        pays: a capped 200k-key probe against one file drops from ~1 s
        of Python loop to ~15 ms."""
        if isinstance(pairs, np.ndarray):
            if len(pairs) == 0:
                return False
            if self.num_hashes * self.bit_size >= 2**63:
                return any(
                    self.might_contain_hashed((int(a), int(b)))
                    for a, b in pairs
                )
            m = np.uint64(self.bit_size)
            base_ = pairs[:, 0] % m
            step = (pairs[:, 1] | np.uint64(1)) % m
            i = np.arange(self.num_hashes, dtype=np.uint64)
            idx = (base_[:, None] + i[None, :] * step[:, None]) % m
            bits = np.frombuffer(self.bits, dtype=np.uint8)
            probed = (
                bits[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.uint8)
            ) & 1
            return bool(probed.all(axis=1).any())
        return any(self.might_contain_hashed(p) for p in pairs)

    # -- serde (manifest-inline, like BloomFilter.java:92-103) -------------

    def to_b64(self) -> str:
        return (
            f"{self.bit_size}:{self.num_hashes}:"
            + base64.b64encode(bytes(self.bits)).decode("ascii")
        )

    @classmethod
    def from_b64(cls, s: str) -> "KeyBloom":
        bit_size, num_hashes, payload = s.split(":", 2)
        return cls(
            bytearray(base64.b64decode(payload)),
            int(bit_size),
            int(num_hashes),
        )


def hash_key(key: str) -> tuple[int, int]:
    """Public probe-side hash (precompute once per key, probe many
    files)."""
    return _hash_pair(key)


def hash_pairs(keys: Iterable[str]) -> np.ndarray:
    """Bulk probe-side hash: ``(n, 2)`` uint64 array of ``hash_key``
    pairs (h2 already odd). Hash once per key, then probe many files
    through ``might_contain_any``'s vectorized path."""
    ks = list(keys)
    if not ks:
        return np.empty((0, 2), dtype=np.uint64)
    digests = b"".join(hashlib.md5(k.encode("utf-8")).digest() for k in ks)
    arr = (
        np.frombuffer(digests, dtype=">u8").astype(np.uint64).reshape(-1, 2)
    )
    arr[:, 1] |= np.uint64(1)
    return arr


def pairs_array(pairs: Iterable[tuple[int, int]]) -> np.ndarray:
    """Convert precomputed ``hash_key`` tuples to the ndarray form
    ``might_contain_any`` vectorizes over (one conversion, many file
    probes)."""
    ps = list(pairs)
    if not ps:
        return np.empty((0, 2), dtype=np.uint64)
    return np.array(ps, dtype=np.uint64)
