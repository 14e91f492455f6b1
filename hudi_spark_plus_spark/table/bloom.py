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

    @classmethod
    def from_keys(
        cls, keys: Iterable[str], eps: float = DEFAULT_FPP
    ) -> "KeyBloom":
        keys = list(keys)
        bf = cls.sized(len(keys), eps)
        for k in keys:
            bf.add(k)
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

    def might_contain_any(self, pairs: Iterable[tuple[int, int]]) -> bool:
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
