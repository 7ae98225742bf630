"""Deterministic Bloom filter over hex digests.

The dedup survivor broadcast ships a {sha -> survivor key} dict — fine
while the duplicate-group set fits comfortably in every worker's heap.
At extreme duplicate fractions (mirror-heavy crawls) that dict is itself
corpus-sized; this fixed-size bitset replaces it as the broadcast
membership test, with exactness restored downstream by a keyed
first-wins pass over the (dups + false positives) slice only — see
``pipelines.extraction.dedup_exact(mode="bloom")``.

Hashing uses the digest's own bits (double hashing h1 + i*h2), so the
filter is deterministic across processes and needs no salted state.
"""

from __future__ import annotations

import math

import numpy as np


class BloomFilter:
    def __init__(self, n_bits: int, n_hashes: int):
        if n_bits < 8 or n_hashes < 1:
            raise ValueError("n_bits >= 8 and n_hashes >= 1 required")
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized(cls, n_items: int, fp_rate: float = 0.01) -> "BloomFilter":
        """Standard sizing: m = -n ln p / (ln 2)^2, k = m/n ln 2."""
        n_items = max(1, n_items)
        m = max(8, int(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
        k = max(1, round(m / n_items * math.log(2)))
        return cls(m, k)

    def _positions(self, hex_digest: str) -> list[int]:
        h1 = int(hex_digest[:15], 16)
        h2 = int(hex_digest[15:30], 16) | 1
        return [(h1 + i * h2) % self.n_bits for i in range(self.n_hashes)]

    def _position_matrix(self, digests: list[str]) -> np.ndarray:
        """(len(digests), n_hashes) int64 bit positions, vectorized.
        Residues match ``_positions`` exactly: (h1 + i*h2) mod m ==
        ((h1 mod m) + i*(h2 mod m)) mod m, and reducing mod m FIRST keeps
        every intermediate < (n_hashes+1) * n_bits — int64-safe for any
        realistic filter size."""
        m = self.n_bits
        h1 = np.fromiter((int(d[:15], 16) % m for d in digests), np.int64, len(digests))
        h2 = np.fromiter(((int(d[15:30], 16) | 1) % m for d in digests), np.int64, len(digests))
        i = np.arange(self.n_hashes, dtype=np.int64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % m

    def add_hex(self, digests: list[str]) -> None:
        if not digests:
            return
        pos = self._position_matrix(digests).ravel()
        np.bitwise_or.at(
            self.bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
        )

    def might_contain_hex(self, digests: list[str]) -> np.ndarray:
        if not digests:
            return np.empty(0, dtype=bool)
        pos = self._position_matrix(digests)
        hit = self.bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))
        return (hit != 0).all(axis=1)
