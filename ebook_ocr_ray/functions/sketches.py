"""Mergeable dedup sketches: MinHash (+LSH banding) and SimHash.

Vectorized with numpy; all hash seeds are fixed constants so signatures
are reproducible at any parallelism. Designed for the canonical Ray Data
near-dup flow: signature per doc inside map_batches -> explode (band_id,
band_key, doc_id) rows -> groupby band -> candidate pairs -> verify exact
Jaccard -> connected components.
"""

from __future__ import annotations

import numpy as np

from ebook_ocr_ray.functions.textstats import shingle_hashes, word_shingles

# Mersenne prime 2^31-1: with a, b, x < p the product a*x < 2^62 fits
# uint64 EXACTLY, so (a*x + b) mod p is computed without silent 2^64
# wraparound and the universal-hash pairwise-independence bound (and with
# it the LSH S-curve analysis) actually holds. A 2^61-1 modulus would
# overflow uint64 in the multiply and void the guarantee.
_MERSENNE = (1 << 31) - 1
NUM_PERM = 64
# 16 bands x 4 rows: candidate-probability S-curve crosses 0.5 at jaccard
# ~(1/16)^(1/4) ~= 0.5, so 0.7-similar pairs are caught with P > 0.999
LSH_BANDS = 16
LSH_ROWS = NUM_PERM // LSH_BANDS

_rng = np.random.RandomState(42)
_A = _rng.randint(1, _MERSENNE, size=NUM_PERM).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=NUM_PERM).astype(np.uint64)


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64-perm MinHash over k-word shingles (universal hashing
    (a*x + b) mod p, exact in uint64). Empty text -> all-max sentinel."""
    hs = shingle_hashes(text, k)
    if hs.size == 0:
        return np.full(NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = hs % np.uint64(_MERSENNE)
    # (P, S) matrix; every term < 2^62 so no uint64 overflow occurs
    prod = (_A[:, None] * x[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def lsh_band_keys(signature: np.ndarray) -> list[tuple[int, int]]:
    """(band_id, band_key) pairs; docs sharing any pair are candidates."""
    out = []
    for b in range(LSH_BANDS):
        chunk = signature[b * LSH_ROWS:(b + 1) * LSH_ROWS]
        key = 0
        for v in chunk:
            key = (key * 1000003 + int(v)) % (1 << 63)
        out.append((b, key))
    return out


def minhash_signatures_batch(texts: list, k: int = 3) -> np.ndarray:
    """(n_docs, NUM_PERM) uint64 signatures, row-identical to
    ``minhash_signature`` per text (empty/whitespace rows get the all-max
    sentinel). One concatenated hash array + ``np.minimum.reduceat``
    segment-min replaces the per-doc permutation matmul — the per-batch
    vectorization the hot signature stage needs at corpus scale."""
    from ebook_ocr_ray.functions.textstats import shingle_hashes

    per_doc = [shingle_hashes(t, k) if t else np.empty(0, np.uint64) for t in texts]
    lens = np.array([h.size for h in per_doc], dtype=np.int64)
    out = np.full((len(texts), NUM_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonzero = lens > 0
    if not nonzero.any():
        return out
    allh = np.concatenate([h for h in per_doc if h.size])
    x = allh % np.uint64(_MERSENNE)
    prod = (_A[:, None] * x[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    nz = lens[nonzero]
    offsets = np.concatenate([[0], np.cumsum(nz)[:-1]])
    out[nonzero] = np.minimum.reduceat(prod, offsets, axis=1).T
    return out


_MOD63 = np.uint64((1 << 63) - 1)


def lsh_band_keys_batch(sigs: np.ndarray) -> np.ndarray:
    """(n_docs, LSH_BANDS) int64 band keys, value-identical to
    ``lsh_band_keys`` per row. The fold runs in uint64 with a final
    ``& (2^63 - 1)``: wraparound mod 2^64 then mod 2^63 equals plain
    mod 2^63 because 2^63 divides 2^64 — so the vectorized arithmetic
    reproduces the arbitrary-precision Python fold bit for bit."""
    n = sigs.shape[0]
    keys = np.empty((n, LSH_BANDS), dtype=np.uint64)
    m = np.uint64(1000003)
    for b in range(LSH_BANDS):
        key = np.zeros(n, dtype=np.uint64)
        for r in range(LSH_ROWS):
            key = (key * m + sigs[:, b * LSH_ROWS + r]) & _MOD63
        keys[:, b] = key
    return keys.astype(np.int64)


def simhash64_batch(texts: list) -> np.ndarray:
    """(n_docs,) uint64 prints, value-identical to ``simhash64`` per text
    (empty rows -> 0). Segment-sum (``np.add.reduceat``) over one
    concatenated bit matrix instead of a per-doc tally."""
    from ebook_ocr_ray.functions.textstats import shingle_hashes

    per_doc = [shingle_hashes(t, 2) if t else np.empty(0, np.uint64) for t in texts]
    lens = np.array([h.size for h in per_doc], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    nonzero = lens > 0
    if not nonzero.any():
        return out
    allh = np.concatenate([h for h in per_doc if h.size])
    # int32 bit matrix (segment sums stay well under 2^31) and the
    # identity sum(2b-1) == 2*sum(b) - n avoid materializing a second
    # full-size +-1 array — halves peak memory on payload-heavy batches
    bits = ((allh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
    nz = lens[nonzero]
    offsets = np.concatenate([[0], np.cumsum(nz)[:-1]])
    tally = 2 * np.add.reduceat(bits, offsets, axis=0) - nz[:, None]   # (D, 64)
    out[nonzero] = ((tally > 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    return out


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-word-shingle Jaccard (the verify step after LSH blocking)."""
    sa, sb = set(word_shingles(text_a, k)), set(word_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def simhash64(text: str) -> int:
    """64-bit SimHash over word-shingle features (charikar): each feature's
    stable hash votes +1/-1 per bit; sign of the tally forms the print."""
    hs = shingle_hashes(text, k=2)
    if hs.size == 0:
        return 0
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    tally = (2 * bits - 1).sum(axis=0)
    return int(((tally > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(print64: int, tables: int = 4) -> list[tuple[int, int]]:
    """Split the 64-bit print into ``tables`` equal bands; prints within
    hamming distance <= tables-1 are GUARANTEED to share at least one
    identical band (pigeonhole). Callers must size tables >= threshold+1
    or accept probabilistic recall beyond that distance."""
    width = 64 // tables
    mask = (1 << width) - 1
    return [(t, (print64 >> (width * t)) & mask) for t in range(tables)]


# --- HyperLogLog distinct-count sketch (mergeable; exact-oracle form) -----

HLL_P = 12
HLL_M = 1 << HLL_P                    # 4096 registers
_HLL_REST_BITS = 64 - HLL_P           # 52 rank bits
_HLL_REST_MASK = (1 << _HLL_REST_BITS) - 1
# Flajolet et al.'s bias constant for m >= 128, precomputed so the SQL
# oracle can embed the identical double literal
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_partial(values: list[str]) -> np.ndarray:
    """(HLL_M,) uint8 register array over a batch of string values —
    md5-prefix hash (same stable 64-bit hash as the other sketches),
    top HLL_P bits pick the register, rank = leading-zero count of the
    remaining bits + 1. Registers from different batches merge with
    elementwise max, so the sketch composes with a keyed Max aggregate."""
    from ebook_ocr_ray.functions.textstats import stable_hash64

    regs = np.zeros(HLL_M, dtype=np.uint8)
    for v in values:
        h = stable_hash64(v)
        bucket = h >> _HLL_REST_BITS
        rank = _HLL_REST_BITS - (h & _HLL_REST_MASK).bit_length() + 1
        if rank > regs[bucket]:
            regs[bucket] = rank
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    """Deterministic integer estimate. The harmonic sum is computed as an
    EXACT integer (sum of 2^(64-reg), each a power of two) so no float
    summation order exists to drift; the single final division and the
    small-range linear-counting branch use the same double ops the SQL
    oracle performs. Large-range correction is omitted (irrelevant below
    ~2^57 distinct values)."""
    import math

    s_int = sum(1 << (64 - int(r)) for r in regs)
    e = HLL_ALPHA * HLL_M * HLL_M * 18446744073709551616.0 / float(s_int)
    v = int((regs == 0).sum())
    if e <= 2.5 * HLL_M and v > 0:
        e = HLL_M * math.log(HLL_M / v)
    return int(math.floor(e))
