"""Text analysis primitives for large-scale training-data pipelines:
tokenization, stopword/quality stats, language-ID heuristic, fingerprints.

All functions are vectorized over a batch (lists/ndarrays in, ndarrays
out) or cheap per-string; regexes are compiled at module import so actor
pools pay the cost once per process.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# Whitespace + BPE-ish word split: letters / digits / single other glyph
TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as by at from".split()
)

# Tiny char-trigram profiles for the language-ID heuristic. Deterministic
# and self-contained (no model downloads in this container).
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "and", "ion", "ent", " th", "er ", "of "),
    "de": ("der", "ein", "ich", "sch", "und", "die", "en ", "ch "),
    "fr": ("les", "ent", "de ", "ion", "que", " le", "es ", "ait"),
    "es": ("de ", "la ", "os ", "ión", "que", "ent", " el", "ado"),
    "zh": ("的", "是", "了", "在", "我", "有", "不", "人"),
}


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text)


def token_stats(text: str) -> tuple[int, int, int]:
    """(n_tokens, n_distinct, stopword_count) over simple whitespace words —
    chosen to be exactly mirrorable in SQL (string_split on single space)."""
    words = text.split(" ") if text else []
    n = len(words)
    distinct = len(set(words))
    stop = sum(1 for w in words if w in STOPWORDS)
    return n, distinct, stop


def quality_score(text: str) -> float:
    """Boilerplate/quality heuristic in [0, 1]: rewards sentence-like
    length, some stopword mass, and mostly-alphabetic content; penalizes
    char-run noise (the analog of the reference garbage rules expressed as
    a soft score)."""
    if not text:
        return 0.0
    n_chars = len(text)
    words = text.split(" ")
    n_words = len(words)
    alpha = sum(ch.isalpha() or ch.isspace() for ch in text) / n_chars
    stop_ratio = sum(1 for w in words if w in STOPWORDS) / n_words
    length_term = min(n_words / 50.0, 1.0)
    run_penalty = 0.5 if re.search(r"(.)\1{4}", text) else 0.0
    score = 0.4 * length_term + 0.3 * alpha + 0.3 * min(stop_ratio * 4, 1.0) - run_penalty
    return max(0.0, min(1.0, score))


def detect_language(text: str) -> tuple[str, float]:
    """Char-trigram profile overlap; returns (lang, confidence)."""
    if not text:
        return "und", 0.0
    sample = text[:512].lower()
    best_lang, best_hits = "und", 0
    for lang, grams in _LANG_PROFILES.items():
        hits = sum(sample.count(g) for g in grams)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    total = max(1, len(sample) // 3)
    return best_lang, min(1.0, best_hits / total * 3)


_ROLL_BASE = 1000003
_ROLL_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str) -> int:
    """Karp-Rabin polynomial rolling hash of the whole text (document
    fingerprint; order-sensitive unlike a bag-of-words hash)."""
    h = 0
    for ch in text:
        h = (h * _ROLL_BASE + ord(ch)) % _ROLL_MOD
    return h


def md5_fingerprint(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def word_shingles(text: str, k: int = 3) -> list[str]:
    """Empty / whitespace-only text yields NO shingles (so the sketch
    sentinels — minhash all-max, simhash 0 — actually fire and empty docs
    never become LSH candidates of each other)."""
    words = text.split(" ") if text and text.strip() else []
    if not words:
        return []
    if len(words) < k:
        return [" ".join(words)]
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


def stable_hash64(s: str) -> int:
    """THE canonical stable 64-bit string hash of this codebase: md5
    first-8-bytes little-endian (never Python's salted hash). Every SQL
    oracle's md5 CTE mirrors exactly this expression — all sketches
    (minhash shingles, simhash, HLL) must route through it so the
    Python/SQL pair can never drift."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def stable_hash63(s: str) -> int:
    """THE 63-bit string surrogate for int64 hash-partition keys:
    stable_hash64 with the sign bit cleared. Every operator that routes
    a string key through an int64 shuffle (url dedup, crawl history,
    shingle rows, boilerplate lines, decontam shingles, link keys, span
    hashes, ...) calls this one helper so the mask/hash can never drift
    between operators."""
    return stable_hash64(s) & ((1 << 63) - 1)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Stable 64-bit hashes of k-word shingles."""
    hs = [stable_hash64(s) for s in word_shingles(text, k)]
    return np.array(hs, dtype=np.uint64) if hs else np.empty(0, dtype=np.uint64)


# --- extraction-quality floor (fallback chain) -----------------------------

_WORDISH_RE = re.compile(r"[぀-ゟ゠-ヿ一-鿿\w]")


def non_char_ratio(text: str) -> float:
    """Fraction of characters that are neither word characters nor CJK
    (the reference's non-text ratio, src/layout_ocr_utils.py:33-47):
    garbage payloads decode to mostly punctuation/replacement chars."""
    if not text:
        return 0.0
    return 1.0 - len(_WORDISH_RE.findall(text)) / len(text)


def is_low_quality(
    text: str, min_length: int = 10, max_non_char_ratio: float = 0.5
) -> bool:
    """Quality floor for extracted text (src/layout_ocr_utils.py:49-66):
    empty/whitespace-only, shorter than ``min_length`` after strip, or
    more than ``max_non_char_ratio`` non-word characters."""
    stripped = text.strip() if text else ""
    if not stripped or len(stripped) < min_length:
        return True
    return non_char_ratio(text) > max_non_char_ratio
