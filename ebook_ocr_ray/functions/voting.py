"""Character-level alignment and weighted voting.

Pure per-line functions re-expressing (not copying) the reference's True
ROVER voting:

- char-level alignment via difflib  /root/reference/src/rover/alignment.py:49-131
- weighted per-position vote        src/rover/alignment.py:134-175
- whole-line vote                   src/rover/alignment.py:178-211
- line-level vote orchestration     src/rover/ensemble.py:50-96

Frozen incidental semantics (required for byte-identity with a serial run):

* the LONGEST candidate text is the alignment base; on length ties,
  dict-insertion order of the sources decides (``max`` keeps the first).
* SequenceMatcher ``insert`` opcodes (extra chars in a non-base text) are
  DROPPED — they map to no base position.
* ``replace`` opcodes align position-by-position; when the base segment is
  longer, the tail positions get a gap for that source.
* vote ties resolve to the earliest-inserted candidate char (``max`` over a
  dict keeps the first key reaching the max).
* the per-position weight is extractor_weight x LINE-level calibrated
  confidence — the per-position 1.0/0.0 marks are bookkeeping only.
"""

from __future__ import annotations

from difflib import SequenceMatcher

from ebook_ocr_ray.config import EXTRACTOR_WEIGHTS
from ebook_ocr_ray.functions.lines import AlignedRow, calibrate_conf

# Per aligned character position: source -> candidate char (None = gap).
CharSlot = dict[str, str | None]


def build_char_table(texts: dict[str, str]) -> list[CharSlot]:
    """Align each source's text against the longest one, producing one
    candidate slot per base-text position (reference alignment.py:49-131).
    """
    present = {src: t for src, t in texts.items() if t}
    if not present:
        return []

    if len(present) == 1:
        (src, text), = present.items()
        return [{src: ch} for ch in text]

    base_src = max(present, key=lambda s: len(present[s]))
    base = present[base_src]
    slots: list[CharSlot] = [{base_src: ch} for ch in base]

    for src, text in present.items():
        if src == base_src:
            continue
        for tag, i1, i2, j1, j2 in SequenceMatcher(None, base, text).get_opcodes():
            if tag == "equal":
                for k in range(i2 - i1):
                    slots[i1 + k][src] = text[j1 + k]
            elif tag == "replace":
                span = min(i2 - i1, j2 - j1)
                for k in range(span):
                    slots[i1 + k][src] = text[j1 + k]
                for k in range(span, i2 - i1):
                    slots[i1 + k][src] = None
            elif tag == "delete":
                for k in range(i2 - i1):
                    slots[i1 + k][src] = None
            # "insert": extra chars outside the base — intentionally dropped.
    return slots


def vote_slot(
    slot: CharSlot,
    line_confs: dict[str, float],
    weights: dict[str, float] | None = None,
) -> tuple[str, float]:
    """Weighted vote for one character position
    (reference alignment.py:134-175). Returns (char, winning_weight);
    an all-gap slot votes to the empty string.
    """
    if weights is None:
        weights = EXTRACTOR_WEIGHTS
    tally: dict[str, float] = {}
    for src, ch in slot.items():
        if ch is None:
            continue
        w = weights.get(src, 1.0) * line_confs.get(src, 0.5)
        tally[ch] = tally.get(ch, 0.0) + w
    if not tally:
        return "", 0.0
    best = max(tally, key=tally.get)   # ties -> first-inserted candidate
    return best, tally[best]


def vote_text(
    slots: list[CharSlot],
    line_confs: dict[str, float],
    weights: dict[str, float] | None = None,
) -> tuple[str, float]:
    """Vote every position and join (reference alignment.py:178-211).
    The returned confidence is the mean winning weight per position.
    """
    if not slots:
        return "", 0.0
    chars: list[str] = []
    total = 0.0
    for slot in slots:
        ch, w = vote_slot(slot, line_confs, weights)
        chars.append(ch)
        total += w
    return "".join(chars), total / len(slots)


def vote_aligned_row(
    row: AlignedRow,
    weights: dict[str, float] | None = None,
) -> tuple[str, list[str], float]:
    """Produce the canonical text for one aligned line
    (reference ensemble.py:50-96).

    Single-source lines pass through with their RAW confidence; multi-source
    lines go through char alignment + voting with per-source CALIBRATED
    line confidences.
    """
    if not row.by_source:
        return "", [], 0.0
    if len(row.by_source) == 1:
        (src, r), = row.by_source.items()
        return r.text, [src], r.conf
    texts = {src: r.text for src, r in row.by_source.items()}
    first = next(iter(texts.values()))
    if all(t == first for t in texts.values()):
        # unanimous sources: char alignment provably returns the input
        # verbatim (every slot holds the same candidate), so skip the
        # O(len^2) SequenceMatcher work — the hot path on clean corpora
        confs = {src: calibrate_conf(r.conf, src) for src, r in row.by_source.items()}
        if weights is None:
            weights = EXTRACTOR_WEIGHTS
        w = sum(weights.get(s, 1.0) * confs.get(s, 0.5) for s in texts)
        return first, list(row.by_source.keys()), w

    confs = {src: calibrate_conf(r.conf, src) for src, r in row.by_source.items()}
    text, conf = vote_text(build_char_table(texts), confs, weights)
    return text, list(row.by_source.keys()), conf
