"""Per-document ensemble merge: spans from N extractor variants -> one
canonical text.

Re-expresses rover_merge (/root/reference/src/rover/ensemble.py:99-169) as a
pure function over one document's span sets. Because every variant's output
for a document lives in the same Arrow row, the whole merge is row-local —
no distributed voting, no shuffle.

Deviation from the reference, documented: the reference's gaps_filled
counter can never fire (its aligned-line dict never stores None for an
absent engine, see ensemble.py:156-158), so it is constantly 0. Here a gap
is counted whenever a voted line has no contribution from the primary
extractor — the metric the counter was clearly meant to capture.
"""

from __future__ import annotations

from typing import NamedTuple

from ebook_ocr_ray.config import (
    CROSS_SOURCE_TOL,
    EXTRACTOR_WEIGHTS,
    MIN_SPAN_CONF,
    PRIMARY_EXTRACTOR,
)
from ebook_ocr_ray.functions.lines import Span, align_rows, drop_noise, rows_from_spans
from ebook_ocr_ray.functions.voting import vote_aligned_row


class MergedDoc(NamedTuple):
    text: str
    lines: list[str]
    contributions: dict[str, int]   # extractor -> voted-line count
    gaps_filled: int                # voted lines with no primary contribution
    agreement: float                # mean pairwise whole-doc similarity


def agreement_score(doc_texts: dict[str, str]) -> float:
    """Mean pairwise SequenceMatcher ratio between the extractors'
    whole-document texts — the cheap doc-level consensus metric from the
    reference's older voting path (src/ocr_ensemble/voting.py:143-253),
    kept as a quality column. Identical texts short-circuit to 1.0."""
    from difflib import SequenceMatcher

    names = [n for n, t in doc_texts.items() if t]
    if len(names) < 2:
        return 1.0 if names else 0.0
    total, pairs = 0.0, 0
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = doc_texts[names[i]], doc_texts[names[j]]
            total += 1.0 if a == b else SequenceMatcher(None, a, b).ratio()
            pairs += 1
    return total / pairs


def merge_sources(
    source_spans: dict[str, list[Span]],
    weights: dict[str, float] | None = None,
    primary: str = PRIMARY_EXTRACTOR,
    min_conf: float = MIN_SPAN_CONF,
    align_tol: float = CROSS_SOURCE_TOL,
) -> MergedDoc:
    """Noise-filter each variant's spans, cluster into rows, align rows
    across variants, vote each aligned line, join with newlines."""
    if weights is None:
        weights = EXTRACTOR_WEIGHTS

    rows_by_source = {}
    for source, spans in source_spans.items():
        kept = drop_noise(spans, min_conf)
        if kept:
            rows_by_source[source] = rows_from_spans(kept, source)

    contributions = {source: 0 for source in source_spans}
    if not rows_by_source:
        return MergedDoc("", [], contributions, 0, 0.0)

    lines: list[str] = []
    gaps = 0
    for aligned in align_rows(rows_by_source, align_tol):
        text, sources, _conf = vote_aligned_row(aligned, weights)
        if not text:
            continue
        lines.append(text)
        for source in sources:
            contributions[source] = contributions.get(source, 0) + 1
        if primary not in aligned.by_source:
            gaps += 1

    per_source_text = {
        source: "\n".join(r.text for r in rows) for source, rows in rows_by_source.items()
    }
    return MergedDoc(
        "\n".join(lines), lines, contributions, gaps, agreement_score(per_source_text)
    )
