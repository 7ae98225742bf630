"""PDF layout-analysis extraction path.

Pipeline (per document, pure):  char/word boxes -> physical-line clustering
-> same-type overlap pruning -> two-column reading order -> paragraph
continuation merge -> text.   Re-expresses the reference's layout path:

- word->line greedy y-clustering   /root/reference/src/rover/engines/runners.py:89-192
- overlap pruning                  src/layout/reading_order.py:97-142
- reading-order sort               src/layout/reading_order.py:22-65
- continuation merge               src/book_converter/parser/paragraph.py:97-159

Payload format: real PDF decoding libraries (pdfminer et al.) are not in
this container, so the binary payload is a clearly-marked synthetic
container — ``%PDF-1.4`` magic followed by a ``%EBOOKRAY-CHARBOX`` comment
line carrying a JSON word-box layout. ``decode_pdf_words`` is the single
stub seam: swapping in a real pdfminer char-box reader changes nothing
downstream.
"""

from __future__ import annotations

import json

from ebook_ocr_ray.config import (
    SENTENCE_TERMINATORS,
    TITLE_MIN_CHAR_HEIGHT,
    WORD_ROW_TOL,
)
from ebook_ocr_ray.functions.geometry import Region, prune_same_type_overlaps, reading_order
from ebook_ocr_ray.functions.lines import Span, make_span, rows_from_spans

PDF_MAGIC = b"%PDF"
CHARBOX_MARKER = b"%EBOOKRAY-CHARBOX "


def is_pdf_payload(payload: bytes) -> bool:
    """Magic-byte sniff (content-type routing, SURVEY.md M36)."""
    return payload[:4] == PDF_MAGIC


def decode_pdf_words(payload: bytes) -> tuple[float, list[Span]]:
    """Decode the synthetic char-box container into (page_width, word spans).

    STUB SEAM: a production build replaces this with a pdfminer-style char
    extractor; everything after operates on (text, bbox, conf) spans only.

    Raises ValueError for PDF bytes without an embedded char-box layout.
    """
    for line in payload.split(b"\n"):
        if line.startswith(CHARBOX_MARKER):
            doc = json.loads(line[len(CHARBOX_MARKER):].decode("utf-8"))
            spans = [
                make_span(t, x, y, x + w, y + h, 1.0)
                for t, x, y, w, h in doc["words"]
            ]
            return float(doc["w"]), spans
    raise ValueError("PDF payload carries no char-box layout (real PDF decode is stubbed)")


def words_to_line_regions(
    words: list[Span], page_width: float, tol: float = WORD_ROW_TOL
) -> list[Region]:
    """Cluster word boxes into physical lines; words join with single
    spaces (x-ordered). A line whose mean char height reaches
    TITLE_MIN_CHAR_HEIGHT classifies as TITLE, else TEXT.

    Words are split into left/right column sets (box center vs page mid-x)
    BEFORE y-clustering so two-column pages with y-aligned rows don't fuse
    across the gutter — the clustering itself is the reference's greedy
    running-mean algorithm per column.
    """
    mid = page_width / 2.0
    left = [s for s in words if (s.x1 + s.x2) / 2.0 < mid]
    right = [s for s in words if (s.x1 + s.x2) / 2.0 >= mid]
    regions: list[Region] = []
    for column in (left, right):
        for row in rows_from_spans(column, source="layout", tol=tol):
            text = " ".join(s.text for s in row.spans)
            height = sum(s.y2 - s.y1 for s in row.spans) / len(row.spans)
            kind = "TITLE" if height >= TITLE_MIN_CHAR_HEIGHT else "TEXT"
            regions.append(Region(kind, row.bbox, row.conf, text))
    return regions


def _ends_sentence(text: str) -> bool:
    return text.endswith(SENTENCE_TERMINATORS)


def merge_continuation_lines(ordered: list[Region]) -> list[str]:
    """Fold reading-ordered line regions into paragraph blocks:

    - a TITLE line is always its own block
    - a TEXT line continues the previous TEXT block (joined with a single
      space) unless that block already ends in a sentence terminator
    """
    blocks: list[str] = []
    open_text = False
    for region in ordered:
        if region.kind == "TITLE" or not region.text:
            blocks.append(region.text)
            open_text = False
        elif open_text and blocks and not _ends_sentence(blocks[-1]):
            blocks[-1] = blocks[-1] + " " + region.text
        else:
            blocks.append(region.text)
            open_text = True
    return blocks


def extract_pdf_text(payload: bytes) -> tuple[str, int, list[str]]:
    """Full PDF path for one document.
    Returns (text, n_lines, title_texts)."""
    page_width, words = decode_pdf_words(payload)
    regions = words_to_line_regions(words, page_width)
    n_lines = len(regions)
    regions = prune_same_type_overlaps(regions)
    ordered = reading_order(regions, page_width)
    titles = [r.text for r in ordered if r.kind == "TITLE"]
    blocks = merge_continuation_lines(ordered)
    return "\n".join(blocks), n_lines, titles
