"""PDF layout-analysis extraction path.

Pipeline (per document, pure):  char/word boxes -> physical-line clustering
-> same-type overlap pruning -> two-column reading order -> paragraph
continuation merge -> text.   Re-expresses the reference's layout path:

- word->line greedy y-clustering   /root/reference/src/rover/engines/runners.py:89-192
- overlap pruning                  src/layout/reading_order.py:97-142
- reading-order sort               src/layout/reading_order.py:22-65
- continuation merge               src/book_converter/parser/paragraph.py:97-159

Payload decode (``decode_pdf_words``, the single seam) has two branches:

1. the synthetic ``%EBOOKRAY-CHARBOX`` container (a ``%PDF-1.4`` magic +
   JSON word-box comment line) — the test-corpus format, exercising the
   full layout path with exact boxes;
2. a minimal REAL PDF text decoder (``_parse_pdf_text_words``): walks
   UNCOMPRESSED content streams' BT/ET text objects per the public PDF
   1.x spec — Tm / Td / TD / TL / T* positioning, Tf sizing, Tj / ' /
   TJ show operators, literal strings with escapes and balanced parens,
   /MediaBox page geometry — and emits word spans with a fixed 0.5 em
   advance width (no font program in scope; a pdfminer-style extractor
   with true metrics slots into the same seam). Compressed streams and
   image-only PDFs still raise the documented ValueError (the M36
   error-row fallback).
"""

from __future__ import annotations

import json
import re

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
    """Decode a PDF payload into (page_width, word spans): the synthetic
    char-box container when present, else the minimal real text-object
    decoder (module docstring). Everything downstream operates on
    (text, bbox, conf) spans only.

    Raises ValueError for PDF bytes with neither an embedded char-box
    layout nor parseable uncompressed text objects (scanned/image-only
    or compressed-stream PDFs — the documented error-row fallback).
    """
    for line in payload.split(b"\n"):
        if line.startswith(CHARBOX_MARKER):
            doc = json.loads(line[len(CHARBOX_MARKER):].decode("utf-8"))
            spans = [
                make_span(t, x, y, x + w, y + h, 1.0)
                for t, x, y, w, h in doc["words"]
            ]
            return float(doc["w"]), spans
    width, spans = _parse_pdf_text_words(payload)
    if spans:
        return width, spans
    raise ValueError(
        "PDF payload carries no char-box layout and no uncompressed text "
        "objects (image-only or compressed streams)"
    )


# ---- minimal real-PDF text decoder (public PDF 1.x spec subset) -----------

# Average glyph advance as a fraction of the font size — the Helvetica
# ballpark; real metrics would come from the font program, out of scope.
_CHAR_ADVANCE_EM = 0.5

_MEDIABOX_RE = re.compile(rb"/MediaBox\s*\[\s*([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s+([-\d.]+)\s*\]")
_TEXTOBJ_RE = re.compile(rb"(?<![A-Za-z])BT\b(.*?)\bET(?![A-Za-z])", re.DOTALL)
_NUM_BYTES = b"0123456789+-."
_DELIMS = b" \t\r\n()[]/<>"

_STRING_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _pdf_string(buf: bytes, i: int) -> tuple[str, int]:
    """Parse a literal string starting at buf[i] == '(': backslash
    escapes (incl. 1-3 digit octal), balanced nested parentheses.
    Returns (text, index past the closing paren). Bytes decode latin-1
    (the StandardEncoding approximation for the ASCII range)."""
    assert buf[i:i + 1] == b"("
    out: list[str] = []
    depth, j, n = 1, i + 1, len(buf)
    while j < n and depth:
        c = buf[j:j + 1]
        if c == b"\\":
            nxt = buf[j + 1:j + 2]
            if nxt in _STRING_ESCAPES:
                out.append(_STRING_ESCAPES[nxt])
                j += 2
            elif nxt and nxt in b"01234567":   # 1-3 digit OCTAL (not \8/\9:
                k = j + 1                      # int(..., 8) would raise and
                while k < min(j + 4, n) and buf[k:k + 1] in b"01234567":
                    k += 1                     # poison the whole document)
                out.append(chr(int(buf[j + 1:k], 8)))
                j = k
            elif nxt in (b"\n", b"\r"):
                # line continuation: backslash + EOL both drop (spec
                # 7.3.4.2) — keeping the newline would split a word
                # continued across lines into two words
                j += 2
                if nxt == b"\r" and buf[j:j + 1] == b"\n":
                    j += 1
            else:  # invalid escape: drop the backslash, keep the char
                j += 1
        elif c == b"(":
            depth += 1
            out.append("(")
            j += 1
        elif c == b")":
            depth -= 1
            if depth:
                out.append(")")
            j += 1
        else:
            out.append(c.decode("latin-1"))
            j += 1
    return "".join(out), j


def _content_tokens(buf: bytes):
    """(kind, value) stream over a text object's content: 'str', 'num',
    'name', 'arr_open'/'arr_close', 'op'."""
    i, n = 0, len(buf)
    while i < n:
        c = buf[i:i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"(":
            s, i = _pdf_string(buf, i)
            yield ("str", s)
        elif c == b"[":
            yield ("arr_open", None)
            i += 1
        elif c == b"]":
            yield ("arr_close", None)
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and buf[j:j + 1] not in _DELIMS:
                j += 1
            yield ("name", buf[i:j].decode("latin-1"))
            i = j
        elif c in _NUM_BYTES:
            j = i
            while j < n and buf[j:j + 1] in _NUM_BYTES:
                j += 1
            try:
                yield ("num", float(buf[i:j]))
            except ValueError:
                pass
            i = j
        else:
            j = i + 1
            while j < n and buf[j:j + 1] not in _DELIMS and buf[j:j + 1] not in _NUM_BYTES:
                j += 1
            yield ("op", buf[i:j].decode("latin-1"))
            i = j


def _parse_pdf_text_words(payload: bytes) -> tuple[float, list[Span]]:
    """Interpret every BT/ET text object in the raw bytes (uncompressed
    streams only — FlateDecode bodies simply contain no parseable BT/ET
    and fall through to the ValueError). PDF user space is y-up; spans
    are emitted y-DOWN (top-origin) to match the layout kernels, using
    the MediaBox height (letter-size default when absent).

    Multi-page handling: each ``stream...endstream`` body is treated as
    one page and its spans are y-offset by a running page counter, so
    pages stack in document order instead of interleaving into one
    coordinate space (a 2-page document previously merged both pages'
    words into shared rows). Approximation: a page whose /Contents is an
    ARRAY of streams renders as consecutive page slabs — words stay in
    document order, they just never merge across stream boundaries.
    Without full object-graph resolution (out of scope for the
    uncompressed-text seam) the per-stream split is the documented
    page-accurate behavior for the 1-stream-per-page common case.
    Remaining approximation: reading_order's column split is global, so
    a TWO-column multi-page document emits all pages' left columns
    before any right column; single-column multi-page text (the common
    text-PDF case) is fully ordered. Per-page column ordering needs the
    page boundary carried through the span seam — the pdfminer-style
    replacement that slots in here would provide it."""
    m = _MEDIABOX_RE.search(payload)
    if m:
        x0, y0, x1, y1 = (float(v) for v in m.groups())
        page_w, page_h = x1 - x0, y1 - y0
    else:
        page_w, page_h = 612.0, 792.0

    bodies = [b.group(1) for b in _STREAM_RE.finditer(payload)]
    if not bodies:            # bare content (no stream wrappers): one page
        bodies = [payload]

    spans: list[Span] = []
    for page_no, body in enumerate(bodies):
        _scan_text_objects(body, page_h, page_no * page_h, spans)
    return page_w, spans


_STREAM_RE = re.compile(rb"\bstream\r?\n(.*?)endstream", re.DOTALL)


def _scan_text_objects(
    payload: bytes, page_h: float, y_base: float, spans: list[Span]
) -> None:
    for tobj in _TEXTOBJ_RE.finditer(payload):
        size, leading = 12.0, 0.0
        lx, ly = 0.0, 0.0          # line origin
        x, y = 0.0, 0.0            # cursor
        stack: list = []           # operand stack
        in_array: bool = False
        array_items: list = []

        def show(s: str) -> None:
            nonlocal x
            cw = _CHAR_ADVANCE_EM * size
            for w in re.finditer(r"\S+", s):
                wx = x + w.start() * cw
                spans.append(
                    make_span(
                        w.group(),
                        wx,
                        y_base + page_h - y - size,
                        wx + len(w.group()) * cw,
                        y_base + page_h - y,
                        1.0,
                    )
                )
            x += len(s) * cw

        for kind, val in _content_tokens(tobj.group(1)):
            if kind == "arr_open":
                in_array, array_items = True, []
            elif kind == "arr_close":
                in_array = False
                stack.append(array_items)
            elif kind in ("num", "str", "name"):
                (array_items if in_array else stack).append(val)
            elif kind == "op":
                op = val
                if op == "Tf" and stack:
                    size = float(stack[-1])
                elif op == "Tm" and len(stack) >= 6:
                    lx, ly = float(stack[-2]), float(stack[-1])
                    x, y = lx, ly
                elif op in ("Td", "TD") and len(stack) >= 2:
                    tx, ty = float(stack[-2]), float(stack[-1])
                    lx, ly = lx + tx, ly + ty
                    x, y = lx, ly
                    if op == "TD":
                        leading = -ty
                elif op == "TL" and stack:
                    leading = float(stack[-1])
                elif op == "T*":
                    ly -= leading
                    x, y = lx, ly
                elif op == "Tj" and stack and isinstance(stack[-1], str):
                    show(stack[-1])
                elif op == "'" and stack and isinstance(stack[-1], str):
                    ly -= leading
                    x, y = lx, ly
                    show(stack[-1])
                elif op == "TJ" and stack and isinstance(stack[-1], list):
                    for item in stack[-1]:
                        if isinstance(item, str):
                            show(item)
                        else:  # kerning adjustment, thousandths of an em
                            x -= float(item) / 1000.0 * size
                stack = []


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
