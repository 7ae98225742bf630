"""Span -> row clustering and cross-source row alignment.

Pure, per-document functions. They re-express (not copy) the reference
semantics of:

- garbage span filtering      /root/reference/src/rover/line_processing.py:49-94
- confidence calibration      src/rover/line_processing.py:97-120
- tall-span physical split    src/rover/line_processing.py:123-161
- y-clustering (running mean) src/rover/line_processing.py:164-214
- cross-engine line alignment src/rover/line_processing.py:217-279

These run entirely inside a single row of the Dataset (one document); no
distributed coordination is required, which is the key design point: all
extractor variants' spans for one document live in one Arrow row.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from ebook_ocr_ray.config import (
    CONF_RANGES,
    CROSS_SOURCE_TOL,
    MIN_SPAN_CONF,
    ROW_CLUSTER_TOL,
    TALL_SPAN_GAP,
)


class Span(NamedTuple):
    """A positioned text fragment emitted by one extractor variant.

    Analog of TextWithBox (reference src/rover/engines/core.py:67-78).
    ``yc`` is precomputed at construction (= (y1 + y2) / 2).
    """

    text: str
    x1: float
    y1: float
    x2: float
    y2: float
    conf: float
    yc: float


def make_span(text: str, x1: float, y1: float, x2: float, y2: float, conf: float) -> Span:
    return Span(text, x1, y1, x2, y2, conf, (y1 + y2) / 2.0)


class Row(NamedTuple):
    """One visual row: x-ordered spans from a single source.

    Analog of OCRLine (reference src/rover/line_processing.py:14-36).
    """

    spans: tuple[Span, ...]
    source: str
    yc: float
    conf: float

    @property
    def text(self) -> str:
        return "".join(s.text for s in self.spans)

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        if not self.spans:
            return (0.0, 0.0, 0.0, 0.0)
        return (
            min(s.x1 for s in self.spans),
            min(s.y1 for s in self.spans),
            max(s.x2 for s in self.spans),
            max(s.y2 for s in self.spans),
        )


class AlignedRow(NamedTuple):
    """Rows from several sources judged to be the same line.

    Analog of AlignedLine (reference src/rover/line_processing.py:39-46).
    ``by_source`` preserves insertion order (load-bearing for vote ties).
    """

    by_source: dict[str, Row]
    yc: float


_RUN5 = re.compile(r"(.)\1{4}")
_CJK = re.compile(r"[぀-ヿ一-鿿]")


def is_noise_span(text: str, conf: float, min_conf: float = MIN_SPAN_CONF) -> bool:
    """Five-rule garbage test, semantics identical to the reference
    (src/rover/line_processing.py:49-94):

    1. empty / whitespace-only
    2. confidence below ``min_conf``
    3. no CJK characters and length <= 5 (stray ASCII fragments)
    4. any character repeated >= 5 times consecutively
    5. no alphanumeric character at all (punctuation-only)
    """
    if not text or text.isspace():
        return True
    if conf < min_conf:
        return True
    if len(text) <= 5 and not _CJK.search(text):
        return True
    if len(text) >= 5 and _RUN5.search(text):
        return True
    if not any(ch.isalnum() for ch in text):
        return True
    return False


def drop_noise(spans: list[Span], min_conf: float = MIN_SPAN_CONF) -> list[Span]:
    return [s for s in spans if not is_noise_span(s.text, s.conf, min_conf)]


def calibrate_conf(raw: float, source: str) -> float:
    """Rescale a source's raw confidence to [0, 1] using its known output
    range (reference src/rover/line_processing.py:97-120). Unknown sources
    use the identity range (0, 1). Result is clamped.
    """
    lo, hi = CONF_RANGES.get(source, (0.0, 1.0))
    v = (raw - lo) / (hi - lo)
    return 0.0 if v < 0.0 else 1.0 if v > 1.0 else v


def split_tall_spans(spans: list[Span], gap: float = TALL_SPAN_GAP) -> list[list[Span]]:
    """Split a span list into physical lines wherever the y gap between
    consecutive (y-sorted) spans exceeds ``gap``
    (reference src/rover/line_processing.py:123-161).
    """
    if not spans:
        return []
    ordered = sorted(spans, key=lambda s: s.yc)
    groups: list[list[Span]] = [[ordered[0]]]
    for s in ordered[1:]:
        if s.yc - groups[-1][-1].yc > gap:
            groups.append([s])
        else:
            groups[-1].append(s)
    return groups


def rows_from_spans(spans: list[Span], source: str = "", tol: float = ROW_CLUSTER_TOL) -> list[Row]:
    """Cluster spans into visual rows by y-center with a running-mean
    criterion, then x-sort within each row
    (reference src/rover/line_processing.py:164-214).

    The running mean makes the result order-sensitive on purpose: the
    reference semantics are frozen here so the distributed run stays
    byte-identical to a serial run.
    """
    if not spans:
        return []
    ordered = sorted(spans, key=lambda s: s.yc)
    clusters: list[list[Span]] = [[ordered[0]]]
    for s in ordered[1:]:
        cur = clusters[-1]
        mean_y = sum(t.yc for t in cur) / len(cur)
        if abs(s.yc - mean_y) <= tol:
            cur.append(s)
        else:
            clusters.append([s])
    rows: list[Row] = []
    for cluster in clusters:
        cluster.sort(key=lambda s: s.x1)   # stable: preserves y-order on x ties
        yc = sum(s.yc for s in cluster) / len(cluster)
        conf = sum(s.conf for s in cluster) / len(cluster)
        rows.append(Row(tuple(cluster), source, yc, conf))
    return rows


def align_rows(rows_by_source: dict[str, list[Row]], tol: float = CROSS_SOURCE_TOL) -> list[AlignedRow]:
    """Sweep-align rows across sources by y-center
    (reference src/rover/line_processing.py:217-279).

    All (yc, source, idx) triples are sorted by y; a cluster opens at the
    first unconsumed row and greedily absorbs, per source, the FIRST unused
    row within ``tol`` below the opener. Rows visited inside the window but
    not absorbed (their source already present) are skipped permanently —
    this lossy behavior is part of the frozen reference semantics.
    """
    marks: list[tuple[float, str, int]] = []
    for source, rows in rows_by_source.items():
        for idx, row in enumerate(rows):
            marks.append((row.yc, source, idx))
    marks.sort(key=lambda m: m[0])

    out: list[AlignedRow] = []
    used: set[tuple[str, int]] = set()
    i = 0
    n = len(marks)
    while i < n:
        y0, src0, idx0 = marks[i]
        picked: dict[str, Row] = {src0: rows_by_source[src0][idx0]}
        used.add((src0, idx0))
        y_sum, count = y0, 1
        j = i + 1
        while j < n:
            yj, srcj, idxj = marks[j]
            if yj - y0 > tol:
                break
            if srcj not in picked and (srcj, idxj) not in used:
                picked[srcj] = rows_by_source[srcj][idxj]
                used.add((srcj, idxj))
                y_sum += yj
                count += 1
            j += 1
        out.append(AlignedRow(picked, y_sum / count))
        i = j if j > i + 1 else i + 1
    return out
