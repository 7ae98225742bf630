"""Region geometry: overlap metrics, pruning, reading order.

Pure functions for the PDF/layout path. Re-expresses (not copies):

- overlap ratio to the SMALLER area  /root/reference/src/layout/reading_order.py:68-94
- true IoU (union denominator)       src/ocr_ensemble/voting.py:50-74
- same-type overlap pruning >= 0.5   src/layout/reading_order.py:97-142
- confidence-greedy NMS              src/ocr_integrated_utils.py:24-60
- two-column reading-order sort      src/layout/reading_order.py:22-65

NOTE: the reference deliberately uses TWO different overlap metrics; both
are preserved under distinct names.
"""

from __future__ import annotations

from typing import NamedTuple

from ebook_ocr_ray.config import OVERLAP_PRUNE_THRESHOLD, REGION_TYPE_RANK

BBox = tuple[float, float, float, float]


class Region(NamedTuple):
    kind: str        # TITLE | TEXT | CAPTION | FOOTNOTE | FIGURE | ...
    bbox: BBox
    conf: float
    text: str = ""


def _intersection(a: BBox, b: BBox) -> float:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    if x1 >= x2 or y1 >= y2:
        return 0.0
    return (x2 - x1) * (y2 - y1)


def _area(b: BBox) -> float:
    return (b[2] - b[0]) * (b[3] - b[1])


def overlap_to_smaller(a: BBox, b: BBox) -> float:
    """intersection / min(area) — 1.0 when one box contains the other
    (reference reading_order.py:68-94)."""
    inter = _intersection(a, b)
    if inter == 0.0:
        return 0.0
    return inter / min(_area(a), _area(b))


def iou(a: BBox, b: BBox) -> float:
    """Standard intersection-over-union (reference voting.py:50-74)."""
    inter = _intersection(a, b)
    if inter == 0.0:
        return 0.0
    return inter / (_area(a) + _area(b) - inter)


def contains(outer: BBox, inner: BBox) -> bool:
    return (
        outer[0] <= inner[0]
        and outer[1] <= inner[1]
        and outer[2] >= inner[2]
        and outer[3] >= inner[3]
    )


def center_in(bbox: BBox, point_box: BBox) -> bool:
    """Is the CENTER of ``point_box`` inside ``bbox``? (reference
    src/rover/engines/core.py:98-196 figure-mask test)."""
    cx = (point_box[0] + point_box[2]) / 2.0
    cy = (point_box[1] + point_box[3]) / 2.0
    return bbox[0] <= cx <= bbox[2] and bbox[1] <= cy <= bbox[3]


def prune_same_type_overlaps(
    regions: list[Region], threshold: float = OVERLAP_PRUNE_THRESHOLD
) -> list[Region]:
    """Drop the lower-confidence region of any SAME-type pair overlapping by
    >= threshold (min-area metric). Pairwise scan in input order with the
    reference's exact keep/remove bookkeeping (reading_order.py:97-142).
    """
    if not regions:
        return []
    removed: set[int] = set()
    kept: list[Region] = []
    for i, a in enumerate(regions):
        if i in removed:
            continue
        keep = True
        for j in range(i + 1, len(regions)):
            if j in removed:
                continue
            b = regions[j]
            if a.kind != b.kind:
                continue
            if overlap_to_smaller(a.bbox, b.bbox) >= threshold:
                if a.conf < b.conf:
                    keep = False
                    removed.add(i)
                    break
                removed.add(j)
        if keep:
            kept.append(a)
    return kept


def nms_by_confidence(regions: list[Region], iou_threshold: float = 0.5) -> list[Region]:
    """Greedy NMS: highest confidence first, suppress any remaining region
    with true-IoU > threshold (reference ocr_integrated_utils.py:24-60)."""
    ordered = sorted(regions, key=lambda r: r.conf, reverse=True)
    kept: list[Region] = []
    for cand in ordered:
        if all(iou(cand.bbox, k.bbox) <= iou_threshold for k in kept):
            kept.append(cand)
    return kept


def reading_order(regions: list[Region], page_width: float) -> list[Region]:
    """Two-column reading order (reference reading_order.py:22-65):
    split at mid-x by box center, sort each column by (y1, type rank, x1),
    emit left column then right column.
    """
    if not regions:
        return []
    mid = page_width / 2.0
    left = [r for r in regions if (r.bbox[0] + r.bbox[2]) / 2.0 < mid]
    right = [r for r in regions if (r.bbox[0] + r.bbox[2]) / 2.0 >= mid]

    def key(r: Region) -> tuple[float, int, float]:
        return (r.bbox[1], REGION_TYPE_RANK.get(r.kind, 99), r.bbox[0])

    return sorted(left, key=key) + sorted(right, key=key)
