"""Region geometry tests: both overlap metrics, pruning, NMS, reading order
(reference /root/reference/src/layout/reading_order.py,
src/ocr_ensemble/voting.py:50-74, tests/test_reading_order.py)."""

from ebook_ocr_ray.functions.geometry import (
    Region,
    center_in,
    contains,
    iou,
    nms_by_confidence,
    overlap_to_smaller,
    prune_same_type_overlaps,
    reading_order,
)


class TestOverlapMetrics:
    def test_contained_box_min_area_is_one(self):
        outer, inner = (0, 0, 100, 100), (10, 10, 20, 20)
        assert overlap_to_smaller(outer, inner) == 1.0
        assert iou(outer, inner) < 0.02            # true IoU is tiny

    def test_disjoint_zero(self):
        assert overlap_to_smaller((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0
        assert iou((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0

    def test_half_overlap(self):
        a, b = (0, 0, 10, 10), (5, 0, 15, 10)
        assert abs(overlap_to_smaller(a, b) - 0.5) < 1e-9
        assert abs(iou(a, b) - 1 / 3) < 1e-9

    def test_contains_and_center(self):
        assert contains((0, 0, 10, 10), (2, 2, 8, 8))
        assert not contains((0, 0, 10, 10), (2, 2, 12, 8))
        assert center_in((0, 0, 10, 10), (4, 4, 14, 14))       # center (9,9) inside
        assert not center_in((0, 0, 10, 10), (9, 9, 15, 15))   # center (12,12) outside


class TestPruning:
    def test_same_type_overlap_drops_lower_conf(self):
        regions = [
            Region("TEXT", (0, 0, 10, 10), 0.9, "keep"),
            Region("TEXT", (1, 1, 9, 9), 0.5, "drop"),
        ]
        kept = prune_same_type_overlaps(regions)
        assert [r.text for r in kept] == ["keep"]

    def test_different_types_never_pruned(self):
        regions = [
            Region("TEXT", (0, 0, 10, 10), 0.9, "a"),
            Region("FIGURE", (0, 0, 10, 10), 0.1, "b"),
        ]
        assert len(prune_same_type_overlaps(regions)) == 2

    def test_threshold_boundary(self):
        # exactly 0.5 overlap (to smaller) -> pruned
        regions = [
            Region("TEXT", (0, 0, 10, 10), 0.9, "a"),
            Region("TEXT", (5, 0, 15, 10), 0.5, "b"),
        ]
        assert len(prune_same_type_overlaps(regions)) == 1

    def test_nms_true_iou(self):
        regions = [
            Region("TEXT", (0, 0, 10, 10), 0.5, "low"),
            Region("TEXT", (0, 0, 10, 11), 0.9, "high"),
            Region("TEXT", (50, 50, 60, 60), 0.1, "far"),
        ]
        kept = nms_by_confidence(regions)
        assert [r.text for r in kept] == ["high", "far"]


class TestReadingOrder:
    def test_two_columns_left_then_right(self):
        regions = [
            Region("TEXT", (600, 100, 900, 120), 1.0, "R1"),
            Region("TEXT", (50, 200, 400, 220), 1.0, "L2"),
            Region("TEXT", (50, 100, 400, 120), 1.0, "L1"),
            Region("TEXT", (600, 200, 900, 220), 1.0, "R2"),
        ]
        ordered = reading_order(regions, 1000)
        assert [r.text for r in ordered] == ["L1", "L2", "R1", "R2"]

    def test_title_before_text_same_y(self):
        regions = [
            Region("TEXT", (50, 100, 400, 120), 1.0, "body"),
            Region("TITLE", (50, 100, 400, 130), 1.0, "title"),
        ]
        ordered = reading_order(regions, 1000)
        assert [r.text for r in ordered] == ["title", "body"]

    def test_x_breaks_remaining_ties(self):
        regions = [
            Region("TEXT", (200, 100, 260, 110), 1.0, "b"),
            Region("TEXT", (50, 100, 110, 110), 1.0, "a"),
        ]
        assert [r.text for r in reading_order(regions, 1000)] == ["a", "b"]
