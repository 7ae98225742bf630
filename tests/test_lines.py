"""Unit tests for span clustering / alignment / garbage rules.

Numeric boundary cases mirror the reference's test intent
(/root/reference/tests/test_ocr_rover.py, test_rover.py:20-38):
y-cluster tolerance 20, cross-source tolerance 30, tall-span gap 15,
confidence calibration ranges, garbage truth table.
"""

from ebook_ocr_ray.functions.lines import (
    align_rows,
    calibrate_conf,
    drop_noise,
    is_noise_span,
    make_span,
    rows_from_spans,
    split_tall_spans,
)


def sp(text, y, x=0.0, conf=1.0, h=10.0):
    return make_span(text, x, y - h / 2, x + 8.0 * len(text), y + h / 2, conf)


class TestGarbageRules:
    def test_empty_and_whitespace(self):
        assert is_noise_span("", 1.0)
        assert is_noise_span("   ", 1.0)
        assert is_noise_span("\n\t", 1.0)

    def test_confidence_threshold_boundary(self):
        assert is_noise_span("hello world", 0.49)
        assert not is_noise_span("hello world", 0.5)

    def test_short_ascii_dropped_but_cjk_kept(self):
        assert is_noise_span("abcde", 1.0)          # len 5, no CJK
        assert not is_noise_span("abcdef", 1.0)     # len 6
        assert not is_noise_span("こん", 1.0)        # CJK, short but kept

    def test_char_run_rule(self):
        assert is_noise_span("aaaaa", 1.0)
        assert is_noise_span("xxaaaaayy", 1.0)
        assert not is_noise_span("aaaabaaaa", 1.0)  # max run 4

    def test_punctuation_only(self):
        assert is_noise_span("!?.,--", 1.0)
        assert not is_noise_span("a!?.,--", 1.0)

    def test_drop_noise_filters(self):
        spans = [sp("good content here", 10), sp("...", 20), sp("ok text!", 30, conf=0.1)]
        kept = drop_noise(spans)
        assert [s.text for s in kept] == ["good content here"]


class TestCalibration:
    def test_known_ranges(self):
        assert calibrate_conf(1.0, "dom") == 1.0
        assert abs(calibrate_conf(0.7, "dom") - 0.5) < 1e-9          # (0.7-0.4)/0.6
        assert abs(calibrate_conf(0.925, "density") - 0.5) < 1e-9    # (0.925-0.85)/0.15
        assert calibrate_conf(0.2, "readability") == 0.0             # clamped below

    def test_unknown_source_identity(self):
        assert calibrate_conf(0.42, "mystery") == 0.42


class TestRowClustering:
    def test_tolerance_boundary_20(self):
        rows = rows_from_spans([sp("a", 100), sp("b", 120)])   # |diff| == 20 -> same row
        assert len(rows) == 1
        rows = rows_from_spans([sp("a", 100), sp("b", 121)])   # 21 -> new row
        assert len(rows) == 2

    def test_running_mean_not_last_member(self):
        # 100, 118 -> mean 109; 130 is 21 from mean -> new row even though
        # it's only 12 from the last member (frozen reference semantics)
        rows = rows_from_spans([sp("a", 100), sp("b", 118), sp("c", 130)])
        assert len(rows) == 2

    def test_x_sort_within_row(self):
        rows = rows_from_spans([sp("right", 100, x=50), sp("left", 102, x=5)])
        assert rows[0].text == "leftright"

    def test_tall_span_split_gap_15(self):
        groups = split_tall_spans([sp("a", 0), sp("b", 15), sp("c", 31)])
        assert [len(g) for g in groups] == [2, 1]


class TestCrossSourceAlignment:
    def test_three_sources_one_line(self):
        rows = {
            "dom": rows_from_spans([sp("hello", 100)], "dom"),
            "density": rows_from_spans([sp("hello", 110)], "density"),
            "readability": rows_from_spans([sp("hello", 129)], "readability"),
        }
        aligned = align_rows(rows)
        assert len(aligned) == 1
        assert set(aligned[0].by_source) == {"dom", "density", "readability"}

    def test_tolerance_30_boundary(self):
        rows = {
            "dom": rows_from_spans([sp("a", 100)], "dom"),
            "density": rows_from_spans([sp("a", 131)], "density"),
        }
        aligned = align_rows(rows)
        assert len(aligned) == 2

    def test_first_unused_per_source_wins(self):
        rows = {
            "dom": rows_from_spans([sp("x", 100)], "dom"),
            "density": [
                rows_from_spans([sp("near", 105)], "density")[0],
                rows_from_spans([sp("far", 125)], "density")[0],
            ],
        }
        aligned = align_rows(rows)
        assert aligned[0].by_source["density"].text == "near"
