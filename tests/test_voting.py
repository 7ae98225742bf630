"""Character alignment + weighted voting unit tests (reference semantics:
/root/reference/src/rover/alignment.py, ensemble.py:50-96)."""

from ebook_ocr_ray.functions.lines import AlignedRow, make_span, rows_from_spans
from ebook_ocr_ray.functions.voting import build_char_table, vote_slot, vote_text, vote_aligned_row


class TestCharTable:
    def test_single_source_passthrough(self):
        slots = build_char_table({"dom": "abc"})
        assert [s["dom"] for s in slots] == ["a", "b", "c"]

    def test_longest_is_base(self):
        slots = build_char_table({"dom": "ab", "density": "abcd"})
        assert len(slots) == 4                      # base = density (longer)

    def test_equal_and_replace(self):
        slots = build_char_table({"dom": "cat", "density": "car"})
        assert slots[2]["dom"] == "t" and slots[2]["density"] == "r"

    def test_delete_makes_gap(self):
        slots = build_char_table({"dom": "abcd", "density": "ad"})
        gaps = [s.get("density") for s in slots]
        assert gaps.count(None) == 2

    def test_inserts_dropped(self):
        # density has extra chars not in base positions -> ignored entirely
        slots = build_char_table({"dom": "abcdef", "density": "abXcdef"[:6]})
        assert len(slots) == 6

    def test_replace_longer_base_tail_gaps(self):
        slots = build_char_table({"dom": "aXYZb", "density": "aWb"})
        vals = [s.get("density") for s in slots]
        assert vals[1] == "W" and vals[2] is None and vals[3] is None


class TestVoting:
    def test_weighted_majority(self):
        slot = {"dom": "a", "density": "b", "readability": "b"}
        confs = {"dom": 1.0, "density": 1.0, "readability": 1.0}
        # dom: 1.5 vs density+readability: 2.2 -> b
        ch, w = vote_slot(slot, confs)
        assert ch == "b" and abs(w - 2.2) < 1e-9

    def test_tie_goes_to_first_inserted(self):
        slot = {"a_src": "x", "b_src": "y"}
        ch, _ = vote_slot(slot, {"a_src": 1.0, "b_src": 1.0}, {"a_src": 1.0, "b_src": 1.0})
        assert ch == "x"

    def test_gap_slots_skipped(self):
        slot = {"dom": None, "density": "z"}
        ch, _ = vote_slot(slot, {"dom": 1.0, "density": 1.0})
        assert ch == "z"

    def test_all_gaps_empty_string(self):
        assert vote_slot({"dom": None}, {"dom": 1.0}) == ("", 0.0)

    def test_vote_text_joins_and_averages(self):
        slots = build_char_table({"dom": "ab", "density": "ab"})
        text, conf = vote_text(slots, {"dom": 1.0, "density": 1.0})
        assert text == "ab" and conf > 0

    def test_single_source_line_passes_raw_conf(self):
        row = rows_from_spans([make_span("only", 0, 95, 32, 105, 0.8)], "dom")[0]
        text, sources, conf = vote_aligned_row(AlignedRow({"dom": row}, 100.0))
        assert text == "only" and sources == ["dom"] and conf == 0.8

    def test_identical_texts_vote_identical(self):
        r1 = rows_from_spans([make_span("same text", 0, 95, 72, 105, 0.95)], "dom")[0]
        r2 = rows_from_spans([make_span("same text", 0, 96, 72, 106, 0.9)], "density")[0]
        text, sources, _ = vote_aligned_row(AlignedRow({"dom": r1, "density": r2}, 100.0))
        assert text == "same text" and set(sources) == {"dom", "density"}

    def test_majority_fixes_single_source_error(self):
        r1 = rows_from_spans([make_span("the cat sat", 0, 95, 88, 105, 1.0)], "dom")[0]
        r2 = rows_from_spans([make_span("the cat sat", 0, 96, 88, 106, 1.0)], "density")[0]
        r3 = rows_from_spans([make_span("the bat sat", 0, 97, 88, 107, 1.0)], "readability")[0]
        text, _, _ = vote_aligned_row(
            AlignedRow({"dom": r1, "density": r2, "readability": r3}, 100.0)
        )
        assert text == "the cat sat"
