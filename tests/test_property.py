"""Property-based invariants (hypothesis): the synth -> extract round trip
holds for arbitrary word-soup documents, and core pure functions keep
their contracts under random input."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ebook_ocr_ray.config import ExtractionConfig
from ebook_ocr_ray.sources.pages import expected_extraction, synth_html, synth_pdf
from ebook_ocr_ray.stages.extract import extract_one

# word-soup alphabet mirroring the documents table: lowercase words, no
# punctuation, single-space separated
WORDS = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=10),
    min_size=1,
    max_size=120,
).map(" ".join)

# the extraction round trip contract matches the driver corpus: bodies are
# >= 6 chars (the short-ASCII garbage rule eats shorter spans — frozen
# reference semantics, src/rover/line_processing.py:79-81)
BODY = WORDS.filter(lambda t: len(t) > 5)

CFG = ExtractionConfig()


class TestRoundTripProperties:
    @settings(max_examples=60, deadline=None)
    @given(doc_id=st.integers(min_value=0, max_value=10**7), text=BODY)
    def test_html_round_trip(self, doc_id, text):
        got, heads, *_ = extract_one(synth_html(doc_id, text), CFG)
        # garbage rule 4 can eat a line with a >=5 char run — exclude by
        # construction? No: assert the invariant the generator guarantees
        import re

        if re.search(r"(.)\1{4}", text):
            return  # outside the generator's contract (driver data has none)
        assert got == expected_extraction(doc_id, text)
        assert heads == [f"Document {doc_id:,}"]

    @settings(max_examples=40, deadline=None)
    @given(doc_id=st.integers(min_value=0, max_value=10**7), text=BODY)
    def test_pdf_round_trip(self, doc_id, text):
        got, *_ = extract_one(synth_pdf(doc_id, text), CFG)
        assert got == expected_extraction(doc_id, text)

    @settings(max_examples=40, deadline=None)
    @given(text=WORDS)
    def test_extraction_deterministic(self, text):
        a = extract_one(synth_html(1, text), CFG)
        b = extract_one(synth_html(1, text), CFG)
        assert a == b


class TestPureFunctionProperties:
    @settings(max_examples=60, deadline=None)
    @given(texts=st.lists(st.text(min_size=0, max_size=40), min_size=0, max_size=4))
    def test_char_table_never_exceeds_base(self, texts):
        from ebook_ocr_ray.functions.voting import build_char_table

        named = {f"s{i}": t for i, t in enumerate(texts)}
        slots = build_char_table(named)
        longest = max((len(t) for t in texts if t), default=0)
        assert len(slots) == longest

    @settings(max_examples=60, deadline=None)
    @given(
        ys=st.lists(st.floats(min_value=0, max_value=10000, allow_nan=False), max_size=30)
    )
    def test_row_clustering_partitions_all_spans(self, ys):
        from ebook_ocr_ray.functions.lines import make_span, rows_from_spans

        spans = [make_span("x", 0, y - 5, 8, y + 5, 1.0) for y in ys]
        rows = rows_from_spans(spans)
        assert sum(len(r.spans) for r in rows) == len(spans)
        # rows come out in ascending y order
        centers = [r.yc for r in rows]
        assert centers == sorted(centers)

    @settings(max_examples=60, deadline=None)
    @given(paras=st.lists(st.text(alphabet="ab .", min_size=0, max_size=12), max_size=8))
    def test_continuation_merge_preserves_content(self, paras):
        from ebook_ocr_ray.functions.bookparse import merge_continuations

        merged = merge_continuations(paras)
        # no characters are lost or invented (modulo stripped edges)
        assert "".join(merged).replace(" ", "") == "".join(
            p.strip() for p in paras
        ).replace(" ", "")

    @settings(max_examples=40, deadline=None)
    @given(a=WORDS, b=WORDS)
    def test_jaccard_bounds_and_symmetry(self, a, b):
        from ebook_ocr_ray.functions.sketches import jaccard

        j = jaccard(a, b)
        assert 0.0 <= j <= 1.0
        assert jaccard(b, a) == j
        assert jaccard(a, a) == 1.0
