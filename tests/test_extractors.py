"""HTML extractor variants, PDF layout path, per-doc ensemble merge."""

import pytest

from ebook_ocr_ray.config import ExtractionConfig
from ebook_ocr_ray.functions.ensemble import merge_sources
from ebook_ocr_ray.functions.html_dom import parse_blocks
from ebook_ocr_ray.functions.html_extract import (
    extract_density,
    extract_dom,
    extract_readability,
    run_html_extractors,
)
from ebook_ocr_ray.functions.pdf_extract import (
    decode_pdf_words,
    extract_pdf_text,
    is_pdf_payload,
    merge_continuation_lines,
)
from ebook_ocr_ray.functions.geometry import Region
from ebook_ocr_ray.sources.pages import expected_extraction, synth_html, synth_pdf
from ebook_ocr_ray.stages.extract import extract_one

ARTICLE = """<html><head><title>T</title></head><body>
<header><nav><a href="/">Home</a> <a href="/a">About</a></nav></header>
<main>
<h1>Real heading here</h1>
<p>This is the actual article body with plenty of words, commas, and substance.</p>
</main>
<footer><p><a href="/p">privacy</a> <a href="/t">terms</a> only links</p></footer>
</body></html>"""


class TestHtmlDom:
    def test_blocks_and_offsets(self):
        blocks = parse_blocks(ARTICLE)
        texts = [b.text for b in blocks]
        assert "Real heading here" in texts
        offsets = [b.offset for b in blocks]
        assert offsets == sorted(offsets)          # document order

    def test_link_density(self):
        blocks = parse_blocks(ARTICLE)
        footer = [b for b in blocks if "privacy" in b.text][0]
        assert footer.link_density > 0.4
        body = [b for b in blocks if "actual article" in b.text][0]
        assert body.link_density == 0.0

    def test_entity_unescaping(self):
        blocks = parse_blocks("<p>a &amp; b &lt;c&gt;</p>")
        assert blocks[0].text == "a & b <c>"


class TestHtmlVariants:
    def test_dom_prefers_main(self):
        spans = extract_dom(parse_blocks(ARTICLE))
        assert [s.text for s in spans] == [
            "Real heading here",
            "This is the actual article body with plenty of words, commas, and substance.",
        ]

    def test_dom_chrome_fallback_without_main(self):
        html = "<body><header><p>chrome</p></header><p>content paragraph text</p></body>"
        spans = extract_dom(parse_blocks(html))
        assert [s.text for s in spans] == ["content paragraph text"]

    def test_density_drops_link_farms(self):
        spans = extract_density(parse_blocks(ARTICLE))
        assert all("privacy" not in s.text for s in spans)
        assert any("actual article" in s.text for s in spans)

    def test_readability_picks_main_container(self):
        spans = extract_readability(parse_blocks(ARTICLE))
        assert any("actual article" in s.text for s in spans)
        assert all("Home" not in s.text for s in spans)

    def test_same_block_same_geometry_across_variants(self):
        out = run_html_extractors(ARTICLE)
        def y_of(spans, needle):
            return [s.yc for s in spans if needle in s.text][0]
        y_dom = y_of(out["dom"], "actual article")
        y_den = y_of(out["density"], "actual article")
        assert y_dom == y_den


class TestPdfPath:
    def test_magic_sniff(self):
        assert is_pdf_payload(b"%PDF-1.4\n...")
        assert not is_pdf_payload(b"<html>")

    def test_missing_layout_raises(self):
        with pytest.raises(ValueError):
            decode_pdf_words(b"%PDF-1.4\nno layout here")

    def test_round_trip(self):
        text = "alpha beta gamma " * 30
        payload = synth_pdf(7, text.strip())
        out, n_lines, titles = extract_pdf_text(payload)
        assert out == f"Document 7\n{text.strip()}"
        assert titles == ["Document 7"]
        assert n_lines > 2

    def test_continuation_merge_rules(self):
        regions = [
            Region("TITLE", (0, 0, 10, 10), 1.0, "Heading"),
            Region("TEXT", (0, 20, 10, 30), 1.0, "first line ends."),
            Region("TEXT", (0, 40, 10, 50), 1.0, "second sentence"),
            Region("TEXT", (0, 60, 10, 70), 1.0, "continues here"),
        ]
        blocks = merge_continuation_lines(regions)
        assert blocks == ["Heading", "first line ends.", "second sentence continues here"]


class TestEnsemble:
    def test_agreeing_sources_byte_identical(self):
        out = run_html_extractors(ARTICLE)
        merged = merge_sources(out)
        assert merged.text == (
            "Real heading here\n"
            "This is the actual article body with plenty of words, commas, and substance."
        )
        assert merged.contributions["dom"] == 2

    def test_all_noise_empty_result(self):
        from ebook_ocr_ray.functions.lines import make_span
        merged = merge_sources({"dom": [make_span("...", 0, 0, 10, 10, 1.0)]})
        assert merged.text == "" and merged.lines == []

    def test_gap_counting_without_primary(self):
        from ebook_ocr_ray.functions.lines import make_span
        merged = merge_sources(
            {"dom": [], "density": [make_span("filled by density", 0, 95, 80, 105, 0.99)]}
        )
        assert merged.text == "filled by density"
        assert merged.gaps_filled == 1


class TestGoldenRoundTrip:
    @pytest.mark.parametrize("doc_id", [0, 1, 3, 10, 42])
    def test_synth_extract_inverse(self, doc_id):
        text = "the quick brown fox jumps over a lazy dog again and again".replace("x", "x")
        payload = synth_pdf(doc_id, text) if doc_id % 7 == 3 else synth_html(doc_id, text)
        got, heads, n, g, c, a = extract_one(payload, ExtractionConfig())
        assert got == expected_extraction(doc_id, text)
        assert heads == [f"Document {doc_id:,}"]


class TestHtmlRobustness:
    """Messy real-world HTML shapes must not crash or corrupt extraction
    (probed live; locked in as regressions)."""

    CASES = {
        "comment": ("<main><!-- c --><p>real body text here, long enough.</p></main>",
                    "real body text here, long enough."),
        "script_with_markup": (
            "<body><script>var x = '<p>fake</p>';</script>"
            "<p>actual content text here.</p></body>",
            "actual content text here."),
        "nested_main": ("<main><main><p>inner nested main body text.</p></main></main>",
                        "inner nested main body text."),
        "unclosed_p": ("<main><p>first paragraph body text<p>second paragraph body text</main>",
                       "first paragraph body text\nsecond paragraph body text"),
        "mismatched_close": ("<main><p>text body here long enough.</b></p></main>",
                             "text body here long enough."),
        "attr_soup": ('<main><p class="x" data-y="<z>">attribute soup body text.</p></main>',
                      "attribute soup body text."),
        "void_br": ("<main><p>line one<br>line two of same block here.</p></main>",
                    "line oneline two of same block here."),
        "table_cells": (
            "<main><table><tr><td>cell one text here</td>"
            "<td>cell two text here</td></tr></table></main>",
            "cell one text here\ncell two text here"),
        "empty_main_falls_back": ("<main></main><p>outside text long enough here.</p>",
                                  "outside text long enough here."),
    }

    @pytest.mark.parametrize("name", sorted(CASES))
    def test_case(self, name):
        html, expected = self.CASES[name]
        got, *_ = extract_one(html.encode(), ExtractionConfig())
        assert got == expected


class TestFallbackChain:
    """E15 analog: ensemble -> raw text column fallback chain
    (src/layout_ocr.py:50-66, quality floor src/layout_ocr_utils.py:49-66)."""

    GOOD = b"<main><p>perfectly ordinary extracted body text here.</p></main>"
    GARBAGE = b"\x00\x01###$$$%%%&&&***!!!<<<>>>///\\\\|||~~~^^^"

    def _run(self, payload, raw_text, cfg=None):
        import pyarrow as pa

        from ebook_ocr_ray.config import ExtractionConfig
        from ebook_ocr_ray.stages.extract import DocumentExtractor

        import datetime as dt
        batch = pa.Table.from_pylist(
            [{"url": "https://x.example/f", "warc_ts": dt.datetime(2026, 1, 1),
              "html": payload, "text": raw_text, "lang": "en"}]
        )
        out = DocumentExtractor(cfg or ExtractionConfig())(batch)
        return out.to_pylist()[0]

    def test_low_quality_falls_back_to_raw_text(self):
        row = self._run(self.GARBAGE, "raw crawl text recovered intact")
        assert row["engine"] == "raw_text"
        assert row["extracted_text"] == "raw crawl text recovered intact"
        assert row["error"] is None

    def test_healthy_extraction_stays_ensemble(self):
        row = self._run(self.GOOD, "raw crawl text")
        assert row["engine"] == "ensemble"
        assert "ordinary extracted body text" in row["extracted_text"]

    def test_exception_recovers_via_fallback_but_keeps_error(self):
        # %PDF magic without a parseable layout raises in the pdf path
        row = self._run(b"%PDF-not really a pdf", "raw crawl text recovered intact")
        assert row["engine"] == "raw_text"
        assert row["extracted_text"] == "raw crawl text recovered intact"
        assert row["error"] is not None

    def test_low_quality_raw_does_not_replace_ensemble(self):
        # raw side also fails the floor -> keep the ensemble result
        row = self._run(self.GARBAGE, "###")
        assert row["engine"] == "ensemble"

    def test_fallback_disabled_preserves_old_behavior(self):
        from ebook_ocr_ray.config import ExtractionConfig

        row = self._run(
            self.GARBAGE, "raw crawl text recovered intact",
            ExtractionConfig(fallback_enabled=False),
        )
        assert row["engine"] == "ensemble"

    def test_quality_floor_units(self):
        from ebook_ocr_ray.functions.textstats import is_low_quality, non_char_ratio

        assert is_low_quality("")
        assert is_low_quality("   ")
        assert is_low_quality("short")                    # < 10 chars
        assert not is_low_quality("long enough ordinary text")
        assert is_low_quality("#### $$$$ %%%% !!!!")       # ratio > 0.5
        assert non_char_ratio("abcd") == 0.0
        assert non_char_ratio("####") == 1.0


class TestOpenExtractorRegistry:
    """A7 analog: a user-registered 4th variant (weight 0.8 default,
    runners.py:344-389) participates in the vote without package edits."""

    def test_fourth_variant_end_to_end(self):
        from ebook_ocr_ray.config import ExtractionConfig
        from ebook_ocr_ray.functions.html_extract import extract_dom
        from ebook_ocr_ray.stages.extract import extract_one

        calls = []

        def fourth(blocks):
            calls.append(len(blocks))
            return extract_dom(blocks)

        cfg = ExtractionConfig(
            extractors=("dom", "density", "readability", "tess"),
            custom_extractors={"tess": fourth},
        )
        assert cfg.weights["tess"] == 0.8                 # default weight
        text, _h, _n, _g, contributions, _a = extract_one(
            b"<main><p>body text for the four way vote.</p></main>", cfg
        )
        assert calls, "custom extractor was never invoked"
        assert "body text for the four way vote." in text
        assert "tess" in contributions

    def test_unknown_extractor_still_rejected(self):
        import pytest

        from ebook_ocr_ray.config import ExtractionConfig

        with pytest.raises(ValueError, match="unknown extractor"):
            ExtractionConfig(extractors=("dom", "nope"))

    def test_non_callable_rejected(self):
        import pytest

        from ebook_ocr_ray.config import ExtractionConfig

        with pytest.raises(ValueError, match="not callable"):
            ExtractionConfig(
                extractors=("dom", "bad"), custom_extractors={"bad": 42}
            )


class TestFigureZoneMasking:
    """A8 analog (runners.py:392-448): the primary's figure zones mask
    other variants' spans before voting, so caption text a non-primary
    variant kept cannot flip a vote."""

    FIG_HTML = (
        b"<main><p>real body content line one here.</p>"
        b"<figure><figcaption>spurious caption text the vote must not keep."
        b"</figcaption></figure>"
        b"<p>real body content line two here.</p></main>"
    )

    def test_caption_text_masked_from_vote(self):
        from ebook_ocr_ray.config import ExtractionConfig
        from ebook_ocr_ray.stages.extract import extract_one

        text, _h, _n, _g, _c, _a = extract_one(self.FIG_HTML, ExtractionConfig())
        assert "real body content line one here." in text
        assert "real body content line two here." in text
        assert "spurious caption" not in text

    def test_unmasked_variant_would_keep_caption(self):
        """Control: without masking (density alone as primary), the
        caption text IS kept — proving the mask is what removes it."""
        from ebook_ocr_ray.config import ExtractionConfig
        from ebook_ocr_ray.stages.extract import extract_one

        cfg = ExtractionConfig(extractors=("density",), primary="density")
        text, *_ = extract_one(self.FIG_HTML, cfg)
        assert "spurious caption" in text

    def test_zone_report_geometry(self):
        from ebook_ocr_ray.functions.html_dom import parse_blocks
        from ebook_ocr_ray.functions.html_extract import figure_zones

        zones = figure_zones(parse_blocks(self.FIG_HTML.decode()))
        assert len(zones) == 1
        (x1, y1, x2, y2) = zones[0]
        assert x1 == 0.0 and x2 > 0 and y2 > y1


class TestOutlinks:
    def test_link_parser_edge_recovery(self):
        """Review-found edges: skipped-subtree </a> must not close an
        outer anchor, a bare href attribute means href="", and a
        truncated page keeps its pending anchor."""
        from ebook_ocr_ray.functions.links import extract_links

        assert extract_links(
            '<a href="/x">text<svg><a href="/i">i</a></svg>more</a>'
        ) == [("/x", "textmore")]
        assert extract_links("<a href>valueless</a>") == [("", "valueless")]
        assert extract_links('<a href="/x">trailing text') == [
            ("/x", "trailing text")
        ]

    def test_link_parser_order_and_nesting(self):
        from ebook_ocr_ray.functions.links import extract_links

        html = """<html><body>
        <a href="/x">first <b>bold</b></a>
        <script><a href="/skip">no</a></script>
        <a>no href</a>
        <a href="/y">second<a href="/z">recovered</a>
        </body></html>"""
        links = extract_links(html)
        assert links[0] == ("/x", "first bold")
        assert links[1] == ("", "no href")
        assert links[2][0] == "/y"                 # nested <a> closes previous
        assert links[3][0] == "/z"
        assert all(h != "/skip" for h, _ in links)

    def test_pipeline_matches_oracle(self, ray_session):
        import duckdb
        import pandas as pd
        import __ray_entry__ as e
        from ebook_ocr_ray.pipelines.extraction import outlinks

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        ours = outlinks(sf).to_pandas()
        oracle = con.execute(e.oracle_sql()["outlinks"]).df()
        key = ["url", "link_idx"]
        a = ours.sort_values(key).reset_index(drop=True)
        b = oracle.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)],
                                      check_dtype=False)
