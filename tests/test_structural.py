"""Structural compiler tests: markers, headings, lists, figures,
continuation merge, TOC parse + matching, running head, XML shape."""

import xml.etree.ElementTree as ET

from ebook_ocr_ray.functions.bookparse import (
    detect_running_head,
    ends_with_terminator,
    match_toc_to_headings,
    merge_continuations,
    parse_document,
    parse_heading,
    parse_list_line,
    parse_page_marker,
    parse_toc_entry,
)
from ebook_ocr_ray.functions.bookxml import build_book_xml
from ebook_ocr_ray.stages.structural import synth_book_md


class TestMarkers:
    def test_page_marker_formats(self):
        assert parse_page_marker("--- Page 1 (page_0001.png) ---") == ("1", "page_0001.png")
        assert parse_page_marker("--- page_0042 ---") == ("42", "page_0042")
        assert parse_page_marker("--- Page (scan.png) ---") == ("", "scan.png")
        assert parse_page_marker("--- Page: page_0007.png ---") == ("7", "page_0007.png")
        assert parse_page_marker("regular text") is None

    def test_heading_clamp(self):
        assert parse_heading("# Top")[0:2] == (1, "Top")
        level, text, warning = parse_heading("##### Deep")
        assert level == 3 and warning is not None
        assert parse_heading("not heading") is None

    def test_list_lines(self):
        assert parse_list_line("● bullet item") == ("unordered", "bullet item")
        assert parse_list_line("- dash item") == ("unordered", "dash item")
        assert parse_list_line("1. ordered item") == ("ordered", "ordered item")
        assert parse_list_line("① circled") == ("ordered", "circled")
        assert parse_list_line("just text") is None
        assert parse_list_line("●") is None          # marker without content


class TestParagraphMerge:
    def test_terminators(self):
        assert ends_with_terminator("ends here.")
        assert ends_with_terminator("日本語です。")
        assert ends_with_terminator("closing」。")
        assert not ends_with_terminator("no terminator")

    def test_merge_chain(self):
        out = merge_continuations(["first part", "second part", "ends."])
        assert out == ["first partsecond partends."]

    def test_no_merge_when_terminated(self):
        out = merge_continuations(["one.", "two."])
        assert out == ["one.", "two."]

    def test_last_paragraph_kept(self):
        assert merge_continuations(["dangling"]) == ["dangling"]


class TestToc:
    def test_leaders(self):
        e = parse_toc_entry("Chapter 1 Intro ... 15")
        assert (e.level, e.number, e.page, e.text) == (1, "1", "15", "Intro")
        e = parse_toc_entry("Section 2.1 Depth ─── 30")
        assert (e.level, e.number, e.page) == (2, "2.1", "30")
        e = parse_toc_entry("3.1.2 Numbered title   42")
        assert (e.level, e.number, e.page) == (3, "3.1.2", "42")

    def test_japanese_chapter(self):
        e = parse_toc_entry("第2章 タイトル ... 7")
        assert (e.level, e.number, e.text) == (1, "2", "タイトル")

    def test_standalone_entry(self):
        e = parse_toc_entry("Preface ... 2")
        assert e.number == "" and e.text == "Preface"

    def test_two_pass_matching(self):
        toc = [parse_toc_entry("Chapter 1 Alpha ... 1"),
               parse_toc_entry("Section 1.1 Betaa ... 2")]
        heads = [(10, 1, "Alpha"), (20, 2, "Beta")]
        out = match_toc_to_headings(toc, heads)
        assert out[0].match_kind == "exact" and out[0].matched_line == 10
        assert out[1].match_kind == "fuzzy" and out[1].matched_line == 20

    def test_sequential_constraint(self):
        # second "Alpha" entry must match a LATER heading than the first
        toc = [parse_toc_entry("Alpha ... 1"), parse_toc_entry("Alpha ... 9")]
        heads = [(5, 1, "Alpha"), (50, 1, "Alpha")]
        out = match_toc_to_headings(toc, heads)
        assert out[0].matched_line == 5 and out[1].matched_line == 50


class TestDocumentParse:
    MD = "\n".join(
        [
            "--- Page 1 (page_0001.png) ---",
            "<!-- content -->",
            "# Chapter 1 Things",
            "intro line",
            "",
            "continues here.",
            "<!-- skip -->",
            "# Running Title",
            "skipped text.",
            "<!-- /skip -->",
            "--- Page 2 (page_0002.png) ---",
            "# Running Title",
            "● a",
            "● b",
            "[図1]",
            "<!-- /content -->",
        ]
    )

    def test_marker_stack_across_pages(self):
        doc = parse_document(self.MD)
        assert len(doc.pages) == 2
        skipped = [e for p in doc.pages for e in p.elements if not e.read_aloud]
        assert any("skipped" in e.text for e in skipped if e.kind == "paragraph")
        # content re-activates after /skip, still active on page 2
        page2 = doc.pages[1]
        assert any(e.read_aloud for e in page2.elements)

    def test_continuation_merged(self):
        doc = parse_document(self.MD)
        paras = [e.text for e in doc.pages[0].elements if e.kind == "paragraph"]
        assert "intro linecontinues here." in paras

    def test_list_and_figure(self):
        doc = parse_document(self.MD)
        page2 = doc.pages[1]
        lists = [e for e in page2.elements if e.kind == "list"]
        assert lists and lists[0].items == ("a", "b")
        figs = [e for e in page2.elements if e.kind == "figure"]
        assert figs and figs[0].text == "図1"

    def test_running_head_detected(self):
        doc = parse_document(self.MD)
        assert detect_running_head(doc) == "Running Title"


class TestXml:
    def test_full_book_shape(self):
        md = synth_book_md(7, "alpha beta gamma delta epsilon zeta eta theta iota")
        doc = parse_document(md)
        xml = build_book_xml(doc, title="t")
        root = ET.fromstring(xml)
        assert root.tag == "book"
        assert root.find("toc") is not None
        chapters = root.findall("chapter")
        assert chapters and chapters[0].get("number") == "1"
        sections = chapters[0].findall("section")
        assert sections and sections[0].get("number") == "1.1"
        assert doc.errors and "clamped" in doc.errors[0]       # the #### line

    def test_no_structure_fallback_chapter(self):
        doc = parse_document("--- Page 1 (p.png) ---\njust a paragraph.")
        root = ET.fromstring(build_book_xml(doc))
        ch = root.findall("chapter")
        assert len(ch) == 1 and ch[0].get("title") == "Content"

    def test_skip_sets_read_aloud_false(self):
        md = "--- Page 1 (p.png) ---\n<!-- skip -->\nhidden text.\n<!-- /skip -->\nshown text."
        root = ET.fromstring(build_book_xml(parse_document(md)))
        paras = root.iter("paragraph")
        flags = {p.text: p.get("readAloud") for p in paras}
        assert flags["hidden text."] == "false" and flags["shown text."] == "true"


class TestStructuralPipeline:
    def test_pipeline_over_documents(self, ray_session):
        from ebook_ocr_ray.stages.structural import structural_pipeline

        out = structural_pipeline("/root/testdata/sf0.001").to_pandas()
        assert len(out) == 500
        assert (out.n_pages == 3).all()
        assert out.book_xml.str.startswith("<book>").all()
        # deterministic across runs
        again = structural_pipeline("/root/testdata/sf0.001").to_pandas()
        assert out.sort_values("doc_id").book_xml.tolist() == \
            again.sort_values("doc_id").book_xml.tolist()


class TestTocAssembly:
    def test_merge_split_lines(self):
        from ebook_ocr_ray.functions.bookparse import merge_split_toc_lines

        assert merge_split_toc_lines(["Chapter", "1 Title"]) == ["Chapter 1 Title"]
        assert merge_split_toc_lines(["Episode 01", "", "Title"]) == ["Episode 01 Title"]
        assert merge_split_toc_lines(["第1章 done"]) == ["第1章 done"]

    def test_split_compound_line(self):
        from ebook_ocr_ray.functions.bookparse import split_compound_toc_line

        assert split_compound_toc_line("1.1 Foo 1.2 Bar") == ["1.1 Foo", "1.2 Bar"]
        assert split_compound_toc_line("Chapter 1 Alpha Section 1.1 Beta") == [
            "Chapter 1 Alpha",
            "Section 1.1 Beta",
        ]
        assert split_compound_toc_line("2.1 Single entry") == ["2.1 Single entry"]

    def test_document_level_assembly(self):
        from ebook_ocr_ray.functions.bookparse import parse_document

        md = "\n".join(
            [
                "<!-- toc -->",
                "Chapter",
                "1 Things ... 2",
                "<!-- /toc -->",
                "# Chapter 1 Things",
            ]
        )
        doc = parse_document(md)
        assert len(doc.toc) == 1
        assert doc.toc[0].number == "1" and doc.toc[0].text == "Things"


class TestPageMetadata:
    def test_parse_metadata_forms(self):
        from ebook_ocr_ray.functions.bookparse import parse_page_metadata

        assert parse_page_metadata("はじめに 1 / 3") == ("はじめに", 1, 3, "chapter-page")
        assert parse_page_metadata("第1節 5 / 10") == ("第1節", 5, 10, "section-page")
        assert parse_page_metadata("7 / 9")[1:3] == (7, 9)
        assert parse_page_metadata("not metadata") is None

    def test_first_line_of_page_captured(self):
        from ebook_ocr_ray.functions.bookparse import parse_document

        md = "--- Page 1 (p.png) ---\nはじめに 1 / 3\nactual paragraph text."
        doc = parse_document(md)
        assert doc.pages[0].metadata == "はじめに 1 / 3"
        paras = [e.text for e in doc.pages[0].elements if e.kind == "paragraph"]
        assert paras == ["actual paragraph text."]

    def test_metadata_in_xml(self):
        import xml.etree.ElementTree as ET

        from ebook_ocr_ray.functions.bookparse import parse_document
        from ebook_ocr_ray.functions.bookxml import build_book_xml

        md = "--- Page 1 (p.png) ---\n第2節 2 / 4\nbody."
        root = ET.fromstring(build_book_xml(parse_document(md)))
        pb = next(root.iter("pagebreak"))
        assert pb.get("meta") == "第2節 2 / 4" and pb.get("metaType") == "section-page"


class TestHealth:
    def test_page_loss_and_error_rate(self):
        from ebook_ocr_ray.functions.bookparse import document_health, parse_document

        md = "--- Page 1 (a.png) ---\nok.\n--- Page 5 (b.png) ---\nok."
        h = document_health(parse_document(md))
        assert h["n_pages"] == 2 and h["page_loss_pct"] == 60
        assert not h["page_count_ok"]

        clean = parse_document("--- Page 1 (a.png) ---\nok.\n--- Page 2 (b.png) ---\nok.")
        h2 = document_health(clean)
        assert h2["page_count_ok"] and h2["error_rate_ok"]


class TestFigureMarkers:
    def test_extended_placeholder_kinds(self):
        from ebook_ocr_ray.functions.bookparse import find_figure_marker, parse_figure

        assert parse_figure("[写真3]") == "写真3"
        assert parse_figure("[グラフ]") == "グラフ"
        assert parse_figure("text [図1] text") is None      # standalone only
        assert find_figure_marker("text [図1] text") == "図1"


class TestGoldenBook:
    """Committed golden e2e fixture (analog of the reference's
    sample_book.md -> expected_book.xml pair)."""

    def test_sample_book_matches_committed_xml(self):
        import os

        fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
        sample = open(os.path.join(fixtures, "sample_book.md")).read()
        expected = open(os.path.join(fixtures, "expected_book.xml")).read()
        doc = parse_document(sample)
        assert build_book_xml(doc, title="サンプル") == expected

    def test_sample_book_structure(self):
        import os

        fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
        doc = parse_document(open(os.path.join(fixtures, "sample_book.md")).read())
        root = ET.fromstring(build_book_xml(doc, title="t"))
        assert [c.get("number") for c in root.findall("chapter")] == ["1", "2"]
        toc = root.find("toc")
        assert [e.get("match") for e in toc] == ["exact", "exact", "exact"]
        assert root.find(".//pagebreak[@metaType='chapter-page']") is not None
        assert root.find(".//em") is not None
        figs = [f.get("src") for f in root.iter("figure")]
        assert figs == ["写真1", "images/fig_a.png"]


class TestFigureCaptionAndDuplicateHeading:
    def test_caption_harvest(self):
        md = "\n".join(
            [
                "--- Page 1 (p.png) ---",
                "<!-- FIGURE: images/x.png -->",
                "**図1: キャプション**",
                "following paragraph text.",
            ]
        )
        doc = parse_document(md)
        figs = [e for e in doc.pages[0].elements if e.kind == "figure"]
        assert figs[0].caption == "図1: キャプション"
        root = ET.fromstring(build_book_xml(doc))
        fig = next(root.iter("figure"))
        assert fig.get("caption") == "図1: キャプション"

    def test_caption_not_stolen_after_paragraph(self):
        md = "\n".join(
            [
                "--- Page 1 (p.png) ---",
                "<!-- FIGURE: images/x.png -->",
                "intervening paragraph line",
                "**bold but not a caption**",
            ]
        )
        doc = parse_document(md)
        figs = [e for e in doc.pages[0].elements if e.kind == "figure"]
        assert figs[0].caption == ""

    def test_duplicate_heading_suppressed(self):
        md = "\n".join(
            [
                "--- Page 1 (p.png) ---",
                "# Chapter 1 Things",
                "## Things",                     # restates the chapter title
                "## Other heading kept",
                "body text here.",
            ]
        )
        root = ET.fromstring(build_book_xml(parse_document(md)))
        ch = root.find("chapter")
        heads = [h.text for h in ch.iter("heading")]
        assert "Things" not in heads
        assert "Other heading kept" in heads


class TestConfigurableStructureKeywords:
    """§2.10: structure keywords are config, never hardcoded."""

    def test_custom_keywords_recognized(self):
        from ebook_ocr_ray.functions.bookparse import build_toc_patterns, parse_toc_entry

        patterns = build_toc_patterns({1: ("Part", "Book"), 2: ("Unit",)})
        e = parse_toc_entry("Part 3 The Middle ... 44", patterns)
        assert (e.level, e.number, e.text, e.page) == (1, "3", "The Middle", "44")
        e = parse_toc_entry("Unit 3.1 Detail ... 45", patterns)
        assert (e.level, e.number) == (2, "3.1")
        e = parse_toc_entry("Book 7 Other ... 2", patterns)
        assert (e.level, e.number) == (1, "7")

    def test_document_level_override(self):
        from ebook_ocr_ray.functions.bookparse import parse_document

        md = "\n".join(
            [
                "<!-- toc -->",
                "Part 1 Alpha ... 2",
                "<!-- /toc -->",
                "# Part 1 Alpha",
            ]
        )
        default = parse_document(md)
        assert default.toc[0].number == ""              # 'Part' unknown by default
        custom = parse_document(md, level_keywords={1: ("Part",)})
        assert custom.toc[0].number == "1" and custom.toc[0].text == "Alpha"

    def test_default_unchanged(self):
        from ebook_ocr_ray.functions.bookparse import parse_toc_entry

        e = parse_toc_entry("Chapter 2 Still Works ... 9")
        assert (e.level, e.number) == (1, "2")

    def test_xml_builder_honors_keywords(self):
        from ebook_ocr_ray.functions.bookxml import build_book_xml

        md = "\n".join(
            [
                "--- Page 1 (p.png) ---",
                "# Part 2 Custom Structure",
                "body text under the custom chapter.",
            ]
        )
        doc = parse_document(md)
        default_xml = build_book_xml(doc)
        custom_xml = build_book_xml(doc, level_keywords={1: ("Part",)})
        droot, croot = ET.fromstring(default_xml), ET.fromstring(custom_xml)
        # default: 'Part' unknown -> fallback Content chapter
        assert droot.find("chapter").get("title") == "Content"
        # custom: a real numbered chapter opens
        ch = croot.find("chapter")
        assert ch.get("number") == "2" and ch.get("title") == "Custom Structure"


class TestReadAloudExclusionTable:
    """G4 static half: priority-ordered heading exclusion regex table
    (reference DEFAULT_EXCLUSION_PATTERNS, src/book_converter/config.py:
    12-61; matcher analyzer.py:154-181)."""

    def test_each_static_pattern(self):
        from ebook_ocr_ray.functions.bookxml import match_exclusion

        assert match_exclusion("Chapter title — 12 / 340").id == "page-number"
        assert match_exclusion("◆◇◆◇").id == "decoration"
        assert match_exclusion("Section 3.2").id == "section-label"
        assert match_exclusion("Webサイト").id == "reference"
        assert match_exclusion("注1.2 something").id == "footnote"
        assert match_exclusion("Section 3.2 With a title") is None
        assert match_exclusion("ordinary heading") is None
        assert match_exclusion("") is None

    def test_priority_order_wins(self):
        from ebook_ocr_ray.functions.bookxml import ExclusionPattern, match_exclusion

        table = (
            ExclusionPattern("low", 10, r"^dup$"),
            ExclusionPattern("high", 99, r"^dup$"),
        )
        assert match_exclusion("dup", table).id == "high"

    def test_matched_heading_emits_read_aloud_false(self):
        from ebook_ocr_ray.functions.bookparse import parse_document
        from ebook_ocr_ray.functions.bookxml import build_book_xml

        md = "\n".join(
            [
                "--- Page 1 (page_0001.png) ---",
                "# Chapter 1 Opening",
                "body words here.",
                "### ◆◇◆◇",               # decoration-only heading -> excluded
                "more body words.",
            ]
        )
        xml = build_book_xml(parse_document(md))
        assert 'readAloud="false">◆◇◆◇' in xml.replace("\n", "")
        assert 'readAloud="true"' in xml            # ordinary content unaffected

    def test_custom_table_extends_config_surface(self):
        from ebook_ocr_ray.functions.bookparse import parse_document
        from ebook_ocr_ray.functions.bookxml import (
            DEFAULT_EXCLUSION_PATTERNS,
            ExclusionPattern,
            build_book_xml,
        )

        md = "\n".join(
            [
                "--- Page 1 (page_0001.png) ---",
                "# Chapter 1 Opening",
                "body words here.",
                "## DRAFT",
                "more body words.",
            ]
        )
        table = DEFAULT_EXCLUSION_PATTERNS + (
            ExclusionPattern("draft", 60, r"^DRAFT$"),
        )
        plain = build_book_xml(parse_document(md))
        custom = build_book_xml(parse_document(md), exclusion_patterns=table)
        assert 'readAloud="false"' not in plain
        assert 'readAloud="false">DRAFT' in custom.replace("\n", "")
