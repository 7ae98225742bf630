"""The minimal real-PDF text decoder: hand-built PDFs written in true
PDF 1.x syntax (uncompressed streams) must extract byte-identically
through the full layout path; non-text PDFs keep the documented
ValueError fallback."""
import pytest


def _pdf(body: str, mediabox: str = "0 0 400 200") -> bytes:
    """Wrap a content stream in a structurally real single-page PDF."""
    content = body.encode("latin-1")
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [" + mediabox.encode() + b"]"
        b" /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content +
        b"\nendstream\nendobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


class TestRealPdfDecode:
    def test_tiny_real_pdf_extracts_byte_identically(self):
        """Td positioning + Tf sizing + Tj shows: a 24pt line classifies
        TITLE (>= TITLE_MIN_CHAR_HEIGHT), the two 10pt lines merge as a
        continuation paragraph (no sentence terminator on the first)."""
        from ebook_ocr_ray.functions.pdf_extract import extract_pdf_text

        pdf = _pdf(
            "BT\n"
            "/F1 24 Tf\n"
            "20 160 Td\n"
            "(Big Title) Tj\n"
            "/F1 10 Tf\n"
            "0 -30 Td\n"
            "(First line of body text) Tj\n"
            "0 -20 Td\n"
            "(continues here.) Tj\n"
            "ET\n"
        )
        text, n_lines, titles = extract_pdf_text(pdf)
        assert text == "Big Title\nFirst line of body text continues here."
        assert n_lines == 3
        assert titles == ["Big Title"]

    def test_tm_tl_tstar_quote_and_tj_kerning(self):
        """Tm absolute positioning, TL + T* line advance, the ' shortcut,
        and TJ arrays with kerning numbers all land words on the right
        lines."""
        from ebook_ocr_ray.functions.pdf_extract import decode_pdf_words

        pdf = _pdf(
            "BT\n"
            "/F1 10 Tf\n"
            "20 TL\n"
            "1 0 0 1 30 150 Tm\n"
            "[(ker) -100 (ned words)] TJ\n"
            "T*\n"
            "(second line) Tj\n"
            "(third line)'\n"
            "ET\n"
        )
        width, spans = decode_pdf_words(pdf)
        assert width == 400.0
        texts = [s.text for s in spans]
        assert texts == ["ker", "ned", "words", "second", "line", "third", "line"]
        by_y = {}
        for s in spans:
            by_y.setdefault(round(s.y1), []).append(s.text)
        assert len(by_y) == 3                       # three distinct lines
        # kerning (-100/1000 em at 10pt = +1pt) shifted 'ned' right of
        # 'ker' end by exactly that much
        ker = next(s for s in spans if s.text == "ker")
        ned = next(s for s in spans if s.text == "ned")
        assert ned.x1 == pytest.approx(ker.x2 + 1.0)

    def test_string_escapes_and_nested_parens(self):
        from ebook_ocr_ray.functions.pdf_extract import decode_pdf_words

        pdf = _pdf(
            "BT /F1 10 Tf 20 100 Td "
            r"(paren \(pair\) kept (nested) and \101 octal) Tj "
            "ET\n"
        )
        _, spans = decode_pdf_words(pdf)
        assert [s.text for s in spans] == [
            "paren", "(pair)", "kept", "(nested)", "and", "A", "octal"
        ]

    def test_image_only_pdf_still_raises(self):
        from ebook_ocr_ray.functions.pdf_extract import decode_pdf_words

        with pytest.raises(ValueError, match="no char-box layout"):
            decode_pdf_words(b"%PDF-1.4\n9 0 obj << /Subtype /Image >> endobj\n%%EOF")

    def test_bt_et_without_shows_still_raises(self):
        from ebook_ocr_ray.functions.pdf_extract import decode_pdf_words

        with pytest.raises(ValueError):
            decode_pdf_words(_pdf("BT /F1 10 Tf 0 0 Td ET\n"))

    def test_charbox_container_branch_still_wins(self):
        """A payload carrying the synthetic marker uses the exact boxes,
        not the fixed-metric estimator."""
        import json

        from ebook_ocr_ray.functions.pdf_extract import decode_pdf_words

        doc = {"w": 500.0, "words": [["hello", 10, 20, 40, 8]]}
        payload = (
            b"%PDF-1.4\n%EBOOKRAY-CHARBOX " + json.dumps(doc).encode() + b"\nBT (x) Tj ET"
        )
        width, spans = decode_pdf_words(payload)
        assert width == 500.0
        assert [s.text for s in spans] == ["hello"]
        assert spans[0].x2 == 50.0


def _pdf2(body1: str, body2: str, mediabox: str = "0 0 400 200") -> bytes:
    """Two-page PDF: two page objects, one content stream each."""
    c1, c2 = body1.encode("latin-1"), body2.encode("latin-1")
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [" + mediabox.encode() + b"]"
        b" /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(c1)).encode() + b" >>\nstream\n"
        + c1 + b"\nendstream\nendobj\n"
        b"5 0 obj << /Type /Page /Parent 2 0 R /MediaBox [" + mediabox.encode() + b"]"
        b" /Contents 6 0 R >> endobj\n"
        b"6 0 obj << /Length " + str(len(c2)).encode() + b" >>\nstream\n"
        + c2 + b"\nendstream\nendobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


class TestMultiPageAndEscapes:
    def test_two_pages_never_interleave(self):
        """Both pages place text at the SAME page-local y: page stacking
        must keep them on separate lines in document order (previously
        they merged into one shared row — the word-interleave bug)."""
        from ebook_ocr_ray.functions.pdf_extract import extract_pdf_text

        pdf = _pdf2(
            "BT /F1 10 Tf 20 150 Td (page one line.) Tj ET\n",
            "BT /F1 10 Tf 20 150 Td (page two line.) Tj ET\n",
        )
        text, n_lines, _ = extract_pdf_text(pdf)
        assert text == "page one line.\npage two line."
        assert n_lines == 2

    def test_invalid_digit_escape_keeps_char(self):
        """\\8 / \\9 are NOT octal: spec behavior is drop-backslash,
        keep-char (previously int(..., 8) raised and the whole document
        fell to the error row)."""
        from ebook_ocr_ray.functions.pdf_extract import _pdf_string

        text, _ = _pdf_string(b"(a\\8b)", 0)
        assert text == "a8b"

    def test_backslash_eol_line_continuation_drops_both(self):
        """Backslash + EOL is a line continuation: both characters drop
        (spec 7.3.4.2), so a word split across lines stays one word."""
        from ebook_ocr_ray.functions.pdf_extract import _pdf_string

        assert _pdf_string(b"(foo\\\nbar)", 0)[0] == "foobar"
        assert _pdf_string(b"(foo\\\r\nbar)", 0)[0] == "foobar"
        assert _pdf_string(b"(foo\\\rbar)", 0)[0] == "foobar"
