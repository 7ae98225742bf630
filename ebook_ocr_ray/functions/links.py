"""Outlink extraction: (href, anchor_text) pairs in document order.

The link-graph building block of a web corpus pipeline (outlink tables
feed dedup-by-template, site-graph analyses, and crawl frontier logic).
Kept separate from html_dom's block parser — that parser's semantics are
frozen against the extraction oracle, and link capture needs attribute
handling the block model deliberately ignores.
"""

from __future__ import annotations

from html.parser import HTMLParser

from ebook_ocr_ray.functions.html_dom import SKIP_TAGS


class _LinkParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._href: str | None = None
        self._text_parts: list[str] = []
        self.links: list[tuple[str, str]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a" and self._skip_depth == 0:
            # nested <a> is invalid HTML; treat a new start as closing the
            # previous anchor, matching browser recovery
            if self._href is not None:
                self._emit()
            # a bare `href` attribute parses as ('href', None) — browsers
            # treat it as href=""
            self._href = dict(attrs).get("href") or ""
            self._text_parts = []

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        # </a> inside a skipped subtree must not close an outer anchor
        if tag == "a" and self._skip_depth == 0 and self._href is not None:
            self._emit()

    def handle_data(self, data: str) -> None:
        if self._href is not None and self._skip_depth == 0:
            self._text_parts.append(data)

    def _emit(self) -> None:
        self.links.append((self._href or "", "".join(self._text_parts)))
        self._href = None
        self._text_parts = []


def extract_links(html: str) -> list[tuple[str, str]]:
    """All (href, anchor_text) pairs in document order; anchors inside
    script/style subtrees are ignored, missing href becomes ''."""
    p = _LinkParser()
    p.feed(html)
    p.close()
    if p._href is not None:        # truncated page: keep the pending anchor
        p._emit()                  # (browsers render it; crawls truncate often)
    return p.links
