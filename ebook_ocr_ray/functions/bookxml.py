"""Book model -> hierarchical XML.

Re-expresses the reference's transformer + page grouper
(/root/reference/src/book_converter/transformer.py,
page_grouper/hierarchy.py, xml_builder.py): chapters from level-1
structure headings, sections from level-2, pages flattened to comments,
running-head suppression, no-TOC fallback to a single "Content" chapter,
parse errors embedded as comments.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from ebook_ocr_ray.functions.bookparse import (
    Element,
    ParsedDoc,
    detect_running_head,
    match_toc_to_headings,
    normalize_heading,
)

def build_head_patterns(
    level_keywords: dict[int, tuple[str, ...]] | None = None,
) -> tuple[re.Pattern, re.Pattern]:
    """Compile (chapter, section) heading matchers from the configurable
    structure keywords (§2.10 — same config surface as
    bookparse.build_toc_patterns); defaults reproduce
    Chapter/第N章 + Section exactly."""
    from ebook_ocr_ray.functions.bookparse import DEFAULT_LEVEL_KEYWORDS

    kw = level_keywords or DEFAULT_LEVEL_KEYWORDS
    ch = "|".join(re.escape(w) for w in kw.get(1, ("Chapter",)))
    sec = "|".join(re.escape(w) for w in kw.get(2, ("Section",)))
    chapter = re.compile(rf"^(?:(?:{ch})\s+(\d+)|第(\d+)章)\s*(.*)$", re.IGNORECASE)
    section = re.compile(rf"^(?:(?:{sec})\s+)?(\d+\.\d+)(?!\.)\s*(.*)$", re.IGNORECASE)
    return chapter, section


_CHAPTER_HEAD, _SECTION_HEAD = build_head_patterns()


_EMPHASIS_SPLIT = re.compile(r"\*\*(.+?)\*\*")


# --- read-aloud exclusion table (G4) ---------------------------------------
# Priority-ordered heading exclusion patterns, the static half of the
# reference's DEFAULT_EXCLUSION_PATTERNS (src/book_converter/config.py:12-61)
# + match_exclusion_pattern (analyzer.py:154-181). The dynamic half
# (running-head detection) stays in detect_running_head. Config-driven per
# SURVEY.md §2.10: pass a custom table to build_book_xml to extend it.


class ExclusionPattern:
    """One read-aloud exclusion rule: a heading matching ``pattern`` is
    emitted with readAloud="false". ``pattern=None`` marks the dynamic
    running-head slot (handled elsewhere; kept so custom tables can mirror
    the reference's priority ordering)."""

    __slots__ = ("id", "priority", "pattern", "description", "_compiled")

    def __init__(self, id: str, priority: int, pattern: str | None,
                 description: str = ""):
        self.id = id
        self.priority = priority
        self.pattern = pattern
        self.description = description
        self._compiled = re.compile(pattern) if pattern else None

    def matches(self, text: str) -> bool:
        return bool(self._compiled and self._compiled.match(text))


DEFAULT_EXCLUSION_PATTERNS: tuple[ExclusionPattern, ...] = (
    ExclusionPattern("running-head", 100, None, "running head (dynamic)"),
    ExclusionPattern("page-number", 90, r".*[―—]\s*\d+\s*/\s*\d+$", "page position"),
    ExclusionPattern("decoration", 50, r"^[◆◇■□●○▲△]+$", "decoration-only"),
    ExclusionPattern("section-label", 50, r"^Section\s+\d+\.\d+$", "bare section label"),
    ExclusionPattern("reference", 30, r"^Webサイト$", "website reference"),
    ExclusionPattern("footnote", 30, r"^注\d+\.\d+", "footnote number"),
)


_DEFAULT_SORTED = tuple(
    sorted(DEFAULT_EXCLUSION_PATTERNS, key=lambda p: -p.priority)
)


def match_exclusion(
    text: str, patterns: tuple[ExclusionPattern, ...] = DEFAULT_EXCLUSION_PATTERNS
) -> ExclusionPattern | None:
    """First matching static pattern in priority order (ties keep table
    order), or None — reference analyzer.py:154-181 semantics. The
    default table's sort is precomputed: this runs once per heading in
    the structural hot path."""
    if not text:
        return None
    if patterns is DEFAULT_EXCLUSION_PATTERNS:
        ordered = _DEFAULT_SORTED
    else:
        ordered = sorted(patterns, key=lambda p: -p.priority)
    for p in ordered:
        if p.matches(text):
            return p
    return None


def set_text_with_emphasis(node: ET.Element, text: str) -> None:
    """``**x**`` runs become <em> children (reference
    transformer_utils.py:80-116); plain text stays as node.text."""
    parts = _EMPHASIS_SPLIT.split(text)
    if len(parts) == 1:
        node.text = text
        return
    node.text = parts[0]
    for i in range(1, len(parts), 2):
        em = ET.SubElement(node, "em")
        em.text = parts[i]
        em.tail = parts[i + 1] if i + 1 < len(parts) else ""


def _append_element(
    parent: ET.Element,
    el: Element,
    running_head: str | None,
    container_title: str = "",
) -> None:
    if el.kind == "heading":
        if running_head and normalize_heading(el.text) == running_head:
            return                                    # running head: page chrome
        if container_title and _is_duplicate_heading(el.text, container_title):
            return      # repeats the chapter/section title (reference
            #             transformer_utils.py:13-77 duplicate suppression)
        node = ET.SubElement(parent, "heading", level=str(el.level),
                             readAloud=str(el.read_aloud).lower())
        set_text_with_emphasis(node, el.text)
    elif el.kind == "paragraph":
        node = ET.SubElement(parent, "paragraph", readAloud=str(el.read_aloud).lower())
        set_text_with_emphasis(node, el.text)
    elif el.kind == "list":
        node = ET.SubElement(parent, "list", type=el.list_type or "unordered",
                             readAloud=str(el.read_aloud).lower())
        for item in el.items:
            it = ET.SubElement(node, "item")
            it.text = item
    elif el.kind == "figure":
        attrs = {"src": el.text}
        if el.caption:
            attrs["caption"] = el.caption
        ET.SubElement(parent, "figure", **attrs)


def _is_duplicate_heading(heading_text: str, container_title: str) -> bool:
    """True when the heading restates the enclosing chapter/section title
    (compared after stripping Chapter/Section/number prefixes)."""
    from ebook_ocr_ray.functions.bookparse import split_structure_prefix

    _, bare = split_structure_prefix(heading_text)
    return normalize_heading(bare) == normalize_heading(container_title) != ""


def _apply_exclusions(
    doc: ParsedDoc, patterns: tuple[ExclusionPattern, ...]
) -> ParsedDoc:
    """readAloud="false" on every heading matching the static exclusion
    table (reference apply_read_aloud_rules, analyzer.py:213-271).
    Returns the input unchanged when nothing matches."""
    from dataclasses import replace

    changed = False
    new_pages = []
    for page in doc.pages:
        els = []
        for el in page.elements:
            if (
                el.kind == "heading"
                and el.read_aloud
                and match_exclusion(el.text, patterns) is not None
            ):
                el = replace(el, read_aloud=False)
                changed = True
            els.append(el)
        new_pages.append(replace(page, elements=els))
    return replace(doc, pages=new_pages) if changed else doc


def build_book_xml(
    doc: ParsedDoc,
    title: str = "",
    level_keywords: dict[int, tuple[str, ...]] | None = None,
    exclusion_patterns: tuple[ExclusionPattern, ...] = DEFAULT_EXCLUSION_PATTERNS,
) -> str:
    """Serialize a parsed document to the book XML contract.
    ``level_keywords`` overrides the structure-keyword config (§2.10);
    ``exclusion_patterns`` the read-aloud exclusion table (G4)."""
    chapter_head, section_head = (
        build_head_patterns(level_keywords)
        if level_keywords is not None
        else (_CHAPTER_HEAD, _SECTION_HEAD)
    )
    doc = _apply_exclusions(doc, exclusion_patterns)
    running_head = detect_running_head(doc)
    toc = match_toc_to_headings(doc.toc, doc.headings)

    book = ET.Element("book")
    meta = ET.SubElement(book, "metadata")
    ET.SubElement(meta, "title").text = title
    ET.SubElement(meta, "pages").text = str(len(doc.pages))

    if toc:
        toc_el = ET.SubElement(book, "toc")
        for entry in toc:
            ET.SubElement(
                toc_el,
                "entry",
                level=str(entry.level),
                number=entry.number,
                page=entry.page,
                match=entry.match_kind,
            ).text = entry.text

    # walk pages in order, opening chapters/sections at structure headings
    current_chapter: ET.Element | None = None
    current_section: ET.Element | None = None
    front = ET.SubElement(book, "front-matter")

    def target() -> ET.Element:
        return current_section if current_section is not None else (
            current_chapter if current_chapter is not None else front
        )

    for page in doc.pages:
        attrs = {"number": page.number}
        if page.metadata:
            attrs["meta"] = page.metadata
            attrs["metaType"] = page.meta_type
        pagebreak_pending = True

        def emit_pagebreak() -> None:
            nonlocal pagebreak_pending
            if pagebreak_pending:
                ET.SubElement(target(), "pagebreak", **attrs)
                pagebreak_pending = False

        for el in page.elements:
            if el.kind == "heading":
                ch = chapter_head.match(el.text.strip())
                if el.level == 1 and ch:
                    number = ch.group(1) or ch.group(2)
                    title = ch.group(3).strip()
                    if (
                        current_chapter is not None
                        and current_chapter.get("number") == number
                        and current_chapter.get("title") == title
                    ):
                        # repeat of the open chapter's own heading (a
                        # running head) — page chrome, not a new chapter
                        emit_pagebreak()
                        continue
                    current_chapter = ET.SubElement(
                        book, "chapter", number=number, title=title
                    )
                    current_section = None
                    # a chapter opens on its page: the pagebreak belongs
                    # INSIDE the new chapter, not the previous container
                    emit_pagebreak()
                    continue
                sec = section_head.match(el.text.strip())
                if el.level == 2 and sec and current_chapter is not None:
                    number, title = sec.group(1), sec.group(2).strip()
                    if (
                        current_section is not None
                        and current_section.get("number") == number
                        and current_section.get("title") == title
                    ):
                        emit_pagebreak()
                        continue
                    current_section = ET.SubElement(
                        current_chapter, "section", number=number, title=title
                    )
                    emit_pagebreak()
                    continue
            emit_pagebreak()
            container = target()
            _append_element(container, el, running_head, container.get("title", ""))
        emit_pagebreak()      # empty page still records its break

    # no structure headings at all -> single Content chapter fallback
    if current_chapter is None and len(front) > 0:
        fallback = ET.SubElement(book, "chapter", number="1", title="Content")
        for child in list(front):
            front.remove(child)
            fallback.append(child)

    if len(front) == 0:
        book.remove(front)

    for err in doc.errors:
        book.append(ET.Comment(f" ERROR: {err} "))

    return ET.tostring(book, encoding="unicode")
