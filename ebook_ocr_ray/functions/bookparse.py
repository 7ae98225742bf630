"""Per-document structural compiler: page-marked markdown -> book model.

Fresh re-expression of the reference's book_converter parse semantics
(/root/reference/src/book_converter/): page markers, toc/content/skip
marker stack, headings with the level>3 clamp, paragraph continuation
merge, bullet/ordered lists, figure comments, TOC entries with leader
extraction, running-head detection, and two-pass TOC<->heading matching
with a sequential constraint.

Everything here is pure per-document Python: a document is one row, the
marker stack persists across its pages (the reference's key doc-scoped
state, parser/page.py:529), and nothing leaks across rows — which is what
makes the stage embarrassingly parallel in map_batches.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from difflib import SequenceMatcher

# --- markers (reference parser/page.py:38-116, parser/toc.py:10-76) -------

_PAGE_FULL = re.compile(r"---\s+[Pp]age\s+(\d+)\s+\((.+?)\)\s+---")
_PAGE_SHORT = re.compile(r"---\s+page_(\d+)\s+---")
_PAGE_NONUM = re.compile(r"---\s+[Pp]age\s+\((.+?)\)\s+---")
_PAGE_COLON = re.compile(r"---\s+[Pp]age:\s*(.+?)\s*---")
_TOC_MARK = re.compile(r"<!--\s*(/?)\s*toc\s*-->", re.IGNORECASE)
_CONTENT_MARK = re.compile(r"<!--\s*(/?)\s*content\s*-->", re.IGNORECASE)
_SKIP_MARK = re.compile(r"<!--\s*(/?)\s*skip\s*-->", re.IGNORECASE)
_FIGURE_MARK = re.compile(r"<!--\s*FIGURE:\s*(.+?)\s*-->", re.IGNORECASE)
_FIGURE_PLACEHOLDER = re.compile(r"^\[(図|写真|表|イラスト|グラフ|チャート)([^\]]*)\]$")
_FIGURE_INLINE = re.compile(r"\[(図|写真|表|イラスト|グラフ|チャート)([^\]]*)\]")
_PAGE_META = re.compile(r"^(.*?)\s*(\d+)\s*/\s*(\d+)\s*$")
_HEADING = re.compile(r"^(#{1,6})\s*(.*)$")

BULLETS = ("●", "○", "◎", "•", "·", "・", "◆", "◇", "■", "□", "▶", "▷", "►", "-", "*")
_ORDERED = re.compile(
    r"^\s*([①②③④⑤⑥⑦⑧⑨⑩⑪⑫⑬⑭⑮⑯⑰⑱⑲⑳]|[（(]\d+[)）]|\d+[.．)）])\s*(.*)$"
)

TERMINATORS = {"。", ".", "!", "！", "?", "？"}
TERMINATOR_PAIRS = {"）。", "」。"}


def parse_page_marker(line: str) -> tuple[str, str] | None:
    """(page_number, source_file) for the three marker formats, else None."""
    m = _PAGE_FULL.search(line)
    if m:
        return m.group(1), m.group(2)
    m = _PAGE_SHORT.search(line)
    if m:
        return str(int(m.group(1))), f"page_{m.group(1)}"
    m = _PAGE_NONUM.search(line)
    if m:
        return "", m.group(1)
    m = _PAGE_COLON.search(line)
    if m:
        src = m.group(1).strip()
        num = re.search(r"page_(\d+)", src)
        return (str(int(num.group(1))) if num else ""), src
    return None


def parse_marker(line: str) -> str | None:
    """toc / /toc / content / /content / skip / /skip, else None."""
    for rx, name in ((_TOC_MARK, "toc"), (_CONTENT_MARK, "content"), (_SKIP_MARK, "skip")):
        m = rx.search(line)
        if m:
            return ("/" if m.group(1) else "") + name
    return None


def parse_heading(line: str) -> tuple[int, str, str | None] | None:
    """(level, text, warning). Levels 4-6 clamp to 3 with a warning
    (reference parser/heading.py:66-125)."""
    m = _HEADING.match(line)
    if not m:
        return None
    raw_level = len(m.group(1))
    level = min(raw_level, 3)
    warning = f"heading level {raw_level} clamped to 3" if raw_level > 3 else None
    return level, m.group(2), warning


def parse_list_line(line: str) -> tuple[str, str] | None:
    """(list_type, content) or None (reference parser/utils.py:15-74).

    The ASCII markers '-' and '*' double as emphasis/rule syntax, so they
    require a following space ('- item', '* item'); without it a
    '**bold**' paragraph would lose its first '*' and '---' would become
    a one-item list. Glyph bullets (●•・…) bind with or without space.
    """
    stripped = line.strip()
    if not stripped:
        return None
    for marker in BULLETS:
        if stripped.startswith(marker):
            if marker in ("-", "*") and not stripped[len(marker):].startswith(" "):
                continue
            rest = stripped[len(marker):].lstrip()
            if rest:
                return "unordered", rest
    m = _ORDERED.match(stripped)
    if m and m.group(2).strip():
        return "ordered", m.group(2).strip()
    return None


def parse_figure(line: str) -> str | None:
    """Figure comment path or a standalone placeholder marker
    ([図N] / [写真N] / [表N] / [イラスト] / [グラフ] / [チャート],
    reference parser/figure.py:49-105)."""
    m = _FIGURE_MARK.search(line)
    if m:
        return m.group(1)
    m = _FIGURE_PLACEHOLDER.match(line.strip())
    if m:
        return f"{m.group(1)}{m.group(2)}"
    return None


def find_figure_marker(text: str) -> str | None:
    """First inline figure marker anywhere in a text run (the reference's
    re.search behavior for caption harvesting)."""
    m = _FIGURE_INLINE.search(text)
    return f"{m.group(1)}{m.group(2)}" if m else None


def parse_page_metadata(text: str) -> tuple[str, int, int, str] | None:
    """'name N / M' page-position metadata -> (section_name, current,
    total, meta_type); meta_type is 'section-page' when the name contains
    節, else 'chapter-page' (reference parser/page.py:135-177)."""
    m = _PAGE_META.match(text.strip())
    if not m:
        return None
    name = m.group(1).strip()
    meta_type = "section-page" if "節" in name else "chapter-page"
    return name, int(m.group(2)), int(m.group(3)), meta_type


_ENTRY_START = re.compile(
    r"(?:Chapter\s+\d+\s)|(?:Section\s+\d+\.\d+\s)|(?:Subsection\s+\d+\.\d+\.\d+\s)"
    r"|(?:第\d+章)|(?:(?<=\s)\d+\.\d+(?:\.\d+)*\s)",
    re.IGNORECASE,
)
_KEYWORD_TAIL = re.compile(r"(Chapter|Section|Subsection)\s*$", re.IGNORECASE)


def split_compound_toc_line(line: str) -> list[str]:
    """Lookahead split of a TOC line carrying several entries
    ('1.1 Foo 1.2 Bar' -> ['1.1 Foo', '1.2 Bar']; reference
    parser/toc.py split_toc_entries). A bare-number start directly after a
    Section/Chapter keyword belongs to that keyword's entry and does not
    split. Single-entry lines pass through."""
    cuts = [0]
    for m in _ENTRY_START.finditer(line):
        start = m.start()
        if start == 0:
            continue
        if _KEYWORD_TAIL.search(line[:start]):
            continue                      # number belongs to the keyword entry
        cuts.append(start)
    parts = [
        line[a:b].strip() for a, b in zip(cuts, cuts[1:] + [len(line)])
    ]
    parts = [p for p in parts if p]
    return parts if len(parts) > 1 else [line]


def merge_split_toc_lines(lines: list[str]) -> list[str]:
    """Join entries whose keyword and body landed on separate lines:
    'Chapter' + '1 Title' -> 'Chapter 1 Title'; 'Episode 01' + 'Title' ->
    'Episode 01 Title'. Blank lines between the halves don't block the
    merge (reference parser/toc.py merge_toc_lines)."""
    out: list[str] = []
    pending: str | None = None
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        if pending is not None:
            out.append(f"{pending} {line}")
            pending = None
            continue
        if re.fullmatch(r"(Chapter|Section|Subsection|Column)", line, re.IGNORECASE):
            pending = line
        elif re.fullmatch(r"(Episode|Column)\s+\d+", line, re.IGNORECASE):
            pending = line
        else:
            out.append(line)
    if pending is not None:
        out.append(pending)
    return out


def ends_with_terminator(text: str) -> bool:
    # NOTE: the pair check is unreachable (both pairs end in 。, already a
    # TERMINATORS member) — preserved verbatim because the reference has
    # the identical dead branch (parser/paragraph.py:136-141) and frozen
    # semantics beat tidiness here
    t = text.rstrip()
    if not t:
        return False
    return t[-1] in TERMINATORS or t[-2:] in TERMINATOR_PAIRS


def merge_continuations(paragraphs: list[str]) -> list[str]:
    """Fold paragraphs that don't end in a sentence terminator into their
    successor (no joining space — CJK-first rule, reference
    parser/paragraph.py:97-159). The last paragraph never merges forward."""
    out: list[str] = []
    carry = ""
    for i, p in enumerate(paragraphs):
        text = (carry + p).strip()
        if ends_with_terminator(text) or i == len(paragraphs) - 1:
            if text:
                out.append(text)
            carry = ""
        else:
            carry = text
    return out


# --- TOC entries (reference parser/toc.py:326-482) -------------------------

_LEADER_DOTS = re.compile(r"\.{2,}\s*(\d+)\s*$")
_LEADER_DASH = re.compile(r"[─\-]{2,}\s*(\d+)\s*$")
_LEADER_SPACE = re.compile(r"\s{3,}(\d+)\s*$")
_MD_PREFIX = re.compile(r"^\s*(#{1,6}|[-*])\s*")
_EMPHASIS = re.compile(r"\*\*(.+?)\*\*")

# Structure keywords are CONFIG, not code (the reference's CLAUDE.md
# mandate, SURVEY.md §2.10: --header-level1..5 pipe-separated keywords).
# build_toc_patterns compiles a pattern set from keyword lists; the
# module-level default reproduces the built-in Chapter/Section/第N章 set.
DEFAULT_LEVEL_KEYWORDS: dict[int, tuple[str, ...]] = {
    1: ("Chapter",),
    2: ("Section",),
    3: ("Subsection",),
}


def build_toc_patterns(
    level_keywords: dict[int, tuple[str, ...]] | None = None,
) -> list[tuple[re.Pattern, int]]:
    """Compile TOC entry patterns from configurable level keywords plus
    the fixed numeric/Japanese forms. Keywords are matched
    case-insensitively with a level-appropriate dotted number."""
    kw = level_keywords or DEFAULT_LEVEL_KEYWORDS
    number_for_level = {1: r"(\d+)", 2: r"(\d+\.\d+)", 3: r"(\d+\.\d+\.\d+)"}
    patterns: list[tuple[re.Pattern, int]] = []
    for level in sorted(kw):
        num = number_for_level.get(level, r"(\d+(?:\.\d+)*)")
        for word in kw[level]:
            patterns.append(
                (re.compile(rf"^{re.escape(word)}\s+{num}\s*(.*)$", re.IGNORECASE), level)
            )
    patterns += [
        (re.compile(r"^(\d+\.\d+\.\d+\.\d+\.\d+)\s+(.+)$"), 5),
        (re.compile(r"^(\d+\.\d+\.\d+\.\d+)\s+(.+)$"), 4),
        (re.compile(r"^(\d+\.\d+\.\d+)\s+(.+)$"), 3),
        (re.compile(r"^(\d+\.\d+)\s+(.+)$"), 2),
        (re.compile(r"^第(\d+)章\s*(.*)$"), 1),
    ]
    return patterns


_TOC_PATTERNS: list[tuple[re.Pattern, int]] = build_toc_patterns()


@dataclass
class TocEntry:
    text: str
    level: int
    number: str
    page: str
    matched_line: int = -1          # body line matched in pass 1/2
    match_kind: str = "missing"     # exact | fuzzy | missing


def parse_toc_entry(
    line: str, patterns: list[tuple[re.Pattern, int]] | None = None
) -> TocEntry | None:
    if not line.strip():
        return None
    page = ""
    for rx in (_LEADER_DOTS, _LEADER_DASH, _LEADER_SPACE):
        m = rx.search(line)
        if m:
            page = m.group(1)
            line = line[: m.start()]
            break
    line = _MD_PREFIX.sub("", line)
    line = _EMPHASIS.sub(r"\1", line).strip()
    for rx, level in (patterns if patterns is not None else _TOC_PATTERNS):
        m = rx.match(line)
        if m:
            return TocEntry(text=(m.group(2) or "").strip(), level=level,
                            number=m.group(1), page=page)
    if line:
        # standalone entry without a number (はじめに / Preface style)
        return TocEntry(text=line, level=1, number="", page=page)
    return None


# --- document model --------------------------------------------------------


@dataclass
class Element:
    kind: str                         # heading | paragraph | list | figure
    text: str = ""
    level: int = 0
    items: tuple[str, ...] = ()
    list_type: str = ""
    read_aloud: bool = True
    caption: str = ""                 # figure only: harvested **bold** caption


@dataclass
class Page:
    number: str
    source_file: str
    elements: list[Element] = field(default_factory=list)
    metadata: str = ""              # raw 'name N / M' page-position line
    meta_type: str = ""             # chapter-page | section-page


@dataclass
class ParsedDoc:
    pages: list[Page]
    toc: list[TocEntry]
    errors: list[str]
    headings: list[tuple[int, int, str]]    # (global_line, level, text)


def parse_document(
    book_md: str,
    level_keywords: dict[int, tuple[str, ...]] | None = None,
) -> ParsedDoc:
    """The page micro-parser (reference parser/page.py:515-668): one pass
    over the document's lines; the content/skip marker stack persists
    across page boundaries; TOC lines are collected between toc markers.
    ``level_keywords`` overrides the structure-keyword config (§2.10) for
    TOC entry recognition."""
    toc_patterns = (
        build_toc_patterns(level_keywords) if level_keywords is not None else _TOC_PATTERNS
    )
    pages: list[Page] = []
    toc: list[TocEntry] = []
    errors: list[str] = []
    headings: list[tuple[int, int, str]] = []

    marker_stack: list[str] = []
    in_toc = False
    toc_lines: list[str] = []
    current = Page(number="", source_file="")
    para_lines: list[str] = []
    list_items: list[str] = []
    list_type = ""

    def read_aloud() -> bool:
        return not marker_stack or marker_stack[-1] != "skip"

    def flush_paragraphs() -> None:
        nonlocal para_lines
        if para_lines:
            joined = " ".join(s.strip() for s in para_lines if s.strip())
            if joined:
                current.elements.append(
                    Element("paragraph", text=joined, read_aloud=read_aloud())
                )
            para_lines = []

    def flush_list() -> None:
        nonlocal list_items, list_type
        if list_items:
            current.elements.append(
                Element("list", items=tuple(list_items), list_type=list_type,
                        read_aloud=read_aloud())
            )
            list_items = []
            list_type = ""

    def flush_all() -> None:
        flush_paragraphs()
        flush_list()

    for lineno, line in enumerate(book_md.split("\n")):
        marker = parse_page_marker(line)
        if marker is not None:
            flush_all()
            if current.elements or current.number:
                pages.append(current)
            current = Page(number=marker[0], source_file=marker[1])
            continue

        state = parse_marker(line)
        if state is not None:
            flush_all()
            if state == "toc":
                in_toc = True
            elif state == "/toc":
                in_toc = False
            elif state in ("content", "skip"):
                marker_stack.append(state)
            elif state in ("/content", "/skip"):
                want = state[1:]
                if marker_stack and marker_stack[-1] == want:
                    marker_stack.pop()
                else:
                    errors.append(f"line {lineno}: unbalanced <!-- {state} -->")
            continue

        if in_toc:
            toc_lines.append(line)
            continue

        # 'name N / M' is page-position metadata, not a paragraph
        # (reference page.py:135-177). Recognized near the top of a page:
        # before any content, or directly after heading(s) (the running-
        # head-then-metadata layout) — but never once body text started,
        # where a trailing 'N / M' is more likely real prose.
        if (
            not para_lines
            and not list_items
            and all(e.kind == "heading" for e in current.elements)
            and not current.metadata
            and line.strip()
        ):
            meta = parse_page_metadata(line)
            if meta is not None:
                current.metadata = line.strip()
                current.meta_type = meta[3]
                continue

        fig = parse_figure(line)
        if fig is not None:
            flush_all()
            current.elements.append(Element("figure", text=fig, read_aloud=False))
            continue

        # a **bold** line right after a figure is its caption (reference
        # parser/figure.py:108-167 caption harvest)
        stripped = line.strip()
        if (
            current.elements
            and not para_lines
            and not list_items
            and current.elements[-1].kind == "figure"
            and not current.elements[-1].caption
            and stripped.startswith("**")
            and stripped.endswith("**")
            and len(stripped) > 4
        ):
            current.elements[-1].caption = stripped[2:-2].strip()
            continue

        h = parse_heading(line)
        if h is not None:
            flush_all()
            level, text, warning = h
            if warning:
                errors.append(f"line {lineno}: {warning}")
            current.elements.append(
                Element("heading", text=text, level=level, read_aloud=read_aloud())
            )
            headings.append((lineno, level, text))
            continue

        li = parse_list_line(line)
        if li is not None:
            flush_paragraphs()
            if list_items and li[0] != list_type:
                flush_list()
            list_type = li[0]
            list_items.append(li[1])
            continue

        if not line.strip():
            flush_all()
            continue

        flush_list()
        para_lines.append(line)

    flush_all()
    if current.elements or current.number:
        pages.append(current)

    # TOC assembly: merge split entries, then lookahead-split compound
    # lines, then parse (reference toc.py merge_toc_lines +
    # split_toc_entries ordering)
    for toc_line in merge_split_toc_lines(toc_lines):
        for part in split_compound_toc_line(toc_line):
            entry = parse_toc_entry(part, toc_patterns)
            if entry is not None:
                toc.append(entry)

    # paragraph continuation merge runs per page, after the scan
    for page in pages:
        merged: list[Element] = []
        run: list[Element] = []
        for el in page.elements + [Element("_end")]:
            if el.kind == "paragraph":
                if run and run[-1].read_aloud != el.read_aloud:
                    # a read-aloud boundary ends the merge run: skip-marked
                    # text must not absorb (or be absorbed by) spoken text
                    texts = merge_continuations([p.text for p in run])
                    merged.extend(
                        Element("paragraph", text=t, read_aloud=run[0].read_aloud)
                        for t in texts
                    )
                    run = []
                run.append(el)
                continue
            if run:
                texts = merge_continuations([p.text for p in run])
                merged.extend(
                    Element("paragraph", text=t, read_aloud=run[0].read_aloud)
                    for t in texts
                )
                run = []
            if el.kind != "_end":
                merged.append(el)
        page.elements = merged

    return ParsedDoc(pages=pages, toc=toc, errors=errors, headings=headings)


# --- heading analysis (reference analyzer.py:41-151) -----------------------


_DASHES = "‐-–—―−ー"


def normalize_heading(text: str) -> str:
    out = text.strip()
    for d in _DASHES:
        out = out.replace(d, "-")
    out = re.sub(r"\s+", " ", out)
    return out


_NUM_PREFIX_RE = re.compile(r"^(\d+(?:\.\d+)*)\s+")
_STRUCT_PREFIX_RE = re.compile(
    r"^(?:(?:Chapter|Section|Subsection)\s+(\d+(?:\.\d+)*)\s*|第(\d+)章\s*)",
    re.IGNORECASE,
)


def split_structure_prefix(text: str) -> tuple[str, str]:
    """Split a heading into (number, bare title): 'Chapter 2 Intro' ->
    ('2', 'Intro'), '2.1 Foo' -> ('2.1', 'Foo'), 'Plain' -> ('', 'Plain')
    (reference transformer_utils.py:13-77 comparison normalization)."""
    m = _STRUCT_PREFIX_RE.match(text.strip())
    if m:
        return (m.group(1) or m.group(2)), text.strip()[m.end():].strip()
    m = _NUM_PREFIX_RE.match(text.strip())
    if m:
        return m.group(1), text.strip()[m.end():].strip()
    return "", text.strip()


def document_health(doc: ParsedDoc) -> dict:
    """Invariant checks (reference G7/G8: validate_page_count fails at
    >50% page loss, error rate warns at >10%): numbered-page continuity
    against the highest seen page number, and parse-error rate."""
    numbered = [int(p.number) for p in doc.pages if p.number.isdigit()]
    expected = max(numbered) if numbered else 0
    present = len(set(numbered))
    loss_pct = int(round(100 * (expected - present) / expected)) if expected else 0
    n_pages = max(len(doc.pages), 1)
    err_pct = int(round(100 * len(doc.errors) / n_pages))
    return {
        "n_pages": len(doc.pages),
        "page_loss_pct": loss_pct,
        "page_count_ok": loss_pct <= 50,
        "error_rate_pct": err_pct,
        "error_rate_ok": err_pct <= 10,
    }


def detect_running_head(doc: ParsedDoc) -> str | None:
    """Most frequent level-1 heading with count >= max(pages*0.5, 2) is a
    running head (page-chrome, excluded from read-aloud)."""
    counts: dict[str, int] = {}
    for _, level, text in doc.headings:
        if level == 1:
            key = normalize_heading(text)
            counts[key] = counts.get(key, 0) + 1
    if not counts:
        return None
    best = max(counts, key=counts.get)
    threshold = max(len(doc.pages) * 0.5, 2)
    return best if counts[best] >= threshold else None


# --- TOC <-> heading matching (reference heading_matcher.py:55-236) --------


def match_toc_to_headings(
    toc: list[TocEntry],
    headings: list[tuple[int, int, str]],
    fuzzy_threshold: float = 0.8,
) -> list[TocEntry]:
    """Two-pass order-constrained matching:

    pass 1 — exact normalized-text equality, scanning forward only (match
    lines must be strictly increasing across entries);
    pass 2 — for the remaining entries, best fuzzy ratio >= threshold
    bounded between the neighbors' matched lines.
    """
    from ebook_ocr_ray.functions.normalize import normalize_heading_number

    norm_heads = [
        (
            ln,
            normalize_heading(text),
            normalize_heading(split_structure_prefix(normalize_heading_number(text))[1]),
        )
        for ln, _lvl, text in headings
    ]

    cursor = -1
    for entry in toc:
        want = normalize_heading(entry.text)
        if not want:
            continue
        for ln, head, bare in norm_heads:
            # exact on the full heading OR on the heading with its
            # Chapter/Section/number prefix stripped ('Chapter 1 Intro'
            # matches a TOC entry whose text is 'Intro' + number '1')
            if ln > cursor and (head == want or bare == want):
                entry.matched_line = ln
                entry.match_kind = "exact"
                cursor = ln
                break

    for i, entry in enumerate(toc):
        if entry.match_kind != "missing" or not entry.text:
            continue
        lo = max(
            (e.matched_line for e in toc[:i] if e.matched_line >= 0), default=-1
        )
        hi = min(
            (e.matched_line for e in toc[i + 1:] if e.matched_line >= 0),
            default=max((ln for ln, _h, _b in norm_heads), default=-1) + 1,
        )
        want = normalize_heading(entry.text)
        best_ln, best_ratio = -1, fuzzy_threshold
        for ln, head, bare in norm_heads:
            if not (lo < ln < hi):
                continue
            ratio = max(
                SequenceMatcher(None, want, head).ratio(),
                SequenceMatcher(None, want, bare).ratio(),
            )
            if ratio > best_ratio:
                best_ln, best_ratio = ln, ratio
        if best_ln >= 0:
            entry.matched_line = best_ln
            entry.match_kind = "fuzzy"

    return toc
