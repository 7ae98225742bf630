"""Minimal DOM block model built on html.parser (stdlib; no lxml in env).

Parses an HTML document into a flat list of text Blocks annotated with:

- ``path``: tuple of ancestor tags (outermost first)
- ``offset``: absolute char offset of the block's first text chunk in the
  decoded HTML — this is the engine's synthetic "document coordinate"; all
  extractor variants derive span geometry from it, so the same block gets
  the same y in every variant regardless of what else each variant keeps
  (the analog of physical page coordinates in the OCR reference).
- ``link_chars``: chars contributed by <a> descendants (for link-density)

Entities are unescaped by the parser (convert_charrefs=True). Text inside a
block is concatenated verbatim — no whitespace normalization — so
extraction can be byte-identical to the source content.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li pre blockquote td th dt dd figcaption caption title".split()
)
SKIP_TAGS = frozenset("script style template noscript svg".split())
VOID_TAGS = frozenset("br hr img meta link input area base col embed source track wbr".split())
CHROME_TAGS = frozenset("header footer nav aside".split())
MAIN_TAGS = frozenset("main article".split())
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())


@dataclass
class Block:
    """One logical text block (paragraph / heading / list item / ...)."""

    tag: str                       # the block element's own tag
    path: tuple[str, ...]          # ancestor tags, outermost -> innermost (incl. own)
    offset: int                    # char offset of first text chunk
    parent_id: int                 # index identifying the block's parent element
    text: str = ""
    link_chars: int = 0

    @property
    def length(self) -> int:
        return len(self.text)

    @property
    def link_density(self) -> float:
        return self.link_chars / len(self.text) if self.text else 0.0

    @property
    def in_main(self) -> bool:
        return any(t in MAIN_TAGS for t in self.path)

    @property
    def in_chrome(self) -> bool:
        return any(t in CHROME_TAGS for t in self.path)

    @property
    def in_head(self) -> bool:
        return "head" in self.path

    @property
    def in_figure(self) -> bool:
        return "figure" in self.path

    @property
    def is_heading(self) -> bool:
        return self.tag in HEADING_TAGS

    @property
    def commas(self) -> int:
        return self.text.count(",") + self.text.count("、")


@dataclass
class _Open:
    tag: str
    elem_id: int
    block: Block | None = None     # the block this element opened, if any


class _BlockParser(HTMLParser):
    def __init__(self, line_starts: list[int]):
        super().__init__(convert_charrefs=True)
        self._line_starts = line_starts
        self._stack: list[_Open] = []
        self._skip_depth = 0
        self._link_depth = 0
        self._next_elem_id = 0
        self.blocks: list[Block] = []

    # -- position helper ----------------------------------------------------
    def _abs_offset(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    # -- element lifecycle --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in VOID_TAGS:
            return
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
        self._next_elem_id += 1
        self._stack.append(_Open(tag, self._next_elem_id))

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        if tag in SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if tag == "a" and self._link_depth:
            self._link_depth -= 1
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        block = self._target_block()
        if block is None:
            if not data.strip():
                return
            block = self._open_implicit_block()
        if not block.text and not data.strip() and block.tag not in BLOCK_TAGS:
            return
        block.text += data
        if self._link_depth:
            block.link_chars += len(data)

    # -- block bookkeeping --------------------------------------------------
    def _target_block(self) -> Block | None:
        """Nearest enclosing element that already owns a block, or a new
        block if the nearest BLOCK_TAGS ancestor has none yet."""
        for i in range(len(self._stack) - 1, -1, -1):
            entry = self._stack[i]
            if entry.block is not None:
                return entry.block
            if entry.tag in BLOCK_TAGS:
                parent_id = self._stack[i - 1].elem_id if i > 0 else 0
                entry.block = Block(
                    tag=entry.tag,
                    path=tuple(e.tag for e in self._stack[: i + 1]),
                    offset=self._abs_offset(),
                    parent_id=parent_id,
                )
                self.blocks.append(entry.block)
                return entry.block
        return None

    def _open_implicit_block(self) -> Block:
        """Bare text directly under a container (body/div/...): give its
        immediate parent an anonymous block."""
        if self._stack:
            entry = self._stack[-1]
            parent_id = self._stack[-2].elem_id if len(self._stack) > 1 else 0
            path = tuple(e.tag for e in self._stack)
            tag = entry.tag
        else:
            entry, parent_id, path, tag = None, 0, ("#text",), "#text"
        block = Block(tag=tag, path=path, offset=self._abs_offset(), parent_id=parent_id)
        if entry is not None:
            entry.block = block
        self.blocks.append(block)
        return block


def parse_blocks(html: str) -> list[Block]:
    """Parse HTML into document-ordered text blocks (whitespace-only blocks
    are dropped from the result)."""
    line_starts = [0]
    for i, ch in enumerate(html):
        if ch == "\n":
            line_starts.append(i + 1)
    parser = _BlockParser(line_starts)
    parser.feed(html)
    parser.close()
    return [b for b in parser.blocks if b.text.strip()]
