"""Three independent HTML main-content extractor variants.

The analog of the reference's multi-engine OCR (yomitoku / paddleocr /
easyocr, /root/reference/src/rover/engines/runners.py): each variant reads
the same document and emits positioned Spans; disagreements are resolved
downstream by line alignment + weighted character voting.

Span geometry is synthetic but consistent across variants: y is derived
from the block's char offset in the source HTML (see html_dom.Block), so
identical blocks align across variants no matter what else each variant
kept. x1 encodes document order for stable x-sorts.

Variants:

- ``dom``         structural rules: keep <main>/<article> content, else
                  body content outside header/footer/nav/aside chrome
                  (primary; analog of yomitoku, weight 1.5)
- ``density``     Boilerpipe-style text/link-density filter
                  (analog of paddleocr, weight 1.2)
- ``readability`` Readability-style candidate container scoring
                  (analog of easyocr, weight 1.0)
"""

from __future__ import annotations

from ebook_ocr_ray.config import OFFSET_Y_SCALE
from ebook_ocr_ray.functions.html_dom import Block, parse_blocks
from ebook_ocr_ray.functions.lines import Span, make_span

DOM_CONF = 0.95
DENSITY_MAX_LINK_RATIO = 0.35
READABILITY_LEN_CAP = 3.0


def _block_span(block: Block, conf: float) -> Span:
    y = block.offset * OFFSET_Y_SCALE
    return make_span(block.text, 0.0, y - 8.0, 8.0 * len(block.text), y + 8.0, conf)


def _content_blocks(blocks: list[Block]) -> list[Block]:
    return [b for b in blocks if not b.in_head]


def extract_dom(blocks: list[Block]) -> list[Span]:
    """Structural extraction: if the document declares a <main>/<article>
    landmark, its blocks are the content; otherwise everything in <body>
    that is not inside chrome elements. Figure innards (<figcaption> and
    any text inside <figure>) are the primary's figure ZONES, not content
    — excluded here and masked from the other variants downstream (analog
    of yomitoku's figure detection, runners.py:392-448)."""
    body = _content_blocks(blocks)
    main = [b for b in body if b.in_main]
    chosen = main if main else [b for b in body if not b.in_chrome]
    return [_block_span(b, DOM_CONF) for b in chosen if not b.in_figure]


def figure_zones(blocks: list[Block]) -> list[tuple[float, float, float, float]]:
    """Bounding boxes of every figure-contained block, in the same
    synthetic span geometry the extractors emit — the primary variant's
    figure-zone report (analog of EngineResult.figures,
    src/rover/engines/runners.py:392-448)."""
    zones = []
    for b in _content_blocks(blocks):
        if b.in_figure and b.text:
            y = b.offset * OFFSET_Y_SCALE
            zones.append((0.0, y - 8.0, 8.0 * len(b.text), y + 8.0))
    return zones


def extract_density(blocks: list[Block]) -> list[Span]:
    """Link-density boilerplate stripping: a block survives when link text
    makes up at most DENSITY_MAX_LINK_RATIO of it. Confidence = 1 - link
    density, so downstream calibration (range 0.85-1.0) rewards pure-text
    blocks."""
    out: list[Span] = []
    for b in _content_blocks(blocks):
        ld = b.link_density
        if ld <= DENSITY_MAX_LINK_RATIO:
            out.append(_block_span(b, max(0.0, 1.0 - ld)))
    return out


def _candidate_score(blocks: list[Block]) -> float:
    score = 0.0
    for b in blocks:
        score += min(b.length / 100.0, READABILITY_LEN_CAP)
        score += b.commas * 0.5
        score -= b.link_density * 2.0
    return score


def extract_readability(blocks: list[Block]) -> list[Span]:
    """Candidate-container scoring: group blocks by their parent element,
    score each container on text length / commas / link density, and emit
    the winning container's blocks. Ties keep the earliest container in
    document order. All emitted spans share the container-level confidence
    score/(score+2), clamped to 0.99."""
    groups: dict[int, list[Block]] = {}
    for b in _content_blocks(blocks):
        groups.setdefault(b.parent_id, []).append(b)
    if not groups:
        return []
    best_id, best_score = None, float("-inf")
    for pid, group in groups.items():   # insertion order == document order
        s = _candidate_score(group)
        if s > best_score:
            best_id, best_score = pid, s
    conf = min(0.99, best_score / (best_score + 2.0)) if best_score > 0 else 0.0
    return [_block_span(b, conf) for b in groups[best_id]]


EXTRACTOR_FNS = {
    "dom": extract_dom,
    "density": extract_density,
    "readability": extract_readability,
}


def run_html_extractors(
    html: str, extractors: tuple[str, ...] = ("dom", "density", "readability")
) -> dict[str, list[Span]]:
    """Parse once, run every variant over the shared block list. The parse
    is shared deliberately — the reference's analogous orchestration runs
    all engines on the same page image inside one call
    (src/rover/engines/runners.py:392-448)."""
    blocks = parse_blocks(html)
    return {name: EXTRACTOR_FNS[name](blocks) for name in extractors}
