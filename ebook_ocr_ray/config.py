"""Engine-wide configuration constants.

Re-expresses the reference's tuning surface (rengotaku/ebook-ocr) for the
web/PDF extraction engine:

- extractor weights     <- ENGINE_WEIGHTS, /root/reference/src/rover/ensemble.py:32-36
- confidence calibration<- normalize_confidence, src/rover/line_processing.py:97-120
- clustering tolerances <- cluster_lines_by_y / align_lines_by_y / split_multiline_items,
                           src/rover/line_processing.py:123-279
- region type priority  <- TYPE_PRIORITY, src/layout/reading_order.py:10-19

All values are plain data so they can be shipped to actors cheaply (no
module-level model state).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- ensemble -------------------------------------------------------------

# Extractor vote weights (analog of yomitoku 1.5 / paddleocr 1.2 / easyocr 1.0).
EXTRACTOR_WEIGHTS: dict[str, float] = {
    "dom": 1.5,         # DOM structural rules (primary; analog of yomitoku)
    "density": 1.2,     # text/link-density boilerplate stripping (analog of paddleocr)
    "readability": 1.0, # readability-style candidate scoring (analog of easyocr)
}

PRIMARY_EXTRACTOR = "dom"

# Per-extractor raw-confidence calibration ranges (min, max) -> rescaled to [0,1].
CONF_RANGES: dict[str, tuple[float, float]] = {
    "dom": (0.4, 1.0),
    "density": (0.85, 1.0),
    "readability": (0.25, 1.0),
}

# --- geometry tolerances (document-coordinate space) ----------------------

ROW_CLUSTER_TOL = 20.0      # spans within one source -> same visual row
CROSS_SOURCE_TOL = 30.0     # rows across sources considered the same line
WORD_ROW_TOL = 15.0         # char/word boxes -> physical line (PDF path)
TALL_SPAN_GAP = 15.0        # y-gap that splits a paragraph span into lines

MIN_SPAN_CONF = 0.5         # garbage rule 2 threshold

# Synthetic document-coordinate scale for HTML blocks: y = char_offset * scale.
# Chosen so any two distinct blocks (>=1 char text + >=9 chars of markup
# between their offsets) sit > CROSS_SOURCE_TOL apart and never merge.
OFFSET_Y_SCALE = 4.0

# --- PDF layout path ------------------------------------------------------

REGION_TYPE_RANK: dict[str, int] = {
    "TITLE": 0,
    "TEXT": 1,
    "CAPTION": 2,
    "FOOTNOTE": 3,
    "FIGURE": 4,
    "TABLE": 5,
    "FORMULA": 6,
    "ABANDON": 7,
}

OVERLAP_PRUNE_THRESHOLD = 0.5   # intersection / min-area, same-type only
TITLE_MIN_CHAR_HEIGHT = 18.0    # char boxes at least this tall classify as TITLE

# Sentence-terminal characters for paragraph-continuation merging
# (analog of merge_continuation_paragraphs, src/book_converter/parser/paragraph.py:97-159).
SENTENCE_TERMINATORS = ("。", ".", "!", "?", "！", "？", "）。", "」。")

# --- partitioning / lineage ----------------------------------------------

DEFAULT_NUM_PARTITIONS = 64
# html payloads larger than this take the dedicated one-doc-per-task
# extraction path (skew-aware split)
OVERSIZE_BLOB_BYTES = 1 << 18

ENGINE_VERSION = "ebook-ocr-ray/0.2"   # 0.2: fallback chain + engine column

# --- low-quality fallback chain (analog of ocr_with_fallback, ----------
# src/layout_ocr.py:50-66, with the quality floor from is_low_quality,
# src/layout_ocr_utils.py:49-66)

FALLBACK_MIN_LENGTH = 10        # stripped ensemble text shorter -> low quality
FALLBACK_MAX_NON_CHAR = 0.5     # non-word-char ratio above -> low quality
# default weight a registered extra extractor gets when none is supplied
# (the reference's 4th engine weight, tesseract 0.8, runners.py:344-389)
EXTRA_EXTRACTOR_WEIGHT = 0.8


@dataclass(frozen=True)
class ExtractionConfig:
    """Typed config resolved once at pipeline build and shipped to actors.

    Validation happens HERE, at build time, never in the data path — the
    reference's rule for trim parameters (validate_trim_value,
    src/preprocessing/split_spread.py:63-76 / SURVEY.md M2) applied to the
    whole tuning surface: a bad config fails the job before any task runs.

    ``custom_extractors`` opens the registry (SURVEY.md §2.10 / the
    reference's optional 4th engine, runners.py:344-389): map a new name
    to a ``blocks -> list[Span]`` callable, list the name in
    ``extractors``, and optionally give it a vote weight in ``weights``
    (default EXTRA_EXTRACTOR_WEIGHT). The callable ships to workers with
    the config object — no package edit required.
    """

    extractors: tuple[str, ...] = ("dom", "density", "readability")
    primary: str = PRIMARY_EXTRACTOR
    weights: dict[str, float] = field(default_factory=lambda: dict(EXTRACTOR_WEIGHTS))
    min_conf: float = MIN_SPAN_CONF
    row_tol: float = ROW_CLUSTER_TOL
    align_tol: float = CROSS_SOURCE_TOL
    num_partitions: int = DEFAULT_NUM_PARTITIONS
    custom_extractors: dict[str, object] = field(default_factory=dict)
    fallback_enabled: bool = True
    fallback_min_length: int = FALLBACK_MIN_LENGTH
    fallback_max_non_char: float = FALLBACK_MAX_NON_CHAR

    def __post_init__(self) -> None:
        if not self.extractors:
            raise ValueError("extractors must not be empty")
        known = set(EXTRACTOR_WEIGHTS) | set(self.custom_extractors)
        unknown = [e for e in self.extractors if e not in known]
        if unknown:
            raise ValueError(
                f"unknown extractor(s) {unknown}; known: {sorted(known)}"
            )
        not_callable = [
            n for n, fn in self.custom_extractors.items() if not callable(fn)
        ]
        if not_callable:
            raise ValueError(f"custom extractor(s) not callable: {not_callable}")
        # resolve the effective weight table WITHOUT mutating the caller's
        # dict: built-ins missing from an explicit weights dict keep their
        # canonical weights; only custom extractors default to 0.8
        merged = dict(EXTRACTOR_WEIGHTS)
        merged.update(self.weights)
        for name in self.extractors:
            if name not in merged:
                merged[name] = EXTRA_EXTRACTOR_WEIGHT
        object.__setattr__(self, "weights", merged)
        if self.primary not in self.extractors:
            raise ValueError(
                f"primary {self.primary!r} not among extractors {self.extractors}"
            )
        if not 0.0 <= self.min_conf <= 1.0:
            raise ValueError(f"min_conf must be in [0, 1], got {self.min_conf}")
        if self.row_tol <= 0 or self.align_tol <= 0:
            raise ValueError("clustering tolerances must be positive")
        if self.num_partitions < 1:
            raise ValueError(f"num_partitions must be >= 1, got {self.num_partitions}")
        if self.fallback_min_length < 0:
            raise ValueError("fallback_min_length must be >= 0")
        if not 0.0 <= self.fallback_max_non_char <= 1.0:
            raise ValueError("fallback_max_non_char must be in [0, 1]")
