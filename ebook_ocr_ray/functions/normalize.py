"""Heading/text normalizers (reference src/book_converter/analyzer.py:20-38,
parser/heading_normalizer.py:47-148): dash folding, full-width digit
conversion, number-format unification, space tightening, special-marker
detection. Pure scalar functions used by the structural stage and exposed
for corpus-level normalization passes."""

from __future__ import annotations

import re

_DASHES = "‐-–—―−ー"
_FW_DIGITS = str.maketrans("０１２３４５６７８９", "0123456789")
_SPECIAL_MARKERS = ("■", "◆", "□", "●", "◇", "▲")


def fold_dashes(text: str) -> str:
    """Seven dash variants -> ASCII hyphen."""
    for d in _DASHES:
        text = text.replace(d, "-")
    return text


def normalize_digits(text: str) -> str:
    """Full-width digits -> ASCII."""
    return text.translate(_FW_DIGITS)


def normalize_number_format(text: str) -> str:
    """1-1-1 / 1・1 separators -> dotted 1.1.1 (digits normalized first)."""
    text = normalize_digits(text)
    prev = None
    while prev != text:
        prev = text
        text = re.sub(r"(\d)[-・](\d)", r"\1.\2", text)
    return text


def normalize_spaces(text: str) -> str:
    """Tighten spaces inside numbering to a fixpoint:
    '第 1 章' -> '第1章', '1. 1' -> '1.1'."""
    prev = None
    while prev != text:
        prev = text
        text = re.sub(r"第\s+(\d)", r"第\1", text)
        text = re.sub(r"(\d)\s+章", r"\1章", text)
        text = re.sub(r"(\d)\.\s+(\d)", r"\1.\2", text)
        text = re.sub(r"(\d)\s+\.(\d)", r"\1.\2", text)
    return text


def is_special_marker(text: str) -> bool:
    """Leading ■◆□●◇▲ marks a decorated (special) heading."""
    t = text.strip()
    return bool(t) and t[0] in _SPECIAL_MARKERS


def normalize_heading_number(text: str) -> str:
    """Full normalization chain for heading comparison."""
    return normalize_spaces(normalize_number_format(fold_dashes(text))).strip()
