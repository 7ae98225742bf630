"""Normalizer unit tests (reference analyzer.py:20-38,
heading_normalizer.py:47-148)."""

from ebook_ocr_ray.functions.normalize import (
    fold_dashes,
    is_special_marker,
    normalize_digits,
    normalize_heading_number,
    normalize_number_format,
    normalize_spaces,
)


def test_fold_dashes_all_variants():
    assert fold_dashes("a‐b–c—d―e−f ーg") == "a-b-c-d-e-f -g"


def test_full_width_digits():
    assert normalize_digits("第１２章") == "第12章"


def test_number_format_unification():
    assert normalize_number_format("1-1-1") == "1.1.1"
    assert normalize_number_format("2・3") == "2.3"
    assert normalize_number_format("１-２") == "1.2"


def test_space_fixpoint():
    assert normalize_spaces("第 1 章") == "第1章"
    assert normalize_spaces("1. 1. 2") == "1.1.2"
    assert normalize_spaces("plain words stay") == "plain words stay"


def test_special_markers():
    assert is_special_marker("■ Note")
    assert is_special_marker("  ◆decorated")
    assert not is_special_marker("normal heading")
    assert not is_special_marker("")


def test_full_chain():
    assert normalize_heading_number("第 １ 章") == "第1章"
    assert normalize_heading_number("3・1‐2") == "3.1.2"
    assert normalize_heading_number("  2.  4 title  ") == "2.4 title"
