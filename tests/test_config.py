"""Build-time config validation (M2 analog: fail before any task runs)."""

import pytest

from ebook_ocr_ray.config import ExtractionConfig


def test_default_valid():
    cfg = ExtractionConfig()
    assert cfg.primary in cfg.extractors


def test_subset_with_matching_primary():
    cfg = ExtractionConfig(extractors=("dom", "density"), primary="density")
    assert cfg.extractors == ("dom", "density")


@pytest.mark.parametrize(
    "kwargs",
    [
        {"extractors": ()},
        {"extractors": ("dom", "nonsense")},
        {"extractors": ("density",), "primary": "dom"},
        {"min_conf": 1.5},
        {"min_conf": -0.1},
        {"row_tol": 0},
        {"align_tol": -3},
        {"num_partitions": 0},
    ],
)
def test_invalid_configs_fail_fast(kwargs):
    with pytest.raises(ValueError):
        ExtractionConfig(**kwargs)
