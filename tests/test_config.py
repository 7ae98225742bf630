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


class TestWeightsMergeSemantics:
    def test_partial_weights_keep_builtin_defaults(self):
        """Round-2 review: an explicit weights dict naming only one
        extractor must not demote the other built-ins to the 0.8 custom
        default, and must never mutate the caller's dict."""
        from ebook_ocr_ray.config import ExtractionConfig

        mine = {"dom": 2.0}
        cfg = ExtractionConfig(weights=mine)
        assert cfg.weights["dom"] == 2.0
        assert cfg.weights["density"] == 1.2
        assert cfg.weights["readability"] == 1.0
        assert mine == {"dom": 2.0}                      # caller dict untouched

    def test_custom_extractor_defaults_to_extra_weight(self):
        from ebook_ocr_ray.config import ExtractionConfig

        cfg = ExtractionConfig(
            extractors=("dom", "x"), custom_extractors={"x": lambda blocks: []}
        )
        assert cfg.weights["x"] == 0.8
