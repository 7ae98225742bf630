"""Integer PageRank over the extracted link graph: driver==keyed path
equality, rank ordering invariants, and href resolution."""
import pandas as pd

from conftest import SF_SMOKE


class TestPagerank:
    def test_driver_equals_keyed(self, ray_session):
        from ebook_ocr_ray.pipelines.linkgraph import pagerank

        d = (
            pagerank(SF_SMOKE, strategy="driver")
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        k = (
            pagerank(SF_SMOKE, strategy="keyed")
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(d, k)

    def test_targets_outrank_pages(self, ray_session):
        from ebook_ocr_ray.pipelines.linkgraph import SCALE, pagerank

        out = pagerank(SF_SMOKE).to_pandas()
        pages = out[out.url.str.contains("/doc/")]
        targets = out[~out.url.str.contains("/doc/")]
        # doc pages have no in-links: rank == base after k iterations
        assert (pages["rank"] == (15 * SCALE) // 100).all()
        # every site target absorbs mass from all its site's pages
        assert (targets["rank"] > pages["rank"].iloc[0]).all()

    def test_resolution_rule(self):
        from ebook_ocr_ray.pipelines.linkgraph import _resolve

        assert (
            _resolve("https://site-3.example/doc/43", "/about")
            == "https://site-3.example/about"
        )
        assert _resolve("https://h.example/x", "https://other/y") == "https://other/y"

    def test_unknown_strategy_rejected(self, ray_session):
        import pytest

        from ebook_ocr_ray.pipelines.linkgraph import pagerank

        with pytest.raises(ValueError):
            pagerank(SF_SMOKE, strategy="nope")


class TestHardening:
    def test_resolve_handles_schemeless_src_and_null_href(self):
        from ebook_ocr_ray.pipelines.linkgraph import _resolve

        # absolute href passes through regardless of src shape
        assert _resolve("site.example/page", "https://x.example/y") == "https://x.example/y"
        # schemeless src: urlsplit fallback instead of IndexError
        assert _resolve("//host.example/page", "/a") == "https://host.example/a"
        # null/empty href: self-edge, not AttributeError
        assert _resolve("https://h.example/p", None) == "https://h.example/p"
        assert _resolve("https://h.example/p", "") == "https://h.example/p"
        # the normal root-relative case is unchanged
        assert _resolve("https://h.example/p/q", "/r") == "https://h.example/r"

    def test_rank_overflow_raises_loudly(self):
        import numpy as np
        import pytest

        from ebook_ocr_ray.pipelines.linkgraph import (
            _RANK_OVERFLOW_MAX, _check_rank_overflow,
        )

        _check_rank_overflow(np.array([_RANK_OVERFLOW_MAX], dtype=np.int64))
        with pytest.raises(OverflowError, match="int64-safe bound"):
            _check_rank_overflow(
                np.array([_RANK_OVERFLOW_MAX + 1], dtype=np.int64)
            )
