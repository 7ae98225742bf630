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
