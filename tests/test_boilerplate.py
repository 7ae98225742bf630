"""Boilerplate mine -> apply: closed-form invariants on the synth corpus
plus join==broadcast equality for the apply path."""
import pandas as pd

from conftest import SF_SMOKE


class TestSiteBoilerplate:
    def test_mined_set_is_nav_plus_footer(self, ray_session):
        from ebook_ocr_ray.pipelines.boilerplate import site_boilerplate_pages

        out = site_boilerplate_pages(SF_SMOKE).to_pandas()
        per_site = out.groupby("site")["line"].apply(set)
        for site, lines in per_site.items():
            assert lines == {
                "Home", "About", "News", "Contact",
                f"privacy terms (c) 2026 {site}",
            }


class TestStripBoilerplate:
    def test_closed_form_strip(self, ray_session):
        from ebook_ocr_ray.pipelines.boilerplate import strip_boilerplate

        out = strip_boilerplate(SF_SMOKE).to_pandas()
        assert len(out) > 0
        # every base html page loses exactly nav(4) + footer(1)
        assert (out["n_stripped"] == 5).all()
        # survivors: 6 aside tags, then the title, then the body
        first = out.sort_values("url").iloc[0]
        lines = first["clean_text"].split("\n")
        assert len(lines) == 8
        assert all(ln.startswith("tag-") for ln in lines[:6])
        assert lines[6].startswith("Document ")

    def test_join_equals_broadcast(self, ray_session):
        from ebook_ocr_ray.pipelines.boilerplate import strip_boilerplate

        a = (
            strip_boilerplate(SF_SMOKE, hot_strategy="broadcast")
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        b = (
            strip_boilerplate(SF_SMOKE, hot_strategy="join")
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_unknown_strategy_rejected(self, ray_session):
        import pytest

        from ebook_ocr_ray.pipelines.boilerplate import strip_boilerplate

        with pytest.raises(ValueError):
            strip_boilerplate(SF_SMOKE, hot_strategy="nope")
