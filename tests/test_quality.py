"""CCNet-style quality bucketing: planted-outlier ordering, per-lang
bucket proportions, quantile convention, and model invariants."""
import math

import numpy as np
import pyarrow as pa

from conftest import SF_SMOKE


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


class TestQualityBuckets:
    def test_planted_outlier_lands_in_tail(self, ray_session):
        from ebook_ocr_ray.pipelines.quality import quality_buckets_ds

        common = "the cat sat on the mat and the dog sat too"
        rows = [(i, "en", common) for i in range(1, 9)]
        rows.append((9, "en", "zq xv jq qz vx kz zx qj"))  # rare bigrams
        out = quality_buckets_ds(_docs_ds(rows)).to_pandas().set_index("doc_id")
        assert out.loc[9, "ce_micro"] == out["ce_micro"].max()
        assert out.loc[9, "bucket"] == "tail"
        # identical texts score identically and land in head (<= 1/3 q)
        assert out.loc[1:8, "ce_micro"].nunique() == 1
        assert (out.loc[1:8, "bucket"] == "head").all()

    def test_languages_are_independent_models(self, ray_session):
        from ebook_ocr_ray.pipelines.quality import quality_buckets_ds

        # same text under two langs: scores differ because each lang's
        # model is trained only on its own slice
        rows = [
            (1, "en", "aa ab ba bb"),
            (2, "en", "aa ab ba bb"),
            (3, "xx", "aa ab ba bb"),
            (4, "xx", "zz zy yz yy"),
        ]
        out = quality_buckets_ds(_docs_ds(rows)).to_pandas().set_index("doc_id")
        assert out.loc[1, "ce_micro"] == out.loc[2, "ce_micro"]
        assert out.loc[3, "ce_micro"] != out.loc[1, "ce_micro"]
        assert set(out["bucket"]) <= {"head", "middle", "tail"}

    def test_bucket_proportions_on_corpus(self, ray_session):
        from ebook_ocr_ray.pipelines.quality import quality_buckets

        out = quality_buckets(SF_SMOKE).to_pandas()
        for lang, grp in out.groupby("lang"):
            n = len(grp)
            heads = (grp["bucket"] == "head").sum()
            # discrete quantiles with near-unique scores: head ~ n/3
            assert heads >= math.ceil(n / 3) - 1 or n < 6
            assert (grp["bucket"] == "tail").sum() <= n

    def test_short_text_scores_zero(self, ray_session):
        from ebook_ocr_ray.pipelines.quality import quality_buckets_ds

        rows = [(1, "en", "a"), (2, "en", ""), (3, "en", "normal words here")]
        out = quality_buckets_ds(_docs_ds(rows)).to_pandas().set_index("doc_id")
        assert out.loc[1, "ce_micro"] == 0
        assert out.loc[2, "ce_micro"] == 0


class TestModelAndQuantile:
    def test_unseen_default_is_most_surprising(self, ray_session):
        from ebook_ocr_ray.pipelines.quality import train_bigram_model

        rows = [(1, "en", "abcabcabc"), (2, "en", "xyzxyz")]
        model = train_bigram_model(_docs_ds(rows))
        en = model["en"]
        assert en["default"] >= max(en["lp"].values())
        assert all(v > 0 for v in en["lp"].values())

    def test_disc_quantile_matches_duckdb_convention(self):
        import duckdb

        from ebook_ocr_ray.pipelines.quality import _disc_quantile

        rng = np.random.RandomState(7)
        for _ in range(20):
            vals = np.sort(rng.choice(50, size=rng.randint(1, 12), replace=False))
            cnts = rng.randint(1, 4, size=len(vals)).astype(np.int64)
            expanded = np.repeat(vals, cnts).tolist()
            for q in (1.0 / 3, 2.0 / 3, 0.5):
                want = duckdb.sql(
                    f"SELECT quantile_disc(x, {q!r}) FROM (SELECT unnest("
                    f"{expanded!r}) AS x)"
                ).fetchone()[0]
                assert _disc_quantile(vals, cnts, q) == want, (expanded, q)


class TestNullLangRobustness:
    def test_null_lang_rows_bucket_without_crash(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.quality import quality_buckets_ds

        rows = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "lang": pa.array(["en", "en", None, None], pa.string()),
                "text": pa.array(
                    ["the cat sat", "the dog sat", "zq xv jq", "zq xv jq"],
                    pa.string(),
                ),
            }
        )
        out = quality_buckets_ds(rd.from_arrow(rows)).to_pandas().set_index("doc_id")
        assert len(out) == 4
        assert set(out["bucket"]) <= {"head", "middle", "tail"}
        # null-lang docs scored identically -> same bucket
        assert out.loc[3, "bucket"] == out.loc[4, "bucket"]
