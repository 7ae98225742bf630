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


def _wide_charset_table(n_docs: int = 40, n_chars: int = 3000) -> pa.Table:
    """Deterministic CJK-range corpus: ~n_chars distinct code points, so
    distinct bigrams dwarf any small cap — the case the vocabulary cap
    exists for."""
    ids, langs, texts = [], [], []
    for i in range(n_docs):
        ids.append(i)
        langs.append("zh" if i % 2 == 0 else "ja")
        texts.append(
            "".join(chr(0x4E00 + (i * 31 + j * 7) % n_chars) for j in range(80))
        )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


class TestVocabCap:
    def test_capped_model_matches_sql_oracle_with_cap_active(self, ray_session):
        """Far-side test for QUALITY_LM_VOCAB_CAP: a wide-charset corpus
        with the cap forced far below the distinct-bigram count must
        still match the SQL oracle row for row — proving the engine's
        (count DESC, bigram ASC) truncation and default-lp fallback are
        byte-equal to the QUALIFY/coalesce mirror."""
        import duckdb
        import ray.data as rd

        import __ray_entry__ as e
        from ebook_ocr_ray.pipelines.quality import quality_buckets_ds

        t = _wide_charset_table()
        got = (
            quality_buckets_ds(rd.from_arrow(t), vocab_cap=50)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", t)
        want = con.execute(e._quality_buckets_sql(vocab_cap=50)).df()
        con.close()
        assert got["ce_micro"].tolist() == want["ce_micro"].tolist()
        assert got["bucket"].tolist() == want["bucket"].tolist()
        # the cap is genuinely active: at least one doc contains a
        # bigram past the cap (scored by the default slot)
        from ebook_ocr_ray.pipelines.quality import train_bigram_model

        model = train_bigram_model(rd.from_arrow(t), vocab_cap=50)
        assert all(len(m["lp"]) == 50 for m in model.values())

    def test_cap_changes_nothing_when_vocab_is_small(self, ray_session):
        """On a small-charset corpus the cap is inert: capped == uncapped."""
        import ray.data as rd

        from ebook_ocr_ray.pipelines.quality import quality_buckets_ds

        rows = [(i, "en", "the cat sat on mat %d" % (i % 3)) for i in range(12)]
        a = (
            quality_buckets_ds(_docs_ds(rows))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            quality_buckets_ds(_docs_ds(rows), vocab_cap=10**9)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert a.equals(b)

    def test_distributed_model_build_equals_driver_path(
        self, ray_session, monkeypatch
    ):
        """Far-side test for MODEL_DRIVER_MAX: forcing the flip to 0
        routes the top-cap selection / totals / vocab through the keyed
        distributed stages, which must produce the identical model."""
        import ray.data as rd

        from ebook_ocr_ray.pipelines import quality

        t = _wide_charset_table(n_docs=16, n_chars=400)
        driver_model = quality.train_bigram_model(
            rd.from_arrow(t), vocab_cap=30
        )
        monkeypatch.setattr(quality, "MODEL_DRIVER_MAX", 0)
        dist_model = quality.train_bigram_model(rd.from_arrow(t), vocab_cap=30)
        assert driver_model == dist_model


class TestSurrogateHardening:
    def test_lone_surrogate_text_does_not_crash_the_kernel(self):
        """Python str permits lone surrogates (a raw \\ud800 escape
        survives JSON decoding); the utf-32 bigram encode must pass them
        through instead of raising inside the map task."""
        from ebook_ocr_ray.pipelines.quality import _pair_code_arrays

        pairs, counts = _pair_code_arrays(["a\ud800b", "ok"])
        assert list(counts) == [2, 1]
        assert len(pairs) == 3
