"""Round-4 web-corpus operators: canonical-URL dedup, Gopher-rule
quality filter, inlink anchor-text aggregation."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import pytest

from tests.conftest import SF_SMOKE


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


class TestNormalizeUrls:
    def test_rewrite_chain(self):
        from ebook_ocr_ray.pipelines.extraction import normalize_urls

        urls = pa.array(
            [
                "https://site-1.example/doc/1",
                "HTTP://WWW.SITE-1.EXAMPLE/DOC/1/",
                "https://site-1.example/doc/1?utm_source=feed&ref=rss#frag",
                "http://site-2.example/",          # root: trailing slash only
                "https://www.other.example/a?x=1",
                "https://site-3.example/doc/3#sec",
            ]
        )
        got = normalize_urls(urls).to_pylist()
        assert got == [
            "site-1.example/doc/1",
            "site-1.example/doc/1",
            "site-1.example/doc/1",
            "site-2.example",
            "other.example/a",
            "site-3.example/doc/3",
        ]

    def test_www_stripped_only_at_start(self):
        from ebook_ocr_ray.pipelines.extraction import normalize_urls

        got = normalize_urls(pa.array(["https://a.example/www.b"])).to_pylist()
        assert got == ["a.example/www.b"]

    def test_pathological_prefixes_and_slashes(self):
        """The greedy combined prefix strip and /+$ make the form a true
        fixed point even on stacked www./scheme prefixes and repeated
        trailing slashes (code-review finding: two separate anchored
        strips were not idempotent)."""
        from ebook_ocr_ray.pipelines.extraction import normalize_urls

        got = normalize_urls(
            pa.array(
                [
                    "https://www.www.site.example/x",
                    "https://a.example/path//",
                    "HTTPS://WWW.HTTPS://a.example/x",
                    "http:///",
                ]
            )
        ).to_pylist()
        assert got == ["site.example/x", "a.example/path", "a.example/x", ""]


class TestDedupUrl:
    def _pages(self, ray_session, rows):
        import ray

        urls, tss = zip(*rows)
        t = pa.table(
            {
                "url": pa.array(list(urls), pa.string()),
                "warc_ts": pa.array(list(tss), pa.timestamp("us")),
                # payload columns present but never read by dedup_url
                "html": pa.array([b""] * len(rows), pa.binary()),
                "text": pa.array([""] * len(rows), pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
            }
        )
        return ray.data.from_arrow(t)

    def test_variants_collapse_to_earliest(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import dedup_url

        pages = self._pages(
            ray_session,
            [
                ("https://site-1.example/doc/7", _ts(7)),
                ("HTTP://WWW.SITE-1.EXAMPLE/DOC/7/", _ts(86407)),
                ("https://site-1.example/doc/7?utm_source=feed#f", _ts(2 * 86400)),
                ("https://site-2.example/doc/8", _ts(8)),
            ],
        )
        df = dedup_url(pages, num_partitions=2).to_pandas().sort_values("url_norm")
        assert df.url_norm.tolist() == [
            "site-1.example/doc/7", "site-2.example/doc/8"
        ]
        assert df.n_crawls.tolist() == [3, 1]
        # survivor = earliest crawl's ORIGINAL url + ts
        assert df.url.tolist()[0] == "https://site-1.example/doc/7"
        assert df.warc_ts.tolist()[0] == _ts(7)

    def test_tie_breaks_on_url(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import dedup_url

        pages = self._pages(
            ray_session,
            [
                ("https://site-1.example/doc/9?b=2", _ts(5)),
                ("https://site-1.example/doc/9?a=1", _ts(5)),
            ],
        )
        df = dedup_url(pages, num_partitions=2).to_pandas()
        assert len(df) == 1
        assert df.url.iloc[0] == "https://site-1.example/doc/9?a=1"

    def test_fixture_counts(self, ray_session):
        """with_url_variants plants exactly two extra crawls per
        doc_id % 6 == 1 doc, and dedup_url collapses all of them."""
        from ebook_ocr_ray.pipelines.extraction import dedup_url, pages_dataset

        pages = pages_dataset(SF_SMOKE, with_url_variants=True)
        df = dedup_url(pages, num_partitions=2).to_pandas()
        import pyarrow.parquet as pq

        n_docs = pq.read_metadata(f"{SF_SMOKE}/documents.parquet").num_rows
        assert len(df) == n_docs
        assert (df.n_crawls == 3).sum() == len(
            [i for i in range(n_docs) if i % 6 == 1]
        )
        # every survivor is the clean base url (earliest crawl)
        assert df.url.str.startswith("https://site-").all()


class TestEmptyInputs:
    """Empty batches must still emit the declared schema (from_pandas
    would infer `null` for empty object columns — the schema-mismatch
    bundle class groups.py exists to eliminate)."""

    def test_dedup_url_empty(self, ray_session):
        import ray

        from ebook_ocr_ray.pipelines.extraction import dedup_url
        from ebook_ocr_ray.sources.pages import PAGES_SCHEMA

        # fully empty input: must not crash, yields zero rows
        assert (
            dedup_url(
                ray.data.from_arrow(PAGES_SCHEMA.empty_table()), num_partitions=2
            ).count()
            == 0
        )
        # 1 row + 4 partitions: three partitions are sentinel-only and
        # exercise empty_fn; their typed empties must merge cleanly with
        # the populated partition's schema
        t = pa.table(
            {
                "url": pa.array(["https://site-1.example/doc/1"], pa.string()),
                "warc_ts": pa.array([_ts(1)], pa.timestamp("us")),
                "html": pa.array([b""], pa.binary()),
                "text": pa.array([""], pa.string()),
                "lang": pa.array(["en"], pa.string()),
            }
        )
        df = dedup_url(ray.data.from_arrow(t), num_partitions=4).to_pandas()
        assert list(df.columns) == ["url_norm", "url", "warc_ts", "n_crawls"]
        assert df.url_norm.tolist() == ["site-1.example/doc/1"]

    def test_gopher_empty(self, ray_session):
        import ray

        from ebook_ocr_ray.pipelines.quality import gopher_rule_stats

        t = pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string())]
        ).empty_table()
        assert gopher_rule_stats(ray.data.from_arrow(t)).count() == 0
        # one empty and one populated batch in a single dataset: the
        # empty batch's typed table must merge with the populated schema
        full = pa.table(
            {"doc_id": pa.array([0], pa.int64()),
             "text": pa.array(["the a word"], pa.string())}
        )
        ds = ray.data.from_arrow([t, full])
        df = gopher_rule_stats(ds).to_pandas()
        assert list(df.columns) == [
            "doc_id", "n_words", "sum_wlen", "n_stop", "top_n", "keep"
        ]
        assert len(df) == 1 and df.n_words.iloc[0] == 3


class TestGopherRules:
    def _stats(self, ray_session, texts):
        import ray

        from ebook_ocr_ray.pipelines.quality import gopher_rule_stats

        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        return (
            gopher_rule_stats(ray.data.from_arrow(t))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_truth_table(self, ray_session):
        good = ("the data " + "word " * 48).strip()        # 50 words, stopword x1...
        short = "the quick data row"                        # < 40 words
        no_stop = ("data row " * 25).strip()                # no stopwords
        top_heavy = ("the of " + "spam " * 48).strip()      # 'spam' 48/50 > 20%
        df = self._stats(ray_session, [good, short, no_stop, top_heavy])
        # 'good': 50 words, 'word' x48 is ALSO top-heavy -> keep=0; use metrics
        assert df.n_words.tolist() == [50, 4, 50, 50]
        assert df.n_stop.tolist() == [1, 1, 0, 2]
        assert df.top_n.tolist() == [48, 1, 25, 48]
        assert df.keep.tolist() == [0, 0, 0, 0]

    def test_keep_fires(self, ray_session):
        words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
        text = "the a " + " ".join(words[i % 10] + str(i) for i in range(48))
        df = self._stats(ray_session, [text])
        assert df.n_words.iloc[0] == 50
        assert df.n_stop.iloc[0] == 2
        assert df.keep.iloc[0] == 1

    def test_empty_text(self, ray_session):
        df = self._stats(ray_session, [""])
        assert df.n_words.iloc[0] == 1      # split(' ') of '' = [''] both sides
        assert df.sum_wlen.iloc[0] == 0
        assert df.keep.iloc[0] == 0

    def test_mean_word_length_bounds(self, ray_session):
        # 40 single-char words + the/a: mean < 3 -> dropped by length band
        thin = "the a " + " ".join(["x"] * 48)
        df = self._stats(ray_session, [thin])
        assert df.keep.iloc[0] == 0
        assert 3 * df.n_words.iloc[0] > df.sum_wlen.iloc[0]


class TestCrawlDelta:
    def test_statuses(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import crawl_delta, snapshot_pages

        df = (
            crawl_delta(
                snapshot_pages(SF_SMOKE, "a"), snapshot_pages(SF_SMOKE, "b")
            )
            .to_pandas()
            .set_index("url")
        )
        import pyarrow.parquet as pq

        n = pq.read_metadata(f"{SF_SMOKE}/documents.parquet").num_rows
        from ebook_ocr_ray.sources.pages import SNAPSHOT_ADD_OFFSET, page_url

        for doc_id in range(n):
            want = (
                "removed" if doc_id % 13 == 5
                else "changed" if doc_id % 5 == 0
                else "same"
            )
            assert df.loc[page_url(doc_id), "status"] == want, doc_id
            added_url = page_url(doc_id + SNAPSHOT_ADD_OFFSET)
            if doc_id % 17 == 2:
                assert df.loc[added_url, "status"] == "added"
            else:
                assert added_url not in df.index
        assert len(df) == n + len([i for i in range(n) if i % 17 == 2])

    def test_identical_snapshots_all_same(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import crawl_delta, snapshot_pages

        df = crawl_delta(
            snapshot_pages(SF_SMOKE, "a"), snapshot_pages(SF_SMOKE, "a")
        ).to_pandas()
        assert (df.status == "same").all()


class TestCrawlHistory:
    def test_counts_and_spans(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import crawl_history, pages_dataset

        df = (
            crawl_history(
                pages_dataset(
                    SF_SMOKE, with_duplicates=True, with_versions=True
                ),
                num_partitions=2,
            )
            .to_pandas()
            .set_index("url")
        )
        import pyarrow.parquet as pq

        from ebook_ocr_ray.sources.pages import page_url

        n = pq.read_metadata(f"{SF_SMOKE}/documents.parquet").num_rows
        assert len(df) == n
        import datetime as dt

        from ebook_ocr_ray.sources.pages import DUP_TS_OFFSET_S, page_ts

        for doc_id in (0, 5, 7, 10):      # %10==0 / %5 only / neither / both
            row = df.loc[page_url(doc_id)]
            want_crawls = 1 + (doc_id % 10 == 0) + 2 * (doc_id % 5 == 0)
            assert row.n_crawls == want_crawls, doc_id
            assert row.n_payloads == (2 if doc_id % 5 == 0 else 1), doc_id
            # exact ts values, not just ordering: first crawl is the base
            # ts; last is +2d for versioned docs, +1d for plain dups
            assert row.first_ts == page_ts(doc_id), doc_id
            want_last = page_ts(doc_id) + dt.timedelta(
                seconds=(2 if doc_id % 5 == 0 else 1 if doc_id % 10 == 0 else 0)
                * DUP_TS_OFFSET_S
            )
            assert row.last_ts == want_last, doc_id
        assert (df.first_ts <= df.last_ts).all()


class TestAnchorTextStats:
    def test_counts(self, ray_session):
        from ebook_ocr_ray.pipelines.linkgraph import anchor_text_stats

        df = (
            anchor_text_stats(SF_SMOKE, num_partitions=2)
            .to_pandas()
            .sort_values(["site", "href"])
            .reset_index(drop=True)
        )
        # chrome links: every html page of a site carries '/about' once
        # with the fixed anchor 'About'
        about = df[df.href == "/about"]
        assert (about.n_anchor_texts == 1).all()
        # tag links '/t/k' carry doc-dependent anchors 'tag-(doc+k)%50':
        # more inlinks than distinct anchors once a site has >1 page
        tags = df[df.href.str.startswith("/t/")]
        assert (tags.n_anchor_texts <= tags.n_links).all()
        assert (tags.n_anchor_texts <= 50).all()
        # totals: 12 links per html page, split across 12 hrefs per site
        assert int(df.n_links.sum()) % 12 == 0


class TestSurvivorKeyEdgeCases:
    def test_key_order_matches_ts_url_order_for_full_int64(self):
        """The zero-padded composite key must sort lexicographically ==
        (warc_ts, url) numerically, INCLUDING pre-epoch (negative)
        timestamps — the bias maps int64 onto [0, 2^64)."""
        import numpy as np

        from ebook_ocr_ray.pipelines.extraction import _survivor_key

        rows = [
            (-(2**62), "b"),   # deep pre-epoch
            (-1, "a"),         # one microsecond pre-epoch
            (-1, "b"),
            (0, "a"),
            (1, "a"),
            (2**62, "a"),
        ]
        ts = np.array([r[0] for r in rows], dtype=np.int64)
        keys = _survivor_key(ts, [r[1] for r in rows])
        assert keys == sorted(keys)
        assert all(len(k.split("|", 1)[0]) == 20 for k in keys)

    def test_pre_epoch_survivor_wins(self, ray_session):
        """dedup_url over a pre-epoch + post-epoch crawl pair of the same
        canonical url: the earliest (pre-epoch) crawl survives."""
        from ebook_ocr_ray.pipelines.extraction import dedup_url

        pages = TestDedupUrl()._pages(
            ray_session,
            [
                ("https://site-1.example/doc/7", dt.datetime(1950, 6, 1)),
                ("https://site-1.example/doc/7/", dt.datetime(1990, 6, 1)),
            ],
        )
        df = dedup_url(pages, num_partitions=2).to_pandas()
        assert len(df) == 1
        assert df.warc_ts.iloc[0] == dt.datetime(1950, 6, 1)
        assert df.n_crawls.iloc[0] == 2


class TestNullKeyGroups:
    """SQL GROUP BY keeps a NULL group; the pandas partials must too
    (dropna=False) — a null url must not silently vanish."""

    def test_dedup_url_keeps_null_url_group(self, ray_session):
        import ray

        t = pa.table(
            {
                "url": pa.array(["https://site-1.example/doc/7", None], pa.string()),
                "warc_ts": pa.array([_ts(7), _ts(8)], pa.timestamp("us")),
            }
        )
        df = ray.data.from_arrow(t).map_batches(
            lambda b: b, batch_format="pyarrow"
        ).to_pandas()
        from ebook_ocr_ray.pipelines.extraction import dedup_url

        out = dedup_url(ray.data.from_arrow(t), num_partitions=2).to_pandas()
        assert len(out) == 2
        assert out.url_norm.isna().sum() == 1
        null_row = out.loc[out.url_norm.isna()].iloc[0]
        assert int(null_row["n_crawls"]) == 1
        # the surviving url of the null group is NULL, not the literal
        # string "None" (the f-string interpolation bug in _survivor_key)
        assert pd.isna(null_row["url"])

    def test_crawl_history_keeps_null_url_group(self, ray_session):
        import ray

        from ebook_ocr_ray.pipelines.extraction import crawl_history

        t = pa.table(
            {
                "url": pa.array(["https://a", None, None], pa.string()),
                "warc_ts": pa.array([_ts(1), _ts(2), _ts(3)], pa.timestamp("us")),
                "html": pa.array([b"x", b"y", b"y"], pa.binary()),
            }
        )
        out = crawl_history(ray.data.from_arrow(t), num_partitions=2).to_pandas()
        assert len(out) == 2
        null_row = out[out.url.isna()]
        assert len(null_row) == 1
        assert int(null_row.n_crawls.iloc[0]) == 2
        assert int(null_row.n_payloads.iloc[0]) == 1
