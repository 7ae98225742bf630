"""Skew handling: oversized payloads get isolated into their own blocks
(the north-rule skew-aware split) and still extract correctly."""

import pyarrow as pa

from ebook_ocr_ray.config import OVERSIZE_BLOB_BYTES
from ebook_ocr_ray.sources.pages import (
    OVERSIZE_EVERY,
    doc_title,
    oversize_repeats,
    synth_oversized_html,
)
from ebook_ocr_ray.stages.extract import extract_one
from ebook_ocr_ray.config import ExtractionConfig


class TestOversizedBlobs:
    def test_oversized_payload_exceeds_threshold(self):
        big = synth_oversized_html(96, "some words repeated " * 8)
        assert len(big) > OVERSIZE_BLOB_BYTES

    def test_oversized_extraction_closed_form(self):
        text = "alpha beta gamma delta epsilon words enough here"
        big = synth_oversized_html(96, text)
        got, heads, n, g, c, a = extract_one(big, ExtractionConfig())
        want = doc_title(96) + "\n" + "\n".join([text] * oversize_repeats(text))
        assert got == want
        assert heads == [doc_title(96)]

    def test_skew_split_extraction(self, ray_session):
        """Oversized rows take the batch_size=1 path; the union output is
        complete and correct for both populations."""
        from ebook_ocr_ray.pipelines.extraction import (
            extract_skew_split,
            pages_dataset,
            prepare_pages,
        )

        prepared = prepare_pages(
            pages_dataset("/root/testdata/sf0.001", with_oversized=True)
        ).materialize()
        n_big = prepared.map_batches(
            lambda t: t.filter(
                pa.array(
                    [s > OVERSIZE_BLOB_BYTES for s in t["payload_bytes"].to_pylist()]
                )
            ),
            batch_format="pyarrow",
        ).count()
        assert n_big > 0

        out = extract_skew_split(prepared).to_pandas()
        assert len(out) == prepared.count()
        assert out.error.notna().sum() == 0
        big_rows = out[out.url.str.endswith("/big")]
        assert len(big_rows) == n_big
        assert (big_rows.n_lines > 100).all()   # title + many repeated lines




class TestSpreadSplit:
    """1->N multi-article payload split (the spread-page analog)."""

    def test_split_two_articles(self):
        from ebook_ocr_ray.sources.pages import synth_spread_html
        from ebook_ocr_ray.stages.extract import split_multidoc_batch

        import datetime as dt

        t = pa.Table.from_pylist(
            [
                {
                    "url": "https://s.example/d/1",
                    "warc_ts": dt.datetime(2026, 1, 1),
                    "html": synth_spread_html(1, "six words or more right here"),
                    "text": "six words or more right here",
                    "lang": "en",
                },
                {
                    "url": "https://s.example/d/2",
                    "warc_ts": dt.datetime(2026, 1, 1),
                    "html": b"<main><p>single doc body, long enough text.</p></main>",
                    "text": "",
                    "lang": "en",
                },
            ]
        )
        out = split_multidoc_batch(t)
        urls = out["url"].to_pylist()
        assert urls == [
            "https://s.example/d/1#a0",
            "https://s.example/d/1#a1",
            "https://s.example/d/2",
        ]

    def test_split_parts_extract_independently(self):
        from ebook_ocr_ray.sources.pages import VERSION_SUFFIX, synth_spread_html
        from ebook_ocr_ray.stages.extract import extract_one, split_multidoc_batch

        import datetime as dt

        text = "six words or more right here"
        t = pa.Table.from_pylist(
            [
                {
                    "url": "u",
                    "warc_ts": dt.datetime(2026, 1, 1),
                    "html": synth_spread_html(5, text),
                    "text": text,
                    "lang": "en",
                }
            ]
        )
        out = split_multidoc_batch(t)
        from ebook_ocr_ray.config import ExtractionConfig

        got0 = extract_one(out["html"][0].as_py(), ExtractionConfig())[0]
        got1 = extract_one(out["html"][1].as_py(), ExtractionConfig())[0]
        assert got0 == f"Document 5\n{text}"
        assert got1 == f"Document 5\n{text}{VERSION_SUFFIX}"


class TestInterludePreservation:
    def test_content_between_articles_kept_once(self):
        """Inter-article bytes attach to the following logical page —
        nothing silently dropped (code-review finding, round 1)."""
        import datetime as dt

        from ebook_ocr_ray.stages.extract import split_multidoc_batch

        payload = (
            b"<body><article><p>first article body text here.</p></article>"
            b"<p>interlude text between articles, long enough.</p>"
            b"<article><p>second article body text here.</p></article></body>"
        )
        t = pa.Table.from_pylist(
            [{"url": "u", "warc_ts": dt.datetime(2026, 1, 1), "html": payload,
              "text": "", "lang": "en"}]
        )
        out = split_multidoc_batch(t)
        blobs = out["html"].to_pylist()
        assert len(blobs) == 2
        assert b"interlude" not in blobs[0]
        assert b"interlude" in blobs[1]          # exactly once, with part 2
        assert b"first article" in blobs[0] and b"second article" in blobs[1]


class TestConsolidationSkew:
    def test_hot_url_with_thousands_of_parts(self, ray_session):
        """One url carrying 3,000 article parts (the worst spread-split
        skew) must consolidate in order without blowing group memory —
        the group fold is ordered and group-local."""
        import pyarrow as pa
        import ray.data
        from ebook_ocr_ray.pipelines.extraction import consolidate_books

        n = 3000
        rows = pa.table(
            {
                "url": pa.array(
                    [f"https://hot.example/doc/1#a{k}" for k in range(n)], pa.string()
                ),
                "extracted_text": pa.array(
                    [f"part text {k}" for k in range(n)], pa.string()
                ),
                "headings": pa.array([[] for _ in range(n)],
                                     pa.list_(pa.string())),
            }
        )
        out = consolidate_books(ray.data.from_arrow(rows)).to_pandas()
        assert len(out) == 1
        book = out.book_txt.iloc[0]
        # every part present exactly once, in numeric (not lexical) order
        pos = [book.find(f"--- a{k} ---") for k in range(n)]
        assert all(p >= 0 for p in pos)
        assert pos == sorted(pos)
        assert out.n_pages.iloc[0] == n


class TestPropagateLabels:
    def _edges(self, pairs):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([p[0] for p in pairs], pa.int64()),
                    "id_b": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )

    def test_driver_equals_keyed(self, ray_session):
        import numpy as np

        from ebook_ocr_ray.pipelines.neardup import propagate_labels

        rng = np.random.RandomState(11)
        # a chain (diameter > 1), a triangle, a star, and isolated pairs
        pairs = (
            [(i, i + 1) for i in range(100, 110)]
            + [(1, 2), (2, 3), (3, 1)]
            + [(50, 51), (50, 52), (50, 53)]
            + [(int(a), int(a) + 1000) for a in rng.randint(200, 900, 20)]
        )
        d = (
            propagate_labels(self._edges(pairs), strategy="driver")
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        k = (
            propagate_labels(self._edges(pairs), strategy="keyed")
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(d, k)
        assert (d[d.node.between(100, 110)].label == 100).all()

    def test_union_find_min_label(self):
        import pandas as pd

        from ebook_ocr_ray.pipelines.neardup import _union_find_labels

        t = _union_find_labels(
            pd.DataFrame({"id_a": [5, 9, 2], "id_b": [9, 7, 5]})
        ).to_pandas().set_index("node")["label"]
        # component {5,9,7,2} -> min 2
        assert set(t.index) == {2, 5, 7, 9}
        assert (t == 2).all()


class TestPairTextGather:
    def test_gather_equals_keyed_join(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from conftest import SF_SMOKE
        from ebook_ocr_ray.pipelines import neardup

        pairs = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([1, 5, 9], pa.int64()),
                    "id_b": pa.array([2, 6, 10], pa.int64()),
                }
            )
        )
        a = (
            neardup._join_pair_texts(pairs, SF_SMOKE, 1, n_pairs=3)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        b = (
            neardup._join_pair_texts(pairs, SF_SMOKE, 1, n_pairs=None)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b[a.columns])
        assert a["text_a"].notna().all() and a["text_b"].notna().all()


class TestMinhashCascade:
    def test_cascade_equals_plain(self, ray_session):
        import pandas as pd

        from conftest import SF_SMOKE
        from ebook_ocr_ray.pipelines import neardup

        a = (
            neardup.minhash_clusters(SF_SMOKE)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            neardup.minhash_clusters_cascade(SF_SMOKE)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_fuzzy_cascade_equals_plain_on_case_perturbed_mirrors(
        self, ray_session, tmp_path
    ):
        """The fuzzy equality contract's positive case: variants differ
        only by one word's case / trailing '!!', so every
        normalization-equal pair keeps raw Jaccard >= threshold (plain
        LSH still finds and verifies it) and variants have no external
        edges their representative lacks — cascade(fuzzy=True), the
        byte-exact cascade, and plain minhash_clusters must agree."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ebook_ocr_ray.pipelines import neardup

        rows_id, rows_tx = [], []
        for b in range(8):
            words = [f"base{b}word{j}" for j in range(20)]
            base = " ".join(words)
            upper = " ".join([words[0].upper()] + words[1:])
            variants = [base, upper, base + " !!", upper + " !!"]
            for v, t in enumerate(variants):
                rows_id.append(b * 100 + v)
                rows_tx.append(t)
        for s in range(10):                       # singletons stay alone
            rows_id.append(10_000 + s)
            rows_tx.append(" ".join(f"lone{s}tok{j}" for j in range(20)))
        pq.write_table(
            pa.table(
                {"doc_id": pa.array(rows_id, pa.int64()),
                 "text": pa.array(rows_tx, pa.string())}
            ),
            tmp_path / "documents.parquet",
        )
        sf = str(tmp_path)
        plain = (
            neardup.minhash_clusters(sf)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        exact_casc = (
            neardup.minhash_clusters_cascade(sf)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        fuzzy_casc = (
            neardup.minhash_clusters_cascade(sf, fuzzy=True)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(plain, exact_casc)
        pd.testing.assert_frame_equal(plain, fuzzy_casc)
        # and the clustering is the intended one: each group collapsed
        # to its min id, singletons to themselves
        grp = fuzzy_casc[fuzzy_casc.doc_id < 10_000]
        assert (grp.cluster_id == (grp.doc_id // 100) * 100).all()
        lone = fuzzy_casc[fuzzy_casc.doc_id >= 10_000]
        assert (lone.cluster_id == lone.doc_id).all()

    def test_fuzzy_cascade_collapses_case_mirror_farm(self, ray_session, tmp_path):
        """Case-perturbed mirror farm (every copy uppercases a DIFFERENT
        word, so byte-exact dedup collapses nothing): fuzzy=True must
        collapse each farm to one survivor pre-LSH and re-attach every
        copy to the farm minimum — the dup-saturation valve for
        non-byte-identical mirrors."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ebook_ocr_ray.pipelines import neardup

        rows_id, rows_tx = [], []
        for i in range(6):
            words = [f"farm{i}tok{j}" for j in range(20)]
            for r in range(64):
                w = list(words)
                w[r % 20] = w[r % 20].upper()     # 64 distinct byte variants
                rows_id.append(r * 1000 + i)
                rows_tx.append(" ".join(w))
        pq.write_table(
            pa.table(
                {"doc_id": pa.array(rows_id, pa.int64()),
                 "text": pa.array(rows_tx, pa.string())}
            ),
            tmp_path / "documents.parquet",
        )
        out = neardup.minhash_clusters_cascade(
            str(tmp_path), fuzzy=True
        ).to_pandas()
        assert len(out) == 64 * 6
        assert (out.cluster_id == out.doc_id % 1000).all()

    def test_mirror_saturated_corpus(self, ray_session, tmp_path):
        """256 exact copies of each text: plain minhash faces C(256,2)
        pairs per clique; the cascade collapses to one survivor per text
        first and every copy inherits the survivor's cluster."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        texts = [f"distinct document number {i} words here now" for i in range(6)]
        rows_id, rows_tx = [], []
        for r in range(256):
            for i, t in enumerate(texts):
                rows_id.append(r * 1000 + i)
                rows_tx.append(t)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(rows_id, pa.int64()),
                    "text": pa.array(rows_tx, pa.string()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        from ebook_ocr_ray.pipelines import neardup

        out = neardup.minhash_clusters_cascade(str(tmp_path)).to_pandas()
        assert len(out) == 256 * 6
        # every copy of text i clusters to the min id holding text i (= i)
        assert (out.cluster_id == out.doc_id % 1000).all()
