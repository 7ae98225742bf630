"""End-to-end Ray pipeline tests at sf0.001: golden byte-identity against
the committed fixture, dedup invariants, lineage, determinism under
parallelism."""

import json
import os

import pyarrow.parquet as pq
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_sf0.001.parquet")
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def extracted(ray_session):
    from ebook_ocr_ray.pipelines.extraction import extraction_pipeline

    return extraction_pipeline(SF, with_duplicates=True, dedup=True).to_pandas()


class TestGoldenByteIdentity:
    def test_every_url_matches_committed_golden(self, extracted):
        golden = pq.read_table(GOLDEN).to_pylist()
        got = dict(zip(extracted.url, extracted.extracted_text))
        assert len(got) == len(golden)
        mismatches = [g["url"] for g in golden if got.get(g["url"]) != g["extracted_text"]]
        assert mismatches == []

    def test_headings_and_metrics_match_golden(self, extracted):
        golden = {g["url"]: g for g in pq.read_table(GOLDEN).to_pylist()}
        for _, row in extracted.iterrows():
            g = golden[row.url]
            assert list(row.headings) == g["headings"]
            assert row.n_lines == g["n_lines"]
            assert json.loads(row.contributions) == json.loads(g["contributions"])

    def test_no_errors(self, extracted):
        assert extracted.error.notna().sum() == 0


class TestDedup:
    def test_duplicates_removed_keep_earliest(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import dedup_exact, pages_dataset, prepare_pages

        prepared = prepare_pages(pages_dataset(SF, with_duplicates=True)).materialize()
        total = prepared.count()
        deduped = dedup_exact(prepared, slim=prepared).to_pandas()
        assert total > len(deduped)                      # dups existed
        assert deduped.url.is_unique
        # survivors are the earliest crawl of each duplicated url
        base = pq.read_table(f"{SF}/documents.parquet").to_pylist()
        import datetime
        for r in base:
            if r["doc_id"] % 10 == 0:
                url = f"https://site-{r['doc_id'] % 20}.example/doc/{r['doc_id']}"
                ts = deduped[deduped.url == url].warc_ts.iloc[0]
                expect = datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=r["doc_id"])
                assert ts.to_pydatetime() == expect

    def test_dedup_idempotent(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import dedup_exact, pages_dataset, prepare_pages

        prepared = prepare_pages(pages_dataset(SF, with_duplicates=True)).materialize()
        once = dedup_exact(prepared, slim=prepared).materialize()
        twice = dedup_exact(once, slim=once).to_pandas()
        assert len(twice) == once.count()


class TestLineage:
    def test_site_counts_sum_to_corpus(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import extraction_pipeline, lineage

        lin = lineage(extraction_pipeline(SF, dedup=False)).to_pandas()
        assert lin.doc_count.sum() == 500
        assert len(lin) == 20
        assert (lin.byte_count > 0).all() and (lin.char_count > 0).all()


class TestDeterminism:
    def test_parallel_equals_serial(self, ray_session):
        """The north-rule invariant: the distributed run is byte-identical
        to a single-threaded reference-semantics run."""
        from ebook_ocr_ray.config import ExtractionConfig
        from ebook_ocr_ray.pipelines.extraction import extraction_pipeline
        from ebook_ocr_ray.sources.pages import page_url, synth_payload
        from ebook_ocr_ray.stages.extract import extract_one

        cfg = ExtractionConfig()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()[:100]
        serial = {
            page_url(r["doc_id"]): extract_one(synth_payload(r["doc_id"], r["text"]), cfg)[0]
            for r in docs
        }
        out = extraction_pipeline(SF, dedup=False).to_pandas()
        got = dict(zip(out.url, out.extracted_text))
        assert all(got[u] == t for u, t in serial.items())


class TestByteIdenticalRecords:
    def test_identical_rows_dedup_to_one(self, ray_session):
        """Byte-identical crawl records (same url, ts, payload) cannot be
        distinguished row-by-row — the tie path must still keep exactly
        one (code-review finding, round 1)."""
        import datetime as dt

        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.extraction import dedup_exact, prepare_pages

        row = {
            "url": "https://x.example/same",
            "warc_ts": dt.datetime(2026, 1, 1),
            "html": b"<main><p>identical record body, long enough text.</p></main>",
            "text": "",
            "lang": "en",
        }
        other = dict(row, url="https://x.example/other", html=b"<main><p>a different body entirely here.</p></main>")
        ds = rd.from_arrow(pa.Table.from_pylist([row, row, row, other]))
        prepared = prepare_pages(ds).materialize()
        out = dedup_exact(prepared, slim=prepared).to_pandas()
        assert len(out) == 2
        assert sorted(out.url) == ["https://x.example/other", "https://x.example/same"]


class TestKeyedSurvivorAggregate:
    def test_cross_block_ties_detected(self, ray_session):
        """Byte-identical records split across DIFFERENT blocks must still
        be detected as a tie group — this exercises the custom survivor
        aggregate's combine path (each block's partial sees n_min=1; only
        the keyed merge can see the global tie)."""
        import datetime as dt

        import pyarrow as pa
        import ray
        import ray.data as rd

        from ebook_ocr_ray.pipelines.extraction import (
            dedup_apply,
            dedup_survivor_state,
            prepare_pages,
        )

        row = {
            "url": "https://x.example/same",
            "warc_ts": dt.datetime(2026, 1, 1),
            "html": b"<main><p>identical record body, long enough text.</p></main>",
            "text": "",
            "lang": "en",
        }
        other = dict(
            row,
            url="https://x.example/other",
            html=b"<main><p>a different body entirely here.</p></main>",
        )
        # three identical copies, each its own block (union of one-row
        # datasets), so no single batch ever sees two of them
        parts = [rd.from_arrow(pa.Table.from_pylist([r])) for r in (row, row, row, other)]
        ds = parts[0].union(*parts[1:])
        prepared = prepare_pages(ds).materialize()
        survivors_ref, ties_ref = dedup_survivor_state(
            prepared.select_columns(["content_sha", "warc_ts", "url"])
        )
        assert len(ray.get(ties_ref)) == 1               # the tie group was seen
        assert len(ray.get(survivors_ref)) == 1          # only dup groups collected
        out = dedup_apply(prepared, survivors_ref, ties_ref).to_pandas()
        assert len(out) == 2
        assert sorted(out.url) == ["https://x.example/other", "https://x.example/same"]


class TestGoldenVerificationJoin:
    def test_join_reports_no_mismatches(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import (
            extraction_pipeline,
            verify_against_golden,
        )

        extracted = extraction_pipeline(SF, dedup=False)
        mism = verify_against_golden(extracted, GOLDEN)
        assert len(mism) == 0

    def test_join_catches_a_corruption(self, ray_session):
        import pyarrow as pa

        from ebook_ocr_ray.pipelines.extraction import (
            extraction_pipeline,
            verify_against_golden,
        )

        def corrupt_one(t: pa.Table) -> pa.Table:
            texts = t["extracted_text"].to_pylist()
            urls = t["url"].to_pylist()
            for i, u in enumerate(urls):
                if u.endswith("/doc/1"):
                    texts[i] = texts[i] + " CORRUPTED"
            return t.set_column(
                t.schema.get_field_index("extracted_text"),
                "extracted_text",
                pa.array(texts, pa.large_string()),
            )

        extracted = extraction_pipeline(SF, dedup=False).map_batches(
            corrupt_one, batch_format="pyarrow"
        )
        mism = verify_against_golden(extracted, GOLDEN)
        assert len(mism) == 1
        assert mism.url.iloc[0].endswith("/doc/1")

    def test_join_catches_a_dropped_document(self, ray_session):
        """A document entirely missing from the extracted corpus must
        surface as a mismatch row (full-outer join), not vanish into a
        silent pass (ADVICE round 1)."""
        import pyarrow as pa

        from ebook_ocr_ray.pipelines.extraction import (
            extraction_pipeline,
            verify_against_golden,
        )

        def drop_one(t: pa.Table) -> pa.Table:
            mask = [not u.endswith("/doc/2") for u in t["url"].to_pylist()]
            return t.filter(pa.array(mask, pa.bool_()))

        extracted = extraction_pipeline(SF, dedup=False).map_batches(
            drop_one, batch_format="pyarrow"
        )
        mism = verify_against_golden(extracted, GOLDEN)
        assert len(mism) == 1
        assert mism.golden_text.notna().all()            # the golden side survived
        assert mism.extracted_text.isna().all()          # the extracted side is gone


class TestConsolidateBooks:
    def test_ordered_concat_with_markers_and_heading_wrap(self, ray_session):
        """Reference semantics (src/consolidate.py:53-91): parts sorted by
        url, '--- part ---' markers, and in book_md any line byte-equal to
        one of the part's headings wrapped as '\\n## h\\n'; book_txt left
        plain."""
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.extraction import consolidate_books

        rows = [
            # parts arrive out of order; sort must restore a0 < a1
            {"url": "https://s.example/d#a1", "extracted_text": "Title\nsecond part",
             "headings": ["Title"]},
            {"url": "https://s.example/d#a0", "extracted_text": "Title\nfirst part",
             "headings": ["Title"]},
            # a single-part doc with no headings: no wrapping at all
            {"url": "https://s.example/solo", "extracted_text": "plain\nbody",
             "headings": []},
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = consolidate_books(ds).to_pandas().set_index("url")

        d = out.loc["https://s.example/d"]
        assert d.n_pages == 2
        assert d.book_txt == (
            "\n--- a0 ---\n\nTitle\nfirst part\n\n"
            "\n--- a1 ---\n\nTitle\nsecond part\n\n"
        )
        assert d.book_md == (
            "\n--- a0 ---\n\n\n## Title\n\nfirst part\n\n"
            "\n--- a1 ---\n\n\n## Title\n\nsecond part\n\n"
        )
        solo = out.loc["https://s.example/solo"]
        assert solo.n_pages == 1
        # part key falls back to the full url when there is no fragment
        assert solo.book_txt == "\n--- https://s.example/solo ---\n\nplain\nbody\n\n"
        assert solo.book_md == solo.book_txt


class TestConsolidateManyParts:
    def test_numeric_part_order_past_ten(self, ray_session):
        """'#a10' must follow '#a2' (round-2 review: lexicographic url
        sort scrambled books with 10+ articles)."""
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.extraction import consolidate_books

        rows = [
            {"url": f"https://s.example/d#a{k}", "extracted_text": f"part {k}",
             "headings": []}
            for k in range(12)
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = consolidate_books(ds).to_pandas()
        txt = out.book_txt.iloc[0]
        order = [int(seg.split(" ---")[0]) for seg in txt.split("\n--- a")[1:]]
        assert order == list(range(12))


class TestBloomDedup:
    def test_matches_broadcast_path_including_ties(self, ray_session):
        """dedup_exact_bloom must select exactly the same survivors as the
        broadcast path (earliest crawl per payload, byte-identical ties
        kept once), differing only in memory/shuffle strategy."""
        from ebook_ocr_ray.pipelines.extraction import (
            dedup_exact,
            dedup_exact_bloom,
            pages_dataset,
            prepare_pages,
        )

        prepared = prepare_pages(pages_dataset(SF, with_duplicates=True)).materialize()
        a = dedup_exact(prepared, slim=prepared).to_pandas()
        b = dedup_exact_bloom(prepared, slim=prepared).to_pandas()
        ka = sorted(zip(a.url, a.warc_ts))
        kb = sorted(zip(b.url, b.warc_ts))
        assert ka == kb

    def test_byte_identical_rows_keep_one(self, ray_session):
        import datetime as dt

        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.extraction import dedup_exact_bloom, prepare_pages

        row = {
            "url": "https://x.example/same",
            "warc_ts": dt.datetime(2026, 1, 1),
            "html": b"<main><p>identical record body, long enough text.</p></main>",
            "text": "",
            "lang": "en",
        }
        ds = rd.from_arrow(pa.Table.from_pylist([row, row, row]))
        prepared = prepare_pages(ds).materialize()
        out = dedup_exact_bloom(prepared, slim=prepared).to_pandas()
        assert len(out) == 1

    def test_bloom_filter_units(self):
        from ebook_ocr_ray.functions.bloom import BloomFilter

        import hashlib

        items = [hashlib.md5(str(i).encode()).hexdigest() for i in range(500)]
        others = [hashlib.md5(f"x{i}".encode()).hexdigest() for i in range(2000)]
        bf = BloomFilter.sized(len(items), fp_rate=0.01)
        bf.add_hex(items)
        assert bf.might_contain_hex(items).all()          # no false negatives
        fp = bf.might_contain_hex(others).mean()
        assert fp < 0.05                                  # fp rate in the ballpark

    def test_vectorized_positions_match_scalar(self):
        """The numpy position matrix must reproduce the scalar double-
        hashing positions bit for bit (the filter is persisted-state-free
        but processes must agree across versions)."""
        import hashlib

        from ebook_ocr_ray.functions.bloom import BloomFilter

        bf = BloomFilter.sized(1000, fp_rate=0.001)
        items = [hashlib.md5(str(i).encode()).hexdigest() for i in range(64)]
        mat = bf._position_matrix(items)
        for row, d in zip(mat, items):
            assert row.tolist() == bf._positions(d)

    def test_auto_flip_equals_broadcast(self, ray_session):
        """Far-side test for SURVIVORS_BROADCAST_MAX: forcing the bound
        to 0 routes dedup_exact through the distributed-Bloom strategy,
        which must pick the identical survivor set (byte-identical ties
        included)."""
        from ebook_ocr_ray.pipelines.extraction import (
            dedup_exact,
            pages_dataset,
            prepare_pages,
        )

        prepared = prepare_pages(pages_dataset(SF, with_duplicates=True)).materialize()
        a = dedup_exact(prepared, slim=prepared).to_pandas()
        b = dedup_exact(prepared, slim=prepared, broadcast_max=0).to_pandas()
        assert sorted(zip(a.url, a.warc_ts)) == sorted(zip(b.url, b.warc_ts))


class TestSpoolMode:
    def test_spool_matches_reread(self, extracted, tmp_path):
        """spool_dir mode (synthesize once -> scratch parquet -> column-
        pruned pass A) must produce exactly the re-read mode's corpus."""
        from ebook_ocr_ray.pipelines.extraction import extraction_pipeline

        spooled = extraction_pipeline(
            SF, with_duplicates=True, dedup=True, spool_dir=str(tmp_path / "spool")
        ).to_pandas()
        a = extracted.sort_values("url").reset_index(drop=True)
        b = spooled.sort_values("url").reset_index(drop=True)
        assert list(a.url) == list(b.url)
        assert list(a.extracted_text) == list(b.extracted_text)
        assert list(a.content_sha) == list(b.content_sha)


class TestSpoolDirtyDirGuard:
    def test_nonempty_spool_dir_rejected(self, ray_session, tmp_path):
        import pytest

        from conftest import SF_SMOKE
        from ebook_ocr_ray.pipelines.extraction import extraction_pipeline

        spool = tmp_path / "spool"
        spool.mkdir()
        (spool / "leftover.parquet").write_bytes(b"junk")
        with pytest.raises(ValueError, match="not empty"):
            extraction_pipeline(SF_SMOKE, dedup=True, spool_dir=str(spool))
