"""Sequence (crawl-history) dedup: ordered scan within url groups."""

import pandas as pd


class TestSequenceDedup:
    def test_version_chain_exact(self, ray_session):
        from ebook_ocr_ray.pipelines.extraction import (
            pages_dataset,
            prepare_pages,
            sequence_dedup,
        )

        prepared = prepare_pages(
            pages_dataset("/root/testdata/sf0.001", with_versions=True)
        ).materialize()
        total = prepared.count()
        out = sequence_dedup(prepared).to_pandas()
        # identical +1d recrawls dropped; changed +2d revisions kept
        versioned = 500 // 5
        assert total == 500 + 2 * versioned
        assert len(out) == 500 + versioned
        counts = out.groupby("url").size()
        assert (counts <= 2).all()

    def test_near_dup_threshold_simhash(self, ray_session):
        """With a hamming threshold, a lightly-edited recrawl is dropped;
        a rewritten one survives."""
        import datetime as dt

        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.extraction import prepare_pages, sequence_dedup

        base = "stable words repeated across this document " * 6
        rows = []
        for i, (text, kind) in enumerate(
            [
                (base, "v0"),
                (base + " tiny tail", "near-dup -> drop"),
                ("completely different rewritten article about other topics entirely "
                 "with many new tokens present", "rewrite -> keep"),
            ]
        ):
            rows.append(
                {
                    "url": "https://x.example/a",
                    "warc_ts": dt.datetime(2026, 1, 1) + dt.timedelta(days=i),
                    "html": f"<main><p>{text}</p></main>".encode(),
                    "text": text,
                    "lang": "en",
                }
            )
        ds = prepare_pages(rd.from_arrow(pa.Table.from_pylist(rows)))
        out = sequence_dedup(ds, hamming_threshold=12).to_pandas()
        assert len(out) == 2
        kept_ts = sorted(t.day for t in out.warc_ts)
        assert kept_ts == [1, 3]
