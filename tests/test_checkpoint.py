"""Resumable checkpoint tests: crash mid-run, restart skips completed
partitions, final output identical to an uninterrupted run
(FIXTURES.md §5 contract)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
NPARTS = 16


def factory(parts: set[int]):
    """Part filter applied to PREPARED pages, before extraction — skipped
    partitions are never extracted."""
    from ebook_ocr_ray.pipelines.extraction import extract, pages_dataset, prepare_pages
    from ebook_ocr_ray.state.checkpoint import part_filter

    prepared = prepare_pages(pages_dataset(SF)).map_batches(
        part_filter(parts), batch_format="pyarrow"
    )
    return extract(prepared)


class TestCheckpointResume:
    def test_crash_then_resume_produces_identical_output(self, ray_session, tmp_path):
        from ebook_ocr_ray.state.checkpoint import (
            completed_parts,
            read_checkpointed_output,
            run_checkpointed_extraction,
            version_hash,
        )

        full_dir = str(tmp_path / "full")
        run_checkpointed_extraction(factory, full_dir, num_partitions=64, waves=2)
        full = read_checkpointed_output(full_dir)
        assert len(full) == 500

        crash_dir = str(tmp_path / "crash")
        m = run_checkpointed_extraction(
            factory, crash_dir, num_partitions=64, waves=4, fail_after_waves=2
        )
        done_after_crash = completed_parts(crash_dir, version_hash())
        assert 0 < len(done_after_crash) < 64
        partial = read_checkpointed_output(crash_dir)
        assert 0 < len(partial) < 500

        # resume: must finish the rest and end up byte-identical
        run_checkpointed_extraction(factory, crash_dir, num_partitions=64, waves=4)
        resumed = read_checkpointed_output(crash_dir)
        a = full.sort_values("url").reset_index(drop=True)
        b = resumed.sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a[["url", "extracted_text", "content_sha"]],
            b[["url", "extracted_text", "content_sha"]],
        )

    def test_version_change_invalidates(self, ray_session, tmp_path):
        from ebook_ocr_ray.state.checkpoint import (
            completed_parts,
            run_checkpointed_extraction,
            version_hash,
        )

        out = str(tmp_path / "v")
        run_checkpointed_extraction(factory, out, num_partitions=64, waves=1)
        assert len(completed_parts(out, version_hash())) == 64
        # a different extractor version sees nothing as complete
        assert completed_parts(out, version_hash("v2")) == set()


class TestManifestEdges:
    def test_manifest_roundtrip_and_overwrite(self, tmp_path):
        from ebook_ocr_ray.state.checkpoint import _append_manifest, read_manifest

        out = str(tmp_path)
        _append_manifest(out, [{"part_id": 1, "doc_count": 5, "byte_count": 10,
                                "char_count": 20, "extractor_version_hash": "v",
                                "status": "complete"}])
        _append_manifest(out, [{"part_id": 1, "doc_count": 7, "byte_count": 11,
                                "char_count": 21, "extractor_version_hash": "v",
                                "status": "complete"}])
        m = read_manifest(out)
        assert len(m) == 1 and int(m.doc_count.iloc[0]) == 7   # last write wins

    def test_empty_manifest(self, tmp_path):
        from ebook_ocr_ray.state.checkpoint import completed_parts, read_manifest

        assert read_manifest(str(tmp_path)).empty
        assert completed_parts(str(tmp_path), "v") == set()

    def test_version_hash_is_stable_and_distinct(self):
        from ebook_ocr_ray.state.checkpoint import version_hash

        assert version_hash() == version_hash()
        assert version_hash("a") != version_hash("b")


class TestManifestStats:
    def test_manifest_doc_counts_total_the_input(self, ray_session, tmp_path):
        """The per-partition manifest stats must add up to the corpus —
        regression for the hive partition column reading back as STRING
        and every int index probe silently recording doc_count=0."""
        from ebook_ocr_ray.state.checkpoint import run_checkpointed_extraction

        out = str(tmp_path / "out")
        run_checkpointed_extraction(factory, out, num_partitions=64, waves=2)
        mf = pd.read_parquet(f"{out}/manifest.parquet")
        assert int(mf.doc_count.sum()) == 500
        assert int(mf.byte_count.sum()) > 0
        assert int(mf.char_count.sum()) > 0
