"""Incremental snapshot dedup: planted history/snapshot semantics, the
persisted-index round trip (atomic update), and broadcast==anti-join."""
import numpy as np
import pandas as pd
import pyarrow as pa

from conftest import SF_SMOKE


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


class TestIncrementalDedup:
    def test_history_and_intra_snapshot_rules(self, ray_session, tmp_path):
        from ebook_ocr_ray.pipelines.incremental import dedup_incremental_ds

        idx = str(tmp_path / "idx")
        history = _ds([(1, "seen before"), (2, "also seen")])
        out0 = dedup_incremental_ds(history, idx, update_index=True).to_pandas()
        assert sorted(out0.doc_id) == [1, 2]        # empty index: all new

        snap = _ds(
            [
                (10, "seen before"),                # in history -> dropped
                (11, "brand new text"),             # survives
                (12, "brand new text"),             # intra-snapshot dup
                (13, "another new one"),            # survives
            ]
        )
        out = dedup_incremental_ds(snap, idx).to_pandas()
        assert sorted(out.doc_id) == [11, 13]

    def test_index_update_round_trip(self, ray_session, tmp_path):
        from ebook_ocr_ray.pipelines.incremental import dedup_incremental_ds

        idx = str(tmp_path / "idx")
        s1 = _ds([(1, "alpha"), (2, "beta")])
        assert len(dedup_incremental_ds(s1, idx, update_index=True).to_pandas()) == 2
        # re-running the SAME snapshot against the updated index: nothing new
        out = dedup_incremental_ds(s1, idx).to_pandas()
        assert len(out) == 0
        # a later snapshot only contributes its genuinely new text
        s2 = _ds([(3, "alpha"), (4, "gamma")])
        out2 = dedup_incremental_ds(s2, idx, update_index=True).to_pandas()
        assert sorted(out2.doc_id) == [4]
        # and the update persisted too
        out3 = dedup_incremental_ds(_ds([(5, "gamma")]), idx).to_pandas()
        assert len(out3) == 0
        # regression: the SECOND same-process update must not have
        # replaced the first update's files (unique-token filenames) —
        # alpha/beta from s1 are still indexed
        out4 = dedup_incremental_ds(
            _ds([(6, "alpha"), (7, "beta")]), idx
        ).to_pandas()
        assert len(out4) == 0

    def test_anti_join_equals_broadcast(self, ray_session, tmp_path, monkeypatch):
        import ebook_ocr_ray.pipelines.incremental as inc

        idx = str(tmp_path / "idx")
        hist = _ds([(i, f"hist {i}") for i in range(30)])
        inc.dedup_incremental_ds(hist, idx, update_index=True).count()
        snap = _ds(
            [(100 + i, f"hist {i}") for i in range(10)]
            + [(200 + i, f"new {i}") for i in range(10)]
        )
        a = inc.dedup_incremental_ds(snap, idx).to_pandas().sort_values(
            "doc_id"
        ).reset_index(drop=True)
        monkeypatch.setattr(inc, "INDEX_BROADCAST_MAX", 0)   # force anti-join
        b = inc.dedup_incremental_ds(snap, idx).to_pandas().sort_values(
            "doc_id"
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert list(a.doc_id) == [200 + i for i in range(10)]

    def test_survivor_join_equals_broadcast(self, ray_session, tmp_path, monkeypatch):
        """The far side of SURVIVOR_BROADCAST_MAX: surviving full rows are
        fetched by a keyed join instead of the driver id broadcast —
        value-identical output."""
        import ebook_ocr_ray.pipelines.incremental as inc

        idx = str(tmp_path / "idx")
        inc.dedup_incremental_ds(
            _ds([(i, f"hist {i}") for i in range(20)]), idx, update_index=True
        ).count()
        snap = _ds(
            [(100 + i, f"hist {i}") for i in range(5)]
            + [(200 + i, f"new {i}") for i in range(5)]
            + [(300, "new 0")]                     # intra-snapshot dup
        )
        a = inc.dedup_incremental_ds(snap, idx).to_pandas().sort_values(
            "doc_id"
        ).reset_index(drop=True)
        monkeypatch.setattr(inc, "SURVIVOR_BROADCAST_MAX", 0)  # force join
        b = inc.dedup_incremental_ds(snap, idx).to_pandas().sort_values(
            "doc_id"
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert list(a.doc_id) == [200 + i for i in range(5)]

    def test_query_wrapper_smoke(self, ray_session):
        from ebook_ocr_ray.pipelines.incremental import dedup_incremental

        out = dedup_incremental(SF_SMOKE).to_pandas()
        assert len(out) > 0
        assert (out.doc_id % 3 == 0).all()


class TestIngestSnapshot:
    """Crash-safe ingestion ordering: DATA FIRST, INDEX SECOND — a crash
    between the two must lose nothing and double nothing."""

    def test_happy_path_and_idempotent_rerun(self, ray_session, tmp_path):
        import os

        from ebook_ocr_ray.pipelines.incremental import (
            dedup_incremental_ds, ingest_snapshot,
        )
        from ebook_ocr_ray.reads import parquet_num_rows, read_parquet_clean

        idx = str(tmp_path / "idx")
        out1 = str(tmp_path / "out1")
        snap = _ds([(1, "alpha"), (2, "beta"), (3, "alpha")])
        assert ingest_snapshot(snap, idx, out1) == 2       # intra-snapshot dedup
        assert parquet_num_rows(out1) == 2
        # rerun over the SAME published artifact: nothing recomputed or
        # doubled (complete artifact wins; fingerprinted index subdir
        # already exists)
        assert ingest_snapshot(snap, idx, out1) == 2
        n_index_parts = sum(
            1 for r, _d, fs in os.walk(idx) for f in fs if f.endswith(".parquet")
        )
        # a second snapshot consults the accumulated index
        out2 = str(tmp_path / "out2")
        snap2 = _ds([(10, "alpha"), (11, "gamma")])
        assert ingest_snapshot(snap2, idx, out2) == 1      # only gamma is new
        got = read_parquet_clean(out2).to_pandas()
        assert list(got.doc_id) == [11]

    def test_crash_between_data_and_index_loses_nothing(
        self, ray_session, tmp_path, monkeypatch
    ):
        """Simulate dying AFTER the data publish but BEFORE the index
        update: re-running completes the index from the published rows;
        the documents are never lost (the update_index=True ordering
        would have lost them)."""
        import ebook_ocr_ray.pipelines.incremental as inc
        from ebook_ocr_ray.reads import parquet_num_rows, read_parquet_clean

        idx = str(tmp_path / "idx")
        out = str(tmp_path / "out")
        snap = _ds([(1, "delta"), (2, "epsilon")])

        import ebook_ocr_ray.state.atomic as atomic

        orig = atomic.publish_into

        def crash(*a, **k):
            raise RuntimeError("simulated crash before index update")

        monkeypatch.setattr(inc, "dedup_incremental_ds", inc.dedup_incremental_ds)
        monkeypatch.setattr(atomic, "publish_into", crash)
        try:
            inc.ingest_snapshot(snap, idx, out)
        except RuntimeError:
            pass
        monkeypatch.setattr(atomic, "publish_into", orig)
        # data survived the crash; index not yet updated
        assert parquet_num_rows(out) == 2
        # re-run: completes the index idempotently, rows unchanged
        assert inc.ingest_snapshot(snap, idx, out) == 2
        assert parquet_num_rows(out) == 2
        # the keys are NOW indexed: a recrawl of the same texts yields 0
        out2 = str(tmp_path / "out2")
        assert inc.ingest_snapshot(_ds([(9, "delta")]), idx, out2) == 0

    def test_update_index_requires_index_dir(self, ray_session):
        import pytest

        from ebook_ocr_ray.pipelines.incremental import dedup_incremental_ds

        with pytest.raises(ValueError, match="requires index_dir"):
            dedup_incremental_ds(_ds([(1, "x")]), None, update_index=True)
