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
