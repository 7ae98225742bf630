"""Spool-to-scratch for the O(corpus) slim intermediates: spool mode
must be value-identical to materialize mode on every pipeline that
offers it, prune the re-reads it promises, and refuse dirty dirs."""
import os

import pandas as pd
import pyarrow as pa
import pytest

from conftest import SF_SMOKE


def _sorted(df: pd.DataFrame, keys) -> pd.DataFrame:
    return df.sort_values(keys).reset_index(drop=True)


class TestPinReusable:
    def test_materialize_mode_roundtrip(self, ray_session):
        import ray.data as rd

        from ebook_ocr_ray.state.spool import pin_reusable

        t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                      "b": pa.array(["x", "y", "z"], pa.string())})
        r = pin_reusable(rd.from_arrow(t), None, "rows", schema=t.schema)
        assert r.n_rows == 3 and r.path is None
        assert _sorted(r.read().to_pandas(), ["a"]).equals(
            _sorted(t.to_pandas(), ["a"])
        )
        assert list(r.read(columns=["b"]).to_pandas().columns) == ["b"]

    def test_spool_mode_roundtrip_and_prune(self, ray_session, tmp_path):
        import ray.data as rd

        from ebook_ocr_ray.state.spool import pin_reusable

        t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                      "b": pa.array(["x", "y", "z"], pa.string())})
        r = pin_reusable(rd.from_arrow(t), str(tmp_path), "rows", schema=t.schema)
        assert r.n_rows == 3
        assert r.path == str(tmp_path / "rows") and os.path.isdir(r.path)
        assert _sorted(r.read().to_pandas(), ["a"]).equals(
            _sorted(t.to_pandas(), ["a"])
        )
        assert list(r.read(columns=["b"]).to_pandas().columns) == ["b"]

    def test_dirty_dir_refused(self, ray_session, tmp_path):
        import ray.data as rd

        from ebook_ocr_ray.state.spool import pin_reusable

        t = pa.table({"a": pa.array([1], pa.int64())})
        os.makedirs(tmp_path / "rows")
        (tmp_path / "rows" / "stale.parquet").write_text("x")
        with pytest.raises(ValueError, match="not empty"):
            pin_reusable(rd.from_arrow(t), str(tmp_path), "rows", schema=t.schema)

    def test_empty_dataset_spool(self, ray_session, tmp_path):
        import ray.data as rd

        from ebook_ocr_ray.state.spool import pin_reusable

        schema = pa.schema([("a", pa.int64())])
        r = pin_reusable(
            rd.from_arrow(schema.empty_table()), str(tmp_path), "rows",
            schema=schema,
        )
        assert r.n_rows == 0
        # NOTE: Ray's to_pandas on an empty dataset loses columns (the
        # quirk consumers already guard for) — assert emptiness + that
        # the ARROW schema survived, which is what downstream ops consume
        assert len(r.read().to_pandas()) == 0
        assert r.read().schema().names == ["a"]


class TestClaimSpoolTarget:
    def test_second_claimer_refused(self, tmp_path):
        """mkdir-free O_EXCL claim: exactly one of two racing runs may
        write a given spool target — the second gets the ValueError
        instead of silently appending a second copy of the rows."""
        import pytest

        from ebook_ocr_ray.state.spool import claim_spool_target

        target = str(tmp_path / "rows")
        claim_spool_target(target)               # first claim wins
        assert os.path.isdir(target)
        with pytest.raises(ValueError, match="already claimed"):
            claim_spool_target(target)           # concurrent claim loses

    def test_claim_file_outside_data_dir(self, tmp_path):
        from ebook_ocr_ray.state.spool import claim_spool_target

        target = str(tmp_path / "rows")
        claim_spool_target(target)
        assert os.listdir(target) == []           # data dir stays clean
        assert os.path.exists(target + ".claim")  # arbiter is a sibling


class TestSpoolEqualsMaterialize:
    """The done-contract for the round-4 spool work: every pipeline that
    grew a spool_dir option must be VALUE-identical across modes."""

    def test_minhash_clusters(self, ray_session, tmp_path):
        from ebook_ocr_ray.pipelines.neardup import minhash_clusters

        a = _sorted(minhash_clusters(SF_SMOKE).to_pandas(), ["doc_id"])
        b = _sorted(
            minhash_clusters(SF_SMOKE, spool_dir=str(tmp_path)).to_pandas(),
            ["doc_id"],
        )
        pd.testing.assert_frame_equal(a, b)
        assert os.path.isdir(tmp_path / "lsh_buckets")   # actually spooled

    def test_simhash_pairs(self, ray_session, tmp_path):
        from ebook_ocr_ray.pipelines.neardup import simhash_pairs

        a = _sorted(simhash_pairs(SF_SMOKE).to_pandas(), ["id_a", "id_b"])
        b = _sorted(
            simhash_pairs(SF_SMOKE, spool_dir=str(tmp_path)).to_pandas(),
            ["id_a", "id_b"],
        )
        pd.testing.assert_frame_equal(a, b)
        assert os.path.isdir(tmp_path / "simhash_buckets")

    def test_jaccard_dup_pairs(self, ray_session, tmp_path):
        from ebook_ocr_ray.pipelines.neardup import jaccard_dup_pairs

        a = _sorted(jaccard_dup_pairs(SF_SMOKE).to_pandas(), ["id_a", "id_b"])
        b = _sorted(
            jaccard_dup_pairs(SF_SMOKE, spool_dir=str(tmp_path)).to_pandas(),
            ["id_a", "id_b"],
        )
        pd.testing.assert_frame_equal(a, b)
        assert os.path.isdir(tmp_path / "jaccard_shingles")

    def test_quality_buckets(self, ray_session, tmp_path):
        from ebook_ocr_ray.pipelines.quality import quality_buckets

        a = _sorted(quality_buckets(SF_SMOKE).to_pandas(), ["doc_id"])
        b = _sorted(
            quality_buckets(SF_SMOKE, spool_dir=str(tmp_path)).to_pandas(),
            ["doc_id"],
        )
        pd.testing.assert_frame_equal(a, b)
        assert os.path.isdir(tmp_path / "scored_rows")


class TestClaimRelease:
    def test_claim_released_after_successful_spool(self, ray_session, tmp_path):
        """A completed pin_reusable must release its .claim sibling: the
        dirty-dir check owns reuse protection once data exists, and a
        user who cleans the data directory can re-run with the same
        path without hunting down the claim file."""
        import shutil

        import ray.data as rd

        from ebook_ocr_ray.state.spool import pin_reusable

        t = pa.table({"a": pa.array([1, 2], pa.int64())})
        pin_reusable(rd.from_arrow(t), str(tmp_path), "rows", schema=t.schema)
        assert not os.path.exists(str(tmp_path / "rows") + ".claim")
        # dirty dir still refused (data present, claim gone)
        with pytest.raises(ValueError, match="not empty"):
            pin_reusable(rd.from_arrow(t), str(tmp_path), "rows", schema=t.schema)
        # cleaning the data directory is now sufficient to re-run
        shutil.rmtree(tmp_path / "rows")
        r = pin_reusable(rd.from_arrow(t), str(tmp_path), "rows", schema=t.schema)
        assert r.n_rows == 2

    def test_crashed_claim_still_refused(self, tmp_path):
        """A claim WITHOUT data (crashed run before/mid-write) still
        refuses: its directory state is unknown."""
        from ebook_ocr_ray.state.spool import claim_spool_target

        claim_spool_target(str(tmp_path / "rows"))
        with pytest.raises(ValueError, match="claimed"):
            claim_spool_target(str(tmp_path / "rows"))
