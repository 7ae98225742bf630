"""The shared atomic-publish discipline (state/atomic.py): staging paths
are siblings even with trailing slashes, complete artifacts are never
deleted, crashed partials are moved aside, updates land all-or-nothing."""
import os

import pyarrow as pa

from ebook_ocr_ray.state.atomic import (
    publish_build,
    publish_into,
    replace_dir,
    staging_dir,
)


def _touch(path, name, content="x"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        f.write(content)


class TestStagingDir:
    def test_sibling_even_with_trailing_slash(self, tmp_path):
        final = str(tmp_path / "index") + os.sep       # trailing slash
        tmp = staging_dir(final)
        # the staging dir must NOT live inside the final dir: a recursive
        # reader of the index would otherwise see partial update files
        assert not os.path.normpath(tmp).startswith(
            os.path.normpath(final) + os.sep
        )
        assert os.path.isdir(tmp)
        assert os.path.basename(tmp).startswith("index.build.")

    def test_unique_per_call(self, tmp_path):
        final = str(tmp_path / "idx")
        assert staging_dir(final) != staging_dir(final)


class TestPublishBuild:
    def _complete(self, d):
        return os.path.exists(os.path.join(d, "_complete"))

    def test_plain_publish(self, tmp_path):
        final = str(tmp_path / "art")
        tmp = staging_dir(final)
        _touch(tmp, "_complete")
        assert publish_build(tmp, final, self._complete) is True
        assert self._complete(final)
        assert not os.path.exists(tmp)

    def test_never_deletes_complete_winner(self, tmp_path):
        final = str(tmp_path / "art")
        _touch(final, "_complete", "winner")
        tmp = staging_dir(final)
        _touch(tmp, "_complete", "loser")
        assert publish_build(tmp, final, self._complete) is False
        with open(os.path.join(final, "_complete")) as f:
            assert f.read() == "winner"               # untouched
        assert not os.path.exists(tmp)                 # loser discarded

    def test_markerless_partial_is_replaced(self, tmp_path):
        final = str(tmp_path / "art")
        _touch(final, "partial.parquet")               # crashed foreign build
        tmp = staging_dir(final)
        _touch(tmp, "_complete")
        assert publish_build(tmp, final, self._complete) is True
        assert self._complete(final)
        assert not os.path.exists(os.path.join(final, "partial.parquet"))
        # no trash residue
        parent = os.path.dirname(final)
        assert not [n for n in os.listdir(parent) if ".trash." in n]

    def test_trailing_slash_final_dir(self, tmp_path):
        final = str(tmp_path / "art") + os.sep
        tmp = staging_dir(final)
        _touch(tmp, "_complete")
        assert publish_build(tmp, final, self._complete) is True
        assert self._complete(str(tmp_path / "art"))


class TestPublishBuildRaces:
    def test_toctou_winner_moved_aside_is_restored(self, tmp_path):
        """If a concurrent winner publishes between the incompleteness
        check and our rename-aside, the aside copy must be restored, not
        deleted — 'a complete final dir is never deleted' must hold even
        through the race window."""
        import pytest

        final = str(tmp_path / "index")
        _touch(final, "data.parquet", "WINNER")
        tmp = staging_dir(final)
        _touch(tmp, "data.parquet", "LOSER")

        calls = []

        def pred(d):
            # False for the pre-check and the post-OSError check, True
            # from the trash inspection on: simulates a winner landing
            # in the check->rename window
            calls.append(d)
            return len(calls) >= 3

        assert publish_build(tmp, final, pred) is False
        with open(os.path.join(final, "data.parquet")) as f:
            assert f.read() == "WINNER"          # restored, not trashed
        assert not os.path.exists(tmp)
        # no trash dir leaked in the restored case
        parent = os.path.dirname(final)
        assert not [p for p in os.listdir(parent) if ".trash." in p]

    def test_exhausted_retries_raise_not_false(self, tmp_path, monkeypatch):
        """Persistent incomplete churn must raise — returning False would
        be indistinguishable from 'a complete winner exists' and callers
        would proceed against a crashed partial."""
        import pytest

        from ebook_ocr_ray.state import atomic

        final = str(tmp_path / "index")
        _touch(final, "partial.parquet")
        tmp = staging_dir(final)
        _touch(tmp, "data.parquet")

        def always_fail(src, dst):
            raise OSError("churn")

        monkeypatch.setattr(atomic.os, "rename", always_fail)
        with pytest.raises(RuntimeError, match="could not publish"):
            publish_build(tmp, final, lambda d: False)


class TestPublishInto:
    def test_all_or_nothing_subdir(self, tmp_path):
        parent = str(tmp_path / "index")
        tmp = staging_dir(parent, kind="update")
        _touch(tmp, "a.parquet")
        _touch(tmp, "b.parquet")
        dst = publish_into(tmp, parent, "upd-1")
        assert sorted(os.listdir(dst)) == ["a.parquet", "b.parquet"]
        assert not os.path.exists(tmp)

    def test_trailing_slash_parent(self, tmp_path):
        parent = str(tmp_path / "index") + os.sep
        tmp = staging_dir(parent, kind="update")
        _touch(tmp, "a.parquet")
        dst = publish_into(tmp, parent, "upd-2")
        assert os.path.dirname(dst) == str(tmp_path / "index")


class TestReplaceDir:
    def test_overwrites_previous_version(self, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        _touch(dst, "old.parquet")
        _touch(src, "new.parquet")
        replace_dir(src, dst)
        assert os.listdir(dst) == ["new.parquet"]
        assert not os.path.exists(src)


class TestIndexTrailingSlashIntegration:
    def test_update_with_trailing_slash_stays_atomic(self, ray_session, tmp_path):
        """Regression for the staging-inside-index hazard: an index_dir
        with a trailing slash must still stage updates as a SIBLING and
        publish them as one renamed subdir."""
        import ray.data as rd

        from ebook_ocr_ray.pipelines.incremental import dedup_incremental_ds

        idx = str(tmp_path / "idx") + os.sep
        snap = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["alpha", "beta"], pa.string()),
                }
            )
        )
        assert len(dedup_incremental_ds(snap, idx, update_index=True).to_pandas()) == 2
        inside = str(tmp_path / "idx")
        # everything under the index is the published update subdir —
        # no .update. staging residue leaked inside
        assert all(
            n.startswith("upd-") for n in os.listdir(inside)
        ), os.listdir(inside)
        out = dedup_incremental_ds(snap, idx).to_pandas()
        assert len(out) == 0                           # round trip holds
