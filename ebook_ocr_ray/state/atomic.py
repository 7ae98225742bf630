"""One atomic-publish discipline for every on-disk artifact.

Three codepaths used to hand-roll staging-dir + rename + race handling
(checkpoint wave partitions, the incremental dedup index, the IVF cell
layout); anything that must be correct-under-crash should share ONE
implementation. The contract, shared by all helpers:

- artifacts are built in a SIBLING staging directory (never inside the
  final path — a staging dir inside the final dir would let a concurrent
  reader's recursive file walk pick up partially written files);
- publish is a single ``os.rename`` (atomic on one filesystem), so a
  reader observes either the complete old state or the complete new
  state, never a half-write;
- a COMPLETE final directory is never deleted: ``publish_build`` checks
  the caller's completeness predicate before every destructive step and
  yields to a concurrent winner (deterministic builds make the winner's
  copy equivalent). Only a markerless partial (a crashed foreign build)
  is ever removed, and even that by atomic rename-ASIDE first, so no
  reader can observe a previously-complete path as missing.

Reference analog: the stage-directory IR economy of
/root/reference/src/layout/detector.py:168-205 (persist once, reuse),
hardened for concurrent builders and readers.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Callable


def _normalize(path: str) -> str:
    """Strip trailing separators: staging paths are derived as string
    siblings (``{final}.build.{token}``), and a trailing slash would land
    the staging dir INSIDE the final dir — visible to recursive readers
    before the publish rename."""
    return os.path.normpath(path)


def staging_dir(final_dir: str, kind: str = "build") -> str:
    """Create and return a fresh process-private sibling staging dir for
    ``final_dir`` (``{final}.{kind}.{token}``). The token is unique per
    call (not just per pid): repeated builds from one process must never
    collide, and a leftover dir from a crashed run is never reused —
    note that means a build that crashes BEFORE publish leaks its
    staging dir (intentional: leak, never delete another run's work)."""
    final_dir = _normalize(final_dir)
    tmp = f"{final_dir}.{kind}.{uuid.uuid4().hex[:12]}"
    os.makedirs(tmp)
    return tmp


def publish_build(
    tmp_dir: str, final_dir: str, is_complete: Callable[[str], bool]
) -> bool:
    """Publish ``tmp_dir`` as ``final_dir`` by atomic rename, with
    lost-race and crashed-partial handling. Returns True when OUR build
    became the final dir, False when a complete final dir already existed
    or a concurrent builder won (tmp is discarded either way). Raises
    RuntimeError when retries exhaust against persistent INCOMPLETE
    churn — False always means "a complete artifact exists", never
    "gave up".

    ``is_complete(final_dir)`` must check the build's completeness
    evidence (a marker file written into tmp BEFORE publish). Invariants:

    - a final dir satisfying ``is_complete`` is NEVER deleted or renamed
      away — concurrent readers keep a complete index at all times;
    - an incomplete final dir (crashed foreign partial) is renamed ASIDE
      atomically and only the aside copy is deleted — no delete-then-
      rename window in which the final path transiently disappears after
      having been complete.
    """
    final_dir = _normalize(final_dir)
    if is_complete(final_dir):
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return False
    for _ in range(3):
        try:
            os.rename(tmp_dir, final_dir)
            return True
        except OSError:
            # final_dir exists (or vanished mid-call): complete -> yield
            if is_complete(final_dir):
                shutil.rmtree(tmp_dir, ignore_errors=True)
                return False
            # markerless partial: move it aside atomically, then retry
            trash = f"{final_dir}.trash.{uuid.uuid4().hex[:12]}"
            try:
                os.rename(final_dir, trash)
            except OSError:
                continue  # someone else moved/published it — re-check
            # TOCTOU guard: between the incompleteness check above and
            # our rename, a concurrent winner may have published — in
            # which case we just moved a COMPLETE build aside. We own
            # ``trash`` exclusively (uuid name), so inspect it: a
            # complete build is restored; if yet another winner landed
            # in the meantime the trash copy is a redundant complete
            # duplicate and may be discarded. Leak-never-lose: when we
            # cannot prove a complete copy exists at final_dir, the
            # trash copy stays on disk rather than being deleted.
            if is_complete(trash):
                try:
                    os.rename(trash, final_dir)
                except OSError:
                    if is_complete(final_dir):
                        # another winner published meanwhile: the trash
                        # copy is a redundant complete duplicate
                        shutil.rmtree(trash, ignore_errors=True)
                        shutil.rmtree(tmp_dir, ignore_errors=True)
                        return False
                    # the restore lost to ANOTHER incomplete partial:
                    # returning False here would violate the contract
                    # ("False always means a complete artifact exists")
                    # while the only complete build sits in trash. Keep
                    # the trash copy (leak-never-lose) and retry the
                    # whole publish — our tmp build is equally complete.
                    continue
                shutil.rmtree(tmp_dir, ignore_errors=True)
                return False
            shutil.rmtree(trash, ignore_errors=True)
    # retries exhausted (pathological churn of incomplete builds): this
    # is an error, not a loser — returning False would be
    # indistinguishable from "a complete winner exists" and callers
    # would proceed against a crashed partial's files
    shutil.rmtree(tmp_dir, ignore_errors=True)
    raise RuntimeError(
        f"publish_build: could not publish into {final_dir!r} after 3 "
        "attempts (persistent churn of incomplete builds); the staging "
        "build was discarded and no complete artifact is known to exist"
    )


def publish_into(tmp_dir: str, parent_dir: str, name: str) -> str:
    """Publish ``tmp_dir`` INTO ``parent_dir`` as subdirectory ``name``
    by one atomic rename — the append-update shape (multi-file updates
    land all-or-nothing; readers listing the parent recursively see the
    whole update or none of it). Returns the published path."""
    parent_dir = _normalize(parent_dir)
    os.makedirs(parent_dir, exist_ok=True)
    dst = os.path.join(parent_dir, name)
    os.rename(tmp_dir, dst)
    return dst


def replace_dir(src: str, dst: str) -> None:
    """Overwrite-publish for manifest-gated artifacts (checkpoint wave
    partitions): remove any previous version of ``dst`` and atomically
    rename ``src`` in. Safe ONLY where a separate record (the manifest)
    is the source of truth for completeness — readers of such artifacts
    must consult the record, not the directory's existence."""
    shutil.rmtree(dst, ignore_errors=True)
    os.replace(src, dst)
