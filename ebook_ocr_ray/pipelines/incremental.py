"""Incremental snapshot dedup: filter a NEW crawl snapshot against a
PERSISTED hash index of everything already ingested — the recrawl
economy at corpus scale (a fresh CommonCrawl snapshot is mostly pages
the corpus already holds; re-deduping the full history per snapshot is
a whole-corpus pass you only want to pay once). The checkpoint /
IVF-cache discipline applied to dedup state: the index is a parquet
directory of slim (key,) rows, updated by ATOMIC rename per batch-run,
so a crashed update can never corrupt or double it.

Frozen semantics (mirrored by the SQL oracle):

  * key = canonical 63-bit stable hash of the document text,
  * a new-snapshot doc survives iff its key is NOT in the index AND it
    is the min-doc_id holder of its key within the snapshot itself
    (first-wins intra-snapshot dedup, the dedup_exact_docs rule),
  * the updated index = old index UNION the snapshot survivors' keys.

Scale shape: the index is read column-pruned and met by broadcast while
it fits (`ray.put` of a sorted int64 array) or by a keyed ANTI join
beyond INDEX_BROADCAST_MAX (the hot-bucket/semi-join escape hatch, with
the survivor pass unchanged); the snapshot side streams. The index
UPDATE writes only the new keys' rows (plus the prior files, linked by
the atomic publish) — no rewrite of history.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean

_MASK63 = (1 << 63) - 1
INDEX_BROADCAST_MAX = 50_000_000          # int64 keys: ~400 MB on a worker
# Surviving (key, doc_id) rows above this take a keyed join back onto the
# snapshot instead of a driver broadcast (first ingest of a mostly-novel
# snapshot makes survivors ~ the snapshot itself).
SURVIVOR_BROADCAST_MAX = 10_000_000

# NULL text hashes as a private sentinel, DISTINCT from the empty string
# (SQL NULL never equals '' either). Caveat vs the oracle's pure-SQL NULL
# semantics: GROUP BY pools NULLs into one group (matching the sentinel)
# but a JOIN predicate never matches NULL against history — a NULL-text
# snapshot doc therefore always survives in SQL while the sentinel key CAN
# match a NULL-text history doc here. The oracle corpus is NULL-free; on
# real corpora the sentinel behavior (NULL texts dedup against each
# other) is the useful one.
_NULL_TEXT = "\x00text-null"


def _text_keys(texts: list) -> np.ndarray:
    from ebook_ocr_ray.functions.textstats import stable_hash63

    return np.fromiter(
        (
            stable_hash63(_NULL_TEXT if t is None else t)
            for t in texts
        ),
        dtype=np.int64,
        count=len(texts),
    )


def _snapshot_survivors(
    docs: ray.data.Dataset, key_fn=None, num_partitions: int = 4
) -> ray.data.Dataset:
    """(key, doc_id) — min doc_id per text key within the snapshot (the
    keyed survivor aggregate, no driver state). ``key_fn`` maps a list of
    texts to int63 keys; default is the byte-exact ``_text_keys``
    (callers can pass a normalized-text key, e.g. the fuzzy-dedup recipe,
    to get fuzzy survivor groups from the same machinery).
    ``num_partitions`` sizes the keyed reduce — forward the caller's
    knob: each partition lands in ONE task as one in-memory frame, so a
    mostly-novel billion-doc snapshot needs far more than the
    bench-scale default."""
    from ebook_ocr_ray.groups import map_partitions_typed

    key_fn = key_fn or _text_keys

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": key_fn(t["text"].to_pylist()),
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby("key", sort=False)["doc_id"].min().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(
            None
        )

    def reduce_partition(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("key", sort=False)["doc_id"].min().reset_index()
        return out.astype({"key": "int64", "doc_id": "int64"})

    return map_partitions_typed(
        docs.map_batches(partial, batch_format="pyarrow"),
        "key",
        reduce_partition,
        schema=pa.schema([("key", pa.int64()), ("doc_id", pa.int64())]),
        empty_fn=lambda: pa.schema(
            [("key", pa.int64()), ("doc_id", pa.int64())]
        ).empty_table(),
        num_partitions=num_partitions,
    )


def dedup_incremental_ds(
    snapshot: ray.data.Dataset,
    index_dir: str | None,
    update_index: bool = False,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Surviving (doc_id, text) rows of the snapshot vs the persisted
    index at ``index_dir`` (None or missing dir = empty history). With
    ``update_index`` the survivors' keys are appended to the index by
    atomic publish. See module docstring for semantics.

    Durability caveat with ``update_index=True``: the index is published
    EAGERLY here while the survivor ROWS are returned lazily — a caller
    that crashes before persisting them has lost those documents for
    good (their keys already filter every future run). For crash-safe
    end-to-end ingestion use ``ingest_snapshot`` (data first, index
    second, both idempotent)."""
    if update_index and index_dir is None:
        raise ValueError(
            "update_index=True requires index_dir (a None index_dir would "
            "silently accumulate nothing and re-admit every text forever)"
        )
    survivors = _snapshot_survivors(
        snapshot, num_partitions=num_partitions
    ).materialize()                                          # slim int rows

    index_files = _index_files(index_dir)
    if index_files:
        # explicit file list: the index dir also holds non-parquet
        # markers, which a bare directory read would choke on
        old = read_parquet_clean(index_files, columns=["key"])
        # row count from the parquet FOOTERS — a Dataset.count() here
        # would execute a full distributed read just to pick a branch
        import pyarrow.parquet as pq

        n_old = sum(pq.read_metadata(f).num_rows for f in index_files)
        if n_old > INDEX_BROADCAST_MAX:
            fresh = _anti_join_index(survivors, old, num_partitions)
        else:
            old_sorted = np.sort(
                old.to_pandas()["key"].to_numpy(dtype=np.int64, copy=False)
            )
            old_ref = ray.put(old_sorted)

            def not_seen(t: pa.Table) -> pa.Table:
                idx_arr = ray.get(old_ref)
                k = t["key"].to_numpy(zero_copy_only=False)
                if len(idx_arr) == 0:
                    return t
                pos = np.searchsorted(idx_arr, k)
                pos[pos == len(idx_arr)] = 0
                return t.filter(pa.array(idx_arr[pos] != k))

            fresh = survivors.map_batches(not_seen, batch_format="pyarrow")
    else:
        fresh = survivors
    fresh = fresh.materialize()                    # keys reused for update

    if update_index and index_dir is not None:
        _publish_index_update(fresh, index_dir)

    # survivors' full rows: broadcast the surviving doc_id set while it
    # fits (first ingest of a mostly-novel snapshot makes survivors ~ the
    # snapshot, so this gather is BOUNDED and flips to a keyed join)
    if fresh.count() > SURVIVOR_BROADCAST_MAX:
        from ebook_ocr_ray.joins import safe_join

        fresh_ids = fresh.map_batches(
            lambda t: pa.table({"fid": t["doc_id"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        snap_schema = pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string())]
        )
        joined = safe_join(
            snapshot,
            fresh_ids,
            on="doc_id",
            right_on="fid",
            num_partitions=num_partitions,
            left_schema=snap_schema,
            right_schema=pa.schema([("fid", pa.int64())]),
        )
        return joined.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        )

    fdf = fresh.to_pandas()
    keep_ids = (
        np.sort(fdf["doc_id"].to_numpy(dtype=np.int64, copy=False))
        if "doc_id" in fdf.columns              # empty frames lose columns
        else np.empty(0, dtype=np.int64)
    )
    keep_ref = ray.put(keep_ids)

    def keep_rows(t: pa.Table) -> pa.Table:
        ids = ray.get(keep_ref)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return t.slice(0, 0)
        pos = np.searchsorted(ids, d)
        pos[pos == len(ids)] = 0
        return t.filter(pa.array(ids[pos] == d))

    return snapshot.map_batches(keep_rows, batch_format="pyarrow")


def ingest_snapshot(
    snapshot: ray.data.Dataset,
    index_dir: str,
    out_dir: str,
    num_partitions: int = 8,
) -> int:
    """Crash-safe end-to-end ingestion: DATA FIRST, INDEX SECOND.

    ``dedup_incremental_ds(update_index=True)`` publishes the index
    eagerly while returning the survivor rows lazily, so a crash between
    the index publish and the caller persisting the rows loses those
    documents forever. This helper fixes the ordering:

      1. the survivors' full (doc_id, text) rows publish to ``out_dir``
         atomically (with a completeness marker);
      2. only THEN the index update, with keys re-derived from the
         PUBLISHED rows, under an update-subdir name fingerprinted from
         the published files — so a re-run after a crash between the two
         steps skips step 1 (complete artifact wins, publish_build
         contract) and completes step 2 idempotently (the deterministic
         name either already exists or lands exactly once).

    Returns the number of ingested rows."""
    import hashlib
    import shutil

    from ebook_ocr_ray.reads import parquet_num_rows
    from ebook_ocr_ray.state.atomic import publish_build, publish_into, staging_dir

    marker = "_INGEST_COMPLETE"
    out_dir = out_dir.rstrip("/")

    def is_complete(d: str) -> bool:
        return os.path.exists(os.path.join(d, marker))

    if not is_complete(out_dir):
        rows = dedup_incremental_ds(
            snapshot, index_dir, update_index=False, num_partitions=num_partitions
        )
        tmp = staging_dir(out_dir, kind="ingest")
        rows.write_parquet(tmp)
        with open(os.path.join(tmp, marker), "w", encoding="utf-8") as f:
            f.write("complete\n")
        publish_build(tmp, out_dir, is_complete)

    n = parquet_num_rows(out_dir)
    if n == 0:
        return 0                       # nothing new: no index keys to add

    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(out_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    fp = hashlib.md5(
        json.dumps(
            [(os.path.relpath(f, out_dir), os.path.getsize(f)) for f in files]
        ).encode("utf-8")
    ).hexdigest()[:12]
    upd_name = f"ing-{fp}"
    if not os.path.isdir(os.path.join(index_dir, upd_name)):
        def key_rows(t: pa.Table) -> pa.Table:
            return pa.table(
                {"key": pa.array(_text_keys(t["text"].to_pylist()), pa.int64())}
            )

        tmp2 = staging_dir(index_dir, kind="update")
        read_parquet_clean(files, columns=["text"]).map_batches(
            key_rows, batch_format="pyarrow"
        ).write_parquet(tmp2)
        try:
            publish_into(tmp2, index_dir, upd_name)
        except OSError:
            # lost the race to a concurrent/idempotent re-publish of the
            # SAME fingerprint: the update is in place, discard ours
            shutil.rmtree(tmp2, ignore_errors=True)
    return n


def _index_files(index_dir: str | None) -> list[str]:
    """All parquet files of the index, RECURSIVELY: updates publish as
    atomically-renamed subdirectories (see _publish_index_update)."""
    if index_dir is None or not os.path.isdir(index_dir):
        return []
    out: list[str] = []
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _anti_join_index(
    survivors: ray.data.Dataset, old: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Keyed ANTI join for an index beyond broadcast size: left_outer on
    the key, keep rows whose index side is null."""
    from ebook_ocr_ray.joins import safe_join

    marked = old.map_batches(
        lambda t: pa.table(
            {
                "key_i": t["key"].cast(pa.int64()),
                "seen": pa.array(np.ones(len(t), np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = safe_join(
        survivors,
        marked,
        on="key",
        right_on="key_i",
        num_partitions=num_partitions,
        join_type="left_outer",
        left_schema=pa.schema([("key", pa.int64()), ("doc_id", pa.int64())]),
        right_schema=pa.schema([("key_i", pa.int64()), ("seen", pa.int64())]),
    )
    return joined.map_batches(
        lambda t: t.filter(pa.compute.is_null(t["seen"])).select(
            ["key", "doc_id"]
        ),
        batch_format="pyarrow",
    )


def _publish_index_update(fresh: ray.data.Dataset, index_dir: str) -> None:
    """Append the fresh keys to the index by ONE atomic rename: the
    update's files are staged in a process-private SIBLING dir which is
    then renamed INTO the index as a subdirectory (readers list parquet
    files recursively) — multi-file updates publish all-or-nothing, so a
    crash mid-update leaves the index exactly as it was. staging_dir
    normalizes the path first: a trailing slash on index_dir would
    otherwise land the staging dir INSIDE the index, where a concurrent
    reader's recursive walk could pick up partially written files."""
    from ebook_ocr_ray.state.atomic import publish_into, staging_dir

    tmp = staging_dir(index_dir, kind="update")
    token = tmp.rsplit(".", 1)[1]
    fresh.map_batches(
        lambda t: t.select(["key"]), batch_format="pyarrow"
    ).write_parquet(tmp)
    publish_into(tmp, index_dir, f"upd-{token}")


# Snapshot membership for the self-contained query: every third doc is
# "new", the rest are the already-ingested history.
SNAPSHOT_MOD = 3


def dedup_incremental(sf_dir: str, index_dir: str | None = None) -> ray.data.Dataset:
    """Self-contained query wrapper: docs with doc_id % SNAPSHOT_MOD == 0
    form the NEW snapshot; the rest are the already-ingested history,
    whose index is built (via the same survivor pass) into a scratch dir
    and then consulted. Output: the snapshot docs that are genuinely new
    (text never seen in history, first-wins within the snapshot).

    ``index_dir``: a CALLER-OWNED existing index to consult AS-IS
    (e.g. one accumulated via ``dedup_incremental_ds(update_index=True)``)
    — the wrapper never deletes, rebuilds or writes into it. The
    demo history index is only built when index_dir is None, into a
    content-fingerprinted private scratch (atomic publish)."""
    import hashlib

    from ebook_ocr_ray.config import ENGINE_VERSION

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _part(is_new: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % SNAPSHOT_MOD == 0) == is_new
            return t.filter(pa.array(mask))

        return f

    new = docs.map_batches(_part(True), batch_format="pyarrow")
    if index_dir is not None:
        # user-owned index: consult only, never touch
        return dedup_incremental_ds(new, index_dir)

    old = docs.map_batches(_part(False), batch_format="pyarrow")
    st = os.stat(f"{sf_dir}/documents.parquet")
    key = hashlib.md5(
        f"{sf_dir}|{SNAPSHOT_MOD}|{ENGINE_VERSION}|{st.st_size}|{st.st_mtime_ns}"
        .encode()
    ).hexdigest()[:16]
    index_dir = f"/tmp/dedup_index_{key}"

    def _complete(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_complete.json"))

    if not _complete(index_dir):
        # build the history index once; publish_build never deletes a
        # complete index (a concurrent winner's copy is kept — the build
        # is deterministic), and a markerless crashed partial is renamed
        # aside atomically, so a concurrent reader never sees the index
        # path transiently missing after it was complete
        from ebook_ocr_ray.state.atomic import publish_build, staging_dir

        tmp = staging_dir(index_dir)
        _snapshot_survivors(old).map_batches(
            lambda t: t.select(["key"]), batch_format="pyarrow"
        ).write_parquet(tmp)
        with open(os.path.join(tmp, "_complete.json"), "w") as f:
            json.dump({"mod": SNAPSHOT_MOD}, f)
        publish_build(tmp, index_dir, _complete)

    return dedup_incremental_ds(new, index_dir)
