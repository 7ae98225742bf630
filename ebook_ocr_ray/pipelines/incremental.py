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
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean

_MASK63 = (1 << 63) - 1
INDEX_BROADCAST_MAX = 50_000_000          # int64 keys: ~400 MB on a worker


def _text_keys(texts: list) -> np.ndarray:
    from ebook_ocr_ray.functions.textstats import stable_hash64

    return np.fromiter(
        (stable_hash64(t or "") & _MASK63 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )


def _snapshot_survivors(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(key, doc_id) — min doc_id per text key within the snapshot (the
    keyed survivor aggregate, no driver state)."""
    from ebook_ocr_ray.groups import map_partitions_typed

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": _text_keys(t["text"].to_pylist()),
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
        num_partitions=4,
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
    atomic publish. See module docstring for semantics."""
    survivors = _snapshot_survivors(snapshot).materialize()  # slim int rows

    index_files = (
        sorted(
            os.path.join(index_dir, f)
            for f in os.listdir(index_dir)
            if f.endswith(".parquet")
        )
        if index_dir is not None and os.path.isdir(index_dir)
        else []
    )
    if index_files:
        # explicit file list: the index dir also holds the _complete
        # marker, which a bare directory read would choke on
        old = read_parquet_clean(index_files, columns=["key"])
        n_old = old.count()
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

    # survivors' full rows: broadcast the surviving doc_id set (bounded
    # by snapshot novelty) and filter the snapshot stream
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
    """Append the fresh keys to the index by atomic rename: new files are
    staged in a process-private dir and moved in with unique names; a
    crash mid-update leaves the index exactly as it was."""
    import uuid

    # a UNIQUE token per update, not just the pid: two updates from the
    # same process would otherwise collide on the target filename and
    # os.rename would silently REPLACE the earlier update's keys
    token = uuid.uuid4().hex[:12]
    tmp = f"{index_dir}.update.{token}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    fresh.map_batches(
        lambda t: t.select(["key"]), batch_format="pyarrow"
    ).write_parquet(tmp)
    os.makedirs(index_dir, exist_ok=True)
    for i, name in enumerate(sorted(os.listdir(tmp))):
        if name.endswith(".parquet"):
            os.rename(
                os.path.join(tmp, name),
                os.path.join(index_dir, f"upd-{token}-{i}.parquet"),
            )
    shutil.rmtree(tmp, ignore_errors=True)


# Snapshot membership for the self-contained query: every third doc is
# "new", the rest are the already-ingested history.
SNAPSHOT_MOD = 3


def dedup_incremental(sf_dir: str, index_dir: str | None = None) -> ray.data.Dataset:
    """Self-contained query wrapper: docs with doc_id % SNAPSHOT_MOD == 0
    form the NEW snapshot; the rest are the already-ingested history,
    whose index is built (via the same survivor pass) into a scratch dir
    and then consulted. Output: the snapshot docs that are genuinely new
    (text never seen in history, first-wins within the snapshot)."""
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

    old = docs.map_batches(_part(False), batch_format="pyarrow")
    new = docs.map_batches(_part(True), batch_format="pyarrow")

    if index_dir is None:
        st = os.stat(f"{sf_dir}/documents.parquet")
        key = hashlib.md5(
            f"{sf_dir}|{SNAPSHOT_MOD}|{ENGINE_VERSION}|{st.st_size}|{st.st_mtime_ns}"
            .encode()
        ).hexdigest()[:16]
        index_dir = f"/tmp/dedup_index_{key}"
    marker = os.path.join(index_dir, "_complete.json")
    if not os.path.exists(marker):
        # build the history index once (atomic publish, IVF-cache style)
        tmp = f"{index_dir}.build.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        _snapshot_survivors(old).map_batches(
            lambda t: t.select(["key"]), batch_format="pyarrow"
        ).write_parquet(tmp)
        with open(os.path.join(tmp, "_complete.json"), "w") as f:
            json.dump({"mod": SNAPSHOT_MOD}, f)
        if not os.path.exists(marker):
            shutil.rmtree(index_dir, ignore_errors=True)
            try:
                os.rename(tmp, index_dir)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
        else:
            shutil.rmtree(tmp, ignore_errors=True)

    return dedup_incremental_ds(new, index_dir)
