"""Duplicated-substring span removal over the documents table — the
span-level member of the dedup family (exact / sequence / minhash /
simhash / jaccard / embedding operate at document granularity; this one
removes the duplicated REGIONS and keeps the rest of the document, the
"dedup inside documents" step of web-scale training-data pipelines, per
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better": drop every span that occurs verbatim more than once in the
corpus).

Semantics (frozen, mirrored exactly by the SQL oracle):

  * a span = k consecutive words (split on single spaces); docs shorter
    than k words carry no spans and pass through untouched,
  * a span is DUPLICATED when its total occurrence count across the
    corpus (occurrences, not distinct docs — a doc repeating its own
    span counts) is >= min_count,
  * every word position covered by any duplicated span is removed; the
    surviving words re-join with single spaces (word-split semantics
    are shared with textstats.word_shingles),
  * output = (doc_id, clean_text, n_removed).

Shape:

    pass 1: (span-hash) occurrence count — per-batch partial counts,
            ONE int64 hash shuffle, per-partition vectorized sum
            (the hash-count idiom measured fastest at every scale:
            BASELINE.md round-3 notes, 78s -> 9s)
    pass 2: per-doc coverage mask vs the duplicated-span set, rebuild

The duplicated-span set is bounded by the corpus's duplicated volume
(the same bound the LSH hot-bucket set lives under). It is broadcast
while small (`ray.put` once, numpy searchsorted per batch) and flips to
a keyed semi-join + per-doc covered-position collection beyond
HOT_SPAN_BROADCAST_MAX — the decontam/hot-bucket escape hatch, built in
rather than documented away.

Spans are keyed by the canonical stable 64-bit hash
(textstats.stable_hash64, masked to 63 bits for Arrow int64). The SQL
oracle counts by the span STRING (the jaccard_dup_pairs idiom): the
driver's value-hash equality is the proof hash collisions never fire at
oracle scale; at corpus scale a collision merges two span counts —
deterministic, and at ~n/2^63 odds per distinct span.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean

logger = logging.getLogger(__name__)

_MASK63 = (1 << 63) - 1

# Beyond this many duplicated spans the set stops being broadcast and
# pass 2 becomes a keyed semi-join (see module docstring).
HOT_SPAN_BROADCAST_MAX = 1_000_000


def _span_hashes(text: str | None, k: int) -> np.ndarray:
    """63-bit stable hashes of the k-word spans of ``text`` in position
    order (index i hashes words[i:i+k]). Shorter-than-k docs -> empty."""
    from ebook_ocr_ray.functions.textstats import stable_hash63

    words = (text or "").split(" ")
    n = len(words)
    if n < k:
        return np.empty(0, dtype=np.int64)
    return np.fromiter(
        (stable_hash63(" ".join(words[i : i + k])) for i in range(n - k + 1)),
        dtype=np.int64,
        count=n - k + 1,
    )


def _rebuild(words: list[str], starts: np.ndarray, k: int) -> tuple[str, int]:
    """Remove every word position covered by a span starting at any index
    in ``starts`` (0-based, unique). Interval union via a difference
    array + cumsum — O(n) regardless of span overlap."""
    n = len(words)
    diff = np.zeros(n + 1, dtype=np.int32)
    diff[starts] += 1  # starts are unique positions: plain fancy-index add
    np.add.at(diff, np.minimum(starts + k, n), -1)
    covered = np.cumsum(diff[:n]) > 0
    removed = int(covered.sum())
    if removed == 0:
        return " ".join(words), 0
    kept = [w for w, c in zip(words, covered) if not c]
    return " ".join(kept), removed


def _count_duplicated_spans(
    docs: ray.data.Dataset, k: int, min_count: int
) -> ray.data.Dataset:
    """(key,) rows for every span hash with total occurrences >= min_count.
    Per-batch partial counts -> one int64 hash shuffle -> vectorized
    per-partition sum (never a multi-column sort aggregate)."""
    from ebook_ocr_ray.groups import map_partitions_typed

    def count_partial(t: pa.Table) -> pa.Table:
        hs = [
            _span_hashes(txt, k)
            for txt in t["text"].to_pylist()
        ]
        allh = np.concatenate(hs) if hs else np.empty(0, dtype=np.int64)
        keys, counts = np.unique(allh, return_counts=True)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def hot_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("key", sort=False)["n"].sum().reset_index()
        out = tot.loc[tot["n"] >= min_count, ["key"]]
        return out.astype({"key": "int64"})

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return map_partitions_typed(
        docs.map_batches(count_partial, batch_format="pyarrow"),
        "key",
        hot_in_partition,
        schema=pa.schema([("key", pa.int64()), ("n", pa.int64())]),
        empty_fn=lambda: pd.DataFrame({"key": pd.Series(dtype="int64")}),
        num_partitions=min(max(8, cpus), 16),
    )


def _rebuild_batch_against(
    batch: pa.Table, hot_sorted: np.ndarray, k: int
) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    outs, removed = [], []
    for txt in batch["text"].to_pylist():
        words = (txt or "").split(" ")
        hs = _span_hashes(txt, k)
        if len(hs) == 0 or len(hot_sorted) == 0:
            outs.append(" ".join(words))
            removed.append(0)
            continue
        idx = np.searchsorted(hot_sorted, hs)
        idx[idx == len(hot_sorted)] = 0
        starts = np.nonzero(hot_sorted[idx] == hs)[0]
        clean, nrem = _rebuild(words, starts, k)
        outs.append(clean)
        removed.append(nrem)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "clean_text": pa.array(outs, pa.string()),
            "n_removed": pa.array(removed, pa.int64()),
        }
    )


def remove_duplicated_spans(
    sf_dir: str,
    k: int = 8,
    min_count: int = 2,
    hot_strategy: str = "auto",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(doc_id, clean_text, n_removed): every word covered by a k-word
    span occurring >= min_count times corpus-wide is removed. See module
    docstring for the frozen semantics and scale posture."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # pin=False: this docs is already a cheap column-pruned parquet
    # re-read; pinning would only copy it into the object store
    return remove_duplicated_spans_ds(
        docs, k, min_count, hot_strategy, num_partitions, pin=False
    )


def remove_duplicated_spans_ds(
    docs: ray.data.Dataset,
    k: int = 8,
    min_count: int = 2,
    hot_strategy: str = "auto",
    num_partitions: int = 8,
    pin: bool = True,
    spool_dir: str | None = None,
) -> ray.data.Dataset:
    """Dataset-level span removal over (doc_id, text) rows.

    ``docs`` is consumed by the count pass PLUS one (broadcast path) or
    two (join path) downstream passes; with ``pin`` (the default for
    arbitrary caller lineage) it executes ONCE — materialized, or
    spooled to scratch parquet when ``spool_dir`` is set (the
    pin_reusable discipline the near-dup bucket rows use). Callers whose
    docs is already a cheap re-readable source (a bare parquet read)
    pass ``pin=False``."""
    if hot_strategy not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown hot_strategy {hot_strategy!r}")
    if pin:
        from ebook_ocr_ray.state.spool import pin_reusable

        docs = pin_reusable(
            docs,
            spool_dir,
            "span_docs",
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        ).read()

    # two consumers of the count pass output (count + either broadcast
    # gather or join side) — the rows are slim (one int64 per duplicated
    # span, bounded by duplicated volume), so materializing them is the
    # same trade the near-dup bucket rows make
    hot_ds = _count_duplicated_spans(docs, k, min_count).materialize()
    n_hot = hot_ds.count()

    if n_hot == 0:
        return docs.map_batches(
            lambda t: _rebuild_batch_against(t, np.empty(0, dtype=np.int64), k),
            batch_format="pyarrow",
        )

    use_join = hot_strategy == "join" or (
        hot_strategy == "auto" and n_hot > HOT_SPAN_BROADCAST_MAX
    )
    if not use_join:
        hot_sorted = np.sort(
            hot_ds.to_pandas()["key"].to_numpy(dtype=np.int64, copy=False)
        )
        hot_ref = ray.put(hot_sorted)

        def rebuild(batch: pa.Table) -> pa.Table:
            return _rebuild_batch_against(batch, ray.get(hot_ref), k)

        return docs.map_batches(rebuild, batch_format="pyarrow")

    return _remove_spans_join(docs, hot_ds, k, num_partitions)


def _remove_spans_join(
    docs: ray.data.Dataset,
    hot_ds: ray.data.Dataset,
    k: int,
    num_partitions: int,
) -> ray.data.Dataset:
    """Keyed path for a duplicated-span set beyond broadcast size:
    positional span rows semi-join the hot set, covered start positions
    collect per doc as one record blob (one int64 shuffle key), and the
    blobs join back onto the documents for the rebuild."""
    from ebook_ocr_ray.joins import safe_join
    from ebook_ocr_ray.pipelines.neardup import _make_collect_records_agg

    def span_rows(t: pa.Table) -> pa.Table:
        ids_out, pos_out, key_out = [], [], []
        for d, txt in zip(
            t["doc_id"].to_numpy(zero_copy_only=False), t["text"].to_pylist()
        ):
            hs = _span_hashes(txt, k)
            if len(hs) == 0:
                continue
            ids_out.append(np.full(len(hs), d, dtype=np.int64))
            pos_out.append(np.arange(len(hs), dtype=np.int64))
            key_out.append(hs)
        if not ids_out:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ids_out), pa.int64()),
                "pos": pa.array(np.concatenate(pos_out), pa.int64()),
                "key": pa.array(np.concatenate(key_out), pa.int64()),
            }
        )

    spans = docs.map_batches(span_rows, batch_format="pyarrow")
    hot_renamed = hot_ds.map_batches(
        lambda t: t.rename_columns(["key_h"]), batch_format="pyarrow"
    )
    matched = safe_join(
        spans,
        hot_renamed,
        on="key",
        right_on="key_h",
        num_partitions=num_partitions,
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("pos", pa.int64()), ("key", pa.int64())]
        ),
        right_schema=pa.schema([("key_h", pa.int64())]),
    ).map_batches(
        lambda t: t.select(["doc_id", "pos"]), batch_format="pyarrow"
    )

    blobs = matched.groupby("doc_id").aggregate(
        _make_collect_records_agg(["pos"], alias="pos_blob")
    )

    def blob_renamed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id_b": t["doc_id"].cast(pa.int64()),
                "pos_blob": t["pos_blob"].cast(pa.large_binary()),
            }
        )

    joined = safe_join(
        docs,
        blobs.map_batches(blob_renamed, batch_format="pyarrow"),
        on="doc_id",
        right_on="doc_id_b",
        num_partitions=num_partitions,
        join_type="left_outer",
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        right_schema=pa.schema(
            [("doc_id_b", pa.int64()), ("pos_blob", pa.large_binary())]
        ),
    )

    def rebuild(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        outs, removed = [], []
        for txt, blob in zip(t["text"].to_pylist(), t["pos_blob"].to_pylist()):
            words = (txt or "").split(" ")
            if not blob:
                outs.append(" ".join(words))
                removed.append(0)
                continue
            starts = np.unique(np.frombuffer(blob, dtype="<u8").astype(np.int64))
            clean, nrem = _rebuild(words, starts, k)
            outs.append(clean)
            removed.append(nrem)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": pa.array(outs, pa.string()),
                "n_removed": pa.array(removed, pa.int64()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")
