"""Similarity search over the embeddings table.

- ``knn_brute``: exact top-k cosine — broadcast query matrix via ray.put,
  per-batch numpy matmul producing per-batch partial top-k, then a tiny
  per-query reduce. The scan streams; only (q x k) candidate rows per
  batch ever leave a worker.
- ``knn_ivf``: IVF-style scale path — deterministic Lloyd-refined
  centroids, vectors bucketed by nearest centroid, queries probe the
  nprobe nearest buckets only.
- ``embedding_dup_pairs``: near-duplicate pairs by cosine within a
  blocking key (label), the embedding-space analog of LSH-blocked dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean


def _partial_topk_select(row: np.ndarray, cand_ids: np.ndarray, k: int):
    """EXACT per-batch top-k by (sim desc, nid asc): a bare argpartition on
    sim can drop a tied candidate the deterministic final reduce would
    prefer by lower id, desyncing from the SQL oracle on tied sims
    (duplicate vectors). -inf rows (masked self-matches) never emit."""
    finite = np.isfinite(row)
    if not finite.any():
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    idx = np.nonzero(finite)[0]
    order = idx[np.lexsort((cand_ids[idx], -row[idx]))][: k]
    return cand_ids[order], row[order]


def _final_topk(k: int):
    """Shared deterministic per-query reduce: (sim desc, nid asc), rank."""

    def fn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "nid"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {"qid": g.qid, "nid": g.nid, "rank": np.arange(1, len(g) + 1, dtype=np.int64)}
        )

    return fn


_PARTIAL_SCHEMA = pa.schema(
    [("qid", pa.int64()), ("nid", pa.int64()), ("sim", pa.float64())]
)

# final knn result shape — returned typed-empty when the query filter
# selects no rows (offset/hashed id spaces, empty tables)
_KNN_SCHEMA = pa.schema(
    [("qid", pa.int64()), ("nid", pa.int64()), ("rank", pa.int64())]
)


def _reduce_topk(partials: "ray.data.Dataset", n_queries: int, k: int) -> "ray.data.Dataset":
    """Per-query reduce over the partial top-k rows. The key space is tiny
    (one group per query), so this is a hash-partitioned typed group
    apply, not a sort shuffle (see groups.map_groups_typed)."""
    from ebook_ocr_ray.groups import map_groups_typed

    return map_groups_typed(
        partials,
        "qid",
        _final_topk(k),
        schema=_PARTIAL_SCHEMA,
        empty_fn=lambda: pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("qid", "nid", "rank")}
        ),
        num_partitions=max(1, min(n_queries, 8)),
    )


def _load_training_sample(
    sf_dir: str, cap: int = 4096
) -> tuple[np.ndarray, np.ndarray]:
    """Bounded, deterministic training sample for centroid fitting: keep
    rows whose Knuth-multiplicative-hashed vec_id falls in a 1/step
    window, sized from the table's metadata row count, so at most ~``cap``
    vectors ever reach the driver no matter the corpus size (the at-scale
    replacement for loading the whole table). Hashing (not ``id % step``)
    keeps the sample unbiased and non-empty for ANY id space — sparse,
    offset, or structured ids included. The filter runs distributed
    inside map_batches."""
    from ebook_ocr_ray.reads import parquet_num_rows

    n_rows = parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    step = max(1, n_rows // cap)

    def hash_stride(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return batch.filter(pa.array(h % np.uint64(step) == 0))

    t = (
        read_parquet_clean(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(hash_stride, batch_format="pyarrow")
        .to_pandas()
    )
    if t.empty:  # pathological id space: fall back to a bounded head read
        t = (
            read_parquet_clean(
                f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
            )
            .limit(cap)
            .to_pandas()
        )
    t = t.sort_values("vec_id")
    return t["vec_id"].to_numpy(), np.asarray(t["embedding"].to_list(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embedding_matrix(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """C-speed decode of a list<float> column into an (n, d) float64
    matrix: flatten the Arrow child buffer and reshape — replaces the
    per-row Python decode of ``to_pylist()`` (noise at 2k vectors, THE
    stage cost at 10^9). Zero-copy from the child buffer up to the dtype
    cast; ragged or null-bearing columns (never produced by the embedding
    tables) fall back to the row-wise path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if col.null_count == 0:
        if pa.types.is_fixed_size_list(col.type):
            d = col.type.list_size
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64, copy=False).reshape(n, d)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            offsets = col.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offsets)
            if widths.size and (widths == widths[0]).all():
                d = int(widths[0])
                flat = col.flatten().to_numpy(zero_copy_only=False)
                return flat.astype(np.float64, copy=False).reshape(n, d)
    return np.asarray(col.to_pylist(), dtype=np.float64)


def knn_brute(sf_dir: str, n_queries: int = 10, k: int = 5) -> ray.data.Dataset:
    """Exact cosine top-k for the first ``n_queries`` vec_ids against the
    whole table. Returns (qid, nid, rank) — ints only, so the oracle
    comparison is immune to float formatting."""
    qt = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", filters=[("vec_id", "<", n_queries)]
    )
    if qt.empty:
        # offset/hashed id spaces (or an empty table) select no query
        # rows: an empty (qid, nid, rank) result, not an AxisError from
        # normalizing a 0-row matrix
        return ray.data.from_arrow(_KNN_SCHEMA.empty_table())
    q_ids = qt.vec_id.to_numpy()
    q_mat = _normalize(np.asarray(qt.embedding.to_list(), dtype=np.float64))
    query_ref = ray.put((q_ids, q_mat))

    class PartialTopK:
        def __init__(self, ref, k):
            self.q_ids, self.q_mat = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            mat = _normalize(embedding_matrix(batch["embedding"]))
            sims = self.q_mat @ mat.T                      # (Q, B)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.q_ids):
                row = sims[qi].copy()
                row[ids == qid] = -np.inf                  # exclude self
                nids, svals = _partial_topk_select(row, ids, self.k)
                out_q.extend([qid] * len(nids))
                out_n.extend(nids.tolist())
                out_s.extend(svals.tolist())
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    "nid": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partials = emb.map_batches(
        PartialTopK,
        fn_constructor_args=(query_ref, k),
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=(1, 8),
    )
    return _reduce_topk(partials, n_queries, k)


def _train_centroids(
    sf_dir: str, n_cells: int, lloyd_iters: int
) -> np.ndarray:
    """Deterministic, BOUNDED centroid fit: a stride-sampled training set
    (<= ~4096 vectors regardless of table size) seeds the first
    ``n_cells`` vectors and refines with ``lloyd_iters`` Lloyd steps
    driver-side (centroids are tiny)."""
    _, emb = _load_training_sample(sf_dir)
    u = _normalize(emb)
    centroids = u[:n_cells].copy()
    for _ in range(lloyd_iters):
        assign = np.argmax(u @ centroids.T, axis=1)
        for c in range(n_cells):
            members = u[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def build_ivf_index(
    sf_dir: str,
    index_dir: str,
    n_cells: int = 16,
    lloyd_iters: int = 2,
) -> np.ndarray:
    """Build (or reuse) the cell-partitioned IVF layout: a distributed
    assignment pass tags every vector with its nearest-centroid cell and
    the table streams into parquet hive-partitioned by ``cell`` — one
    directory per inverted list, so probing can SKIP (n_cells - nprobe) /
    n_cells of the IO at the read, not just the compute. Centroids are
    persisted next to the partitions; an existing complete index is
    reused (the reference's pickle-cache economy — work avoided, not
    recomputed; src/layout/detector.py:168-205). Returns the centroids.

    ``cell_id`` is duplicated as a data column because the hive write
    drops partition columns from the files, and probing needs the cell
    per row (each query masks to its OWN nprobe cells inside the shared
    union read)."""
    import logging
    import os

    logger = logging.getLogger(__name__)
    cent_path = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(cent_path):
        logger.info("ivf index cache hit: %s", index_dir)
        return np.load(cent_path)

    centroids = _train_centroids(sf_dir, n_cells, lloyd_iters)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        mat = _normalize(embedding_matrix(batch["embedding"]))
        cells = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
        return (
            batch.select(["vec_id", "embedding"])
            .append_column("cell_id", pa.array(cells, pa.int32()))
            .append_column("cell", pa.array(cells, pa.int32()))
        )

    # build into a process-private staging dir, then publish by ATOMIC
    # rename: write_parquet APPENDS into an existing layout (Ray 2.49
    # SaveMode.APPEND), so a crashed or concurrent build writing straight
    # into index_dir would silently double every probed cell. The shared
    # publish_build helper carries the race discipline: a complete index
    # (centroids.npy present) is never deleted, a crashed markerless
    # partial is renamed aside atomically, and a lost race yields to the
    # winner's copy (the build is deterministic, so copies are equal).
    from ebook_ocr_ray.state.atomic import publish_build, staging_dir

    tmp_dir = staging_dir(index_dir)
    read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(assign, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(tmp_dir, "centroids.npy"), centroids)

    def _complete(d: str) -> bool:
        return os.path.exists(os.path.join(d, "centroids.npy"))

    if not publish_build(tmp_dir, index_dir, _complete):
        return np.load(cent_path)        # a concurrent build won — use it
    return centroids


def default_ivf_index_dir(sf_dir: str, n_cells: int, lloyd_iters: int) -> str:
    """Deterministic scratch location for the IVF layout of one table:
    build is deterministic, so a same-key index can always be reused.
    The engine version AND a content fingerprint of the source file
    (size + mtime) are part of the key — a semantics change or a
    regenerated embeddings table invalidates the cache exactly like the
    checkpoint manifest's version hash (no stale index is ever served)."""
    import hashlib
    import os

    from ebook_ocr_ray.config import ENGINE_VERSION

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    key = hashlib.md5(
        f"{sf_dir}|{n_cells}|{lloyd_iters}|{ENGINE_VERSION}"
        f"|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    return f"/tmp/ivf_index_{key}"


def knn_ivf(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 2,
    index_dir: str | None = None,
) -> ray.data.Dataset:
    """IVF approximate top-k with TRUE partition pruning: vectors live in
    a cell-partitioned parquet layout (``build_ivf_index``), and probing
    reads ONLY the union of the queries' nprobe cells — the other
    inverted lists are never opened. Rows-read vs table size is logged
    per run. Training, assignment and probing are all deterministic, so
    results are identical to the former scan-everything variant."""
    import glob
    import logging
    import os

    logger = logging.getLogger(__name__)
    index_dir = index_dir or default_ivf_index_dir(sf_dir, n_cells, lloyd_iters)
    centroids = build_ivf_index(sf_dir, index_dir, n_cells, lloyd_iters)

    qt = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", filters=[("vec_id", "<", n_queries)]
    ).sort_values("vec_id")
    if qt.empty:
        return ray.data.from_arrow(_KNN_SCHEMA.empty_table())
    q_ids = qt.vec_id.to_numpy()
    q_mat = _normalize(np.asarray(qt.embedding.to_list(), dtype=np.float64))
    q_cells = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    probe_ref = ray.put((q_ids, q_mat, q_cells))

    # partition pruning at the read: only the probed cells' directories
    # are listed (a cell no vector landed in has no directory)
    probed = sorted({int(c) for row in q_cells for c in row})
    cell_dirs = [
        d for c in probed for d in [os.path.join(index_dir, f"cell={c}")]
        if os.path.isdir(d)
    ]

    import pyarrow.parquet as pq

    cell_files = sorted(
        f for d in cell_dirs for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    from ebook_ocr_ray.reads import parquet_num_rows

    rows_total = parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    rows_read = sum(pq.read_metadata(f).num_rows for f in cell_files)
    logger.info(
        "ivf partition pruning: reading %d of %d rows (%.1f%%) from %d of %d "
        "cells (nprobe=%d, union over %d queries)",
        rows_read, rows_total, 100.0 * rows_read / max(1, rows_total),
        len(cell_dirs), n_cells, nprobe, len(q_ids),
    )

    class CellTopK:
        def __init__(self, probe_ref, k):
            self.q_ids, self.q_mat, self.q_cells = ray.get(probe_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            mat = _normalize(embedding_matrix(batch["embedding"]))
            cells = batch["cell_id"].to_numpy(zero_copy_only=False)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.q_ids):
                mask = np.isin(cells, self.q_cells[qi]) & (ids != qid)
                if not mask.any():
                    continue
                row = self.q_mat[qi] @ mat[mask].T
                cand_ids = ids[mask]
                nids, svals = _partial_topk_select(row, cand_ids, self.k)
                out_q.extend([qid] * len(nids))
                out_n.extend(nids.tolist())
                out_s.extend(svals.tolist())
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    "nid": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    if not cell_files:  # no probed cell has any vector: empty result
        partials = ray.data.from_arrow(_PARTIAL_SCHEMA.empty_table())
    else:
        emb_ds = read_parquet_clean(
            cell_files, columns=["vec_id", "embedding", "cell_id"]
        )
        partials = emb_ds.map_batches(
            CellTopK,
            fn_constructor_args=(probe_ref, k),
            batch_format="pyarrow",
            batch_size=2048,
            concurrency=(1, 8),
        )
    return _reduce_topk(partials, n_queries, k)


# Ceiling on the all-pairs region within one label block — the same
# bounded-recall contract as neardup.MAX_BUCKET: a hot label (at web
# scale: "en", or an empty-string label) otherwise goes O(n^2) in both
# compute and pair volume. Beyond the cap the block degrades to a STAR:
# each overflow vector is compared against the block's min-id vector
# only (the pair still emits only if it clears the cosine threshold).
# Tail-tail pairs inside an over-cap label are NOT generated; the event
# is logged loudly, never silent. The SQL oracle assumes no label
# overflows — true by construction at oracle scale (label blocks << cap).
MAX_LABEL_BLOCK = 4096


def embedding_dup_pairs(
    sf_dir: str, threshold: float = 0.35, max_block: int | None = None
) -> ray.data.Dataset:
    """(id_a, id_b) pairs with cosine >= threshold, blocked by label: the
    groupby key acts as the coarse quantizer, so the all-pairs matmul runs
    per block instead of across the corpus (embedding-space near-dup).
    Per-block work is capped at ``max_block`` (default MAX_LABEL_BLOCK)
    with a logged star fallback, so one hot label cannot go quadratic."""
    import logging

    logger = logging.getLogger(__name__)
    cap = MAX_LABEL_BLOCK if max_block is None else max_block
    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )

    def one_label(g: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        ids = g.vec_id.to_numpy()
        order = np.argsort(ids, kind="mergesort")
        ids = ids[order]
        mat = _normalize(np.asarray(g.embedding.to_list(), dtype=np.float64)[order])
        head_ids, head = ids[:cap], mat[:cap]
        sims = head @ head.T                               # (<=cap, <=cap)
        ai, bi = np.triu_indices(len(head_ids), 1)
        keep = sims[ai, bi] >= threshold
        out_a = [head_ids[ai[keep]]]
        out_b = [head_ids[bi[keep]]]
        if len(ids) > cap:
            logger.warning(
                "embedding label block over cap: label=%r size=%d > %d — "
                "star fallback — bounded recall: tail-tail pairs in this "
                "label are NOT generated (see MAX_LABEL_BLOCK)",
                g.label.iloc[0], len(ids), cap,
            )
            tail_ids, tail = ids[cap:], mat[cap:]
            star = tail @ mat[0]                           # hub = min id
            k = star >= threshold
            out_a.append(np.full(int(k.sum()), ids[0], dtype=ids.dtype))
            out_b.append(tail_ids[k])
        return np.concatenate(out_a), np.concatenate(out_b)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        a, b = one_label(group)
        return pd.DataFrame(
            {"id_a": a.astype(np.int64), "id_b": b.astype(np.int64)}
        )

    def add_lkey(t: pa.Table) -> pa.Table:
        # the typed hash-partitioned group apply needs an int64 key; the
        # table's label is int32, so this is a lossless cast, not a hash
        t = t.select(["vec_id", "label", "embedding"])
        return t.append_column("lkey", t["label"].cast(pa.int64()))

    from ebook_ocr_ray.groups import map_groups_typed

    return map_groups_typed(
        emb.map_batches(add_lkey, batch_format="pyarrow"),
        "lkey",
        pairs,
        schema=pa.schema(
            [("vec_id", pa.int64()), ("label", pa.int32()),
             ("embedding", pa.list_(pa.float32())), ("lkey", pa.int64())]
        ),
        empty_fn=lambda: pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
        ),
        num_partitions=8,
    )


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): keep ONE representative
# per embedding-similarity cluster — the "remove semantic duplicates"
# action composed from the pieces above: label-blocked cosine pairs
# (embedding_dup_pairs == the within-cluster pair step) + keyed min-label
# connected components (no driver state) + a keyed survivor count.
# --------------------------------------------------------------------------


def dedup_semantic(
    sf_dir: str, threshold: float = 0.35, max_block: int | None = None
) -> ray.data.Dataset:
    """(vec_id, cluster_size): one row per semantic cluster, vec_id = the
    cluster's min member (the kept representative), cluster_size = how
    many embeddings it absorbed (1 for singletons). The pair graph, the
    propagation and the final count are all keyed — nothing about the
    cluster structure ever lands on the driver."""
    import pandas as pd

    from ebook_ocr_ray.groups import map_partitions_typed
    from ebook_ocr_ray.joins import safe_join
    from ebook_ocr_ray.pipelines.neardup import propagate_labels

    edges = embedding_dup_pairs(sf_dir, threshold, max_block).materialize()
    all_ids = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])

    if edges.count() == 0:
        return all_ids.map_batches(
            lambda t: pa.table(
                {
                    "vec_id": t["vec_id"].cast(pa.int64()),
                    "cluster_size": pa.array(
                        np.ones(len(t), dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    labels = propagate_labels(edges)                        # (node, label)
    joined = safe_join(
        all_ids,
        labels,
        on="vec_id",
        right_on="node",
        num_partitions=8,
        join_type="left_outer",
        left_schema=pa.schema([("vec_id", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
    )

    def label_partial(t: pa.Table) -> pa.Table:
        lab = pa.compute.coalesce(
            t["label"].cast(pa.int64()), t["vec_id"].cast(pa.int64())
        ).to_numpy(zero_copy_only=False)
        keys, counts = np.unique(lab, return_counts=True)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def reduce_partition(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("key", sort=False)["n"].sum().reset_index()
            .rename(columns={"key": "vec_id", "n": "cluster_size"})
        )
        return out.astype({"vec_id": "int64", "cluster_size": "int64"})

    return map_partitions_typed(
        joined.map_batches(label_partial, batch_format="pyarrow"),
        "key",
        reduce_partition,
        schema=pa.schema([("key", pa.int64()), ("n", pa.int64())]),
        empty_fn=lambda: pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "cluster_size": pd.Series(dtype="int64"),
            }
        ),
        num_partitions=4,
    )
