"""Near-duplicate detection over the documents table: MinHash+LSH and
SimHash, as Ray Data pipelines.

Canonical shape (SURVEY.md + ray_guide):

    signature per doc (map_batches, vectorized numpy)
      -> explode to (band_id, band_key, doc_id) rows         # 1->B flat map
      -> groupby band bucket -> candidate pairs              # the only shuffle
      -> verify (exact Jaccard / hamming) on candidate pairs
      -> connected components -> (doc_id, cluster_id)

Verification needs both texts of each candidate pair. Candidates after LSH
blocking are a vanishing fraction of n^2, so the verify step broadcasts
only the candidate docs' texts (gathered by a semi-join filter). The
union-find runs driver-side over candidate EDGES only — bounded by the
candidate count, not the corpus (documented assumption; at 100 TB this is
the standard iterate-min-label-propagation swap-in point).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.functions.sketches import (
    LSH_BANDS,
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash64,
    simhash_band_keys,
)


def _candidate_pairs_from_buckets(buckets: ray.data.Dataset) -> list[tuple[int, int]]:
    """groupby (band, key) -> unordered candidate pairs (id_a < id_b)."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group.doc_id.to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ai, bi = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bi]})

    out = buckets.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas").to_pandas()
    if out.empty:
        return []
    dedup = out.drop_duplicates()
    return list(dedup.itertuples(index=False, name=None))


def label_propagation_clusters(
    edges: ray.data.Dataset, max_iters: int = 10
) -> ray.data.Dataset:
    """Distributed connected components over an (id_a, id_b) edge dataset:
    iterative min-label propagation, the at-scale replacement for the
    driver union-find when the candidate-edge set is too large to collect.

    Each round: explode edges to (node, neighbor_label) in both
    directions, take the min label per node (keyed aggregate), and join
    labels back onto edges by relabeling endpoints. Rounds needed =
    graph diameter (near-dup clusters are shallow; 10 covers them).
    Converged when no label changes; returns (doc_id, cluster_id).
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    # initial labels: every node labels itself
    def seed(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([a, b])
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "label": pa.array(nodes, pa.int64())})

    labels = edges.map_batches(seed, batch_format="pyarrow").groupby("node").aggregate(
        Min("label", alias_name="label")
    ).materialize()

    for _ in range(max_iters):
        ldf = labels.to_pandas()
        map_ref = ray.put(dict(zip(ldf["node"], ldf["label"])))

        def propagate(batch: pa.Table) -> pa.Table:
            lm = ray.get(map_ref)
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            la = np.array([lm[x] for x in a], dtype=np.int64)
            lb = np.array([lm[x] for x in b], dtype=np.int64)
            m = np.minimum(la, lb)
            return pa.table(
                {
                    "node": pa.array(np.concatenate([a, b]), pa.int64()),
                    "label": pa.array(np.concatenate([m, m]), pa.int64()),
                }
            )

        new_labels = (
            edges.map_batches(propagate, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        new = new_labels.to_pandas().sort_values("node").reset_index(drop=True)
        old = ldf.sort_values("node").reset_index(drop=True)
        labels = new_labels
        if old.equals(new):
            break
    # NOTE: the per-round broadcast of the full label map bounds this
    # variant by driver memory for labels (not edges); see
    # label_propagation_keyed for the join-based variant with no driver
    # state at all.
    return labels


def label_propagation_keyed(
    edges: ray.data.Dataset, max_iters: int = 10, num_partitions: int = 8
) -> ray.data.Dataset:
    """Fully keyed min-label propagation: labels are attached to edge
    endpoints via hash-partitioned Dataset.join on the node key — NO
    driver-side label map, so both edges and labels can exceed driver
    memory. Per round: join labels onto id_a, then onto id_b, emit
    min(label_a, label_b) to both endpoints, keyed Min aggregate.

    Costs two hash joins + one aggregate per round vs the broadcast
    variant's one aggregate — use it when the label set can't sit on the
    driver; otherwise label_propagation_clusters is cheaper.
    """
    from ray.data.aggregate import Min

    def seed(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([a, b])
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "label": pa.array(nodes, pa.int64())})

    labels = (
        edges.map_batches(seed, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    for _ in range(max_iters):
        la = edges.join(
            labels.map_batches(
                lambda t: t.rename_columns(["node", "label_a"]), batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("id_a",),
            right_on=("node",),
        )
        lab = la.join(
            labels.map_batches(
                lambda t: t.rename_columns(["node", "label_b"]), batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("id_b",),
            right_on=("node",),
        )

        def emit_min(batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            m = np.minimum(
                batch["label_a"].to_numpy(zero_copy_only=False),
                batch["label_b"].to_numpy(zero_copy_only=False),
            )
            return pa.table(
                {
                    "node": pa.array(np.concatenate([a, b]), pa.int64()),
                    "label": pa.array(np.concatenate([m, m]), pa.int64()),
                }
            )

        new_labels = (
            lab.map_batches(emit_min, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        old = labels.to_pandas().sort_values("node").reset_index(drop=True)
        new = new_labels.to_pandas().sort_values("node").reset_index(drop=True)
        labels = new_labels
        if old.equals(new):
            break
    return labels


def _union_find_clusters(doc_ids: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in doc_ids}


def _gather_texts(sf_dir: str, doc_ids: set[int]) -> dict[int, str]:
    """Semi-join: fetch only candidate docs' texts (broadcast the id set)."""
    if not doc_ids:
        return {}
    ids_ref = ray.put(doc_ids)

    def keep(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        mask = pa.array([d in wanted for d in batch["doc_id"].to_pylist()], pa.bool_())
        return batch.filter(mask)

    t = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return dict(zip(t.doc_id, t.text))


def minhash_clusters(
    sf_dir: str, k_shingle: int = 3, jaccard_threshold: float = 0.7
) -> pd.DataFrame:
    """(doc_id, cluster_id) for every document; cluster_id = min doc_id of
    the near-dup component (singletons map to themselves)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode_bands(batch: pa.Table) -> pa.Table:
        out_doc, out_band, out_key = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = minhash_signature(text, k_shingle)
            for band, key in lsh_band_keys(sig):
                out_doc.append(doc_id)
                out_band.append(band)
                out_key.append(key)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
            }
        )

    buckets = docs.map_batches(explode_bands, batch_format="pyarrow")
    candidates = _candidate_pairs_from_buckets(buckets)

    texts = _gather_texts(sf_dir, {d for pair in candidates for d in pair})
    verified = [
        (a, b)
        for a, b in candidates
        if jaccard(texts[a], texts[b], k_shingle) >= jaccard_threshold
    ]

    all_ids = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).to_pandas()
    clusters = _union_find_clusters(all_ids.doc_id.tolist(), verified)
    return pd.DataFrame(
        {"doc_id": all_ids.doc_id, "cluster_id": all_ids.doc_id.map(clusters)}
    ).astype({"doc_id": "int64", "cluster_id": "int64"})


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """(id_a, id_b, hamming) near-dup pairs: band blocking over the 64-bit
    simhash sized so recall is GUARANTEED up to ``max_hamming`` (pigeonhole
    needs max_hamming+1 bands; the default 3 -> 4x16-bit bands). Raising
    the threshold automatically narrows the bands (e.g. 7 -> 8x8-bit)."""
    tables = max_hamming + 1
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        out_doc, out_band, out_key, out_print = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            ph = simhash64(text)
            for band, key in simhash_band_keys(ph, tables=tables):
                out_doc.append(doc_id)
                out_band.append(band)
                out_key.append(key)
                out_print.append(ph)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
                "print": pa.array(out_print, pa.uint64()),
            }
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id", kind="mergesort")
        ids = g.doc_id.to_numpy()
        prints = g["print"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ai, bi = np.triu_indices(len(ids), 1)
        rows = [
            (int(ids[x]), int(ids[y]), hamming64(int(prints[x]), int(prints[y])))
            for x, y in zip(ai, bi)
        ]
        df = pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])
        return df[df.hamming <= max_hamming]

    out = (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})
    return (
        out.drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
        .astype({"id_a": "int64", "id_b": "int64", "hamming": "int64"})
    )
