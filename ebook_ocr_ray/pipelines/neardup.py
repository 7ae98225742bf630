"""Near-duplicate detection over the documents table: MinHash+LSH and
SimHash, as Ray Data pipelines.

Canonical shape (SURVEY.md + ray_guide):

    signature per doc (map_batches, vectorized numpy)
      -> explode to (band_id, band_key, doc_id) rows         # 1->B flat map
      -> groupby band bucket -> candidate pairs              # the only shuffle
      -> verify (exact Jaccard / hamming) on candidate pairs
      -> connected components -> (doc_id, cluster_id)

Verification needs both texts of each candidate pair. Candidates after LSH
blocking are a vanishing fraction of n^2, so the verify step JOINS the
candidate-pair dataset to the documents table by key (two hash joins) and
computes exact Jaccard inside map_batches — no driver state. Clustering is
keyed min-label propagation (``label_propagation_keyed``), so neither the
edge set nor the label table ever has to fit on the driver. A per-bucket
size ceiling keeps one hot band key from going quadratic.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean

from ebook_ocr_ray.functions.sketches import (
    LSH_BANDS,
    lsh_band_keys_batch,
    minhash_signatures_batch,
    simhash64_batch,
)

logger = logging.getLogger(__name__)

# Ceiling on the all-pairs region within one LSH/simhash bucket. A band
# key shared by B documents generates B^2/2 candidate pairs; a degenerate
# key (boilerplate-only shingles, all-zero band) can otherwise pull the
# whole corpus into one group. Beyond the cap the bucket degrades to a
# STAR (each overflow id pairs with the bucket's min id only): pair count
# becomes cap^2/2 + (B - cap) instead of B^2/2. This is an EXPLICIT
# bounded-recall trade, logged loudly when taken: tail-tail pairs whose
# only shared bucket overflowed are not generated (for simhash at
# hamming == max_hamming the pigeonhole guarantee is exactly one shared
# band, so such pairs ARE lost, not recovered elsewhere), and a star
# edge that fails the downstream verify can split a component a direct
# tail-tail edge would have joined. The SQL oracles assume no bucket
# overflows — true by construction at oracle scale (corpus 500 < cap) —
# so an overflow in production is observable in the logs, never silent.
MAX_BUCKET = 512


def _hot_bucket_table(hot: pd.DataFrame) -> pa.Table:
    """Broadcastable (band, key) Arrow table of multi-member buckets with
    the exact dtypes of the bucket rows (int32 band, int64 key)."""
    return pa.table(
        {
            "band": pa.array(hot["band"].to_numpy(), pa.int32()),
            "key": pa.array(hot["key"].to_numpy(), pa.int64()),
        }
    )


def _only_hot_fn(hot_ref):
    """Vectorized semi-join filter: keep only bucket rows whose (band, key)
    appears in the broadcast multi-member table — an Arrow hash join per
    batch, not a per-row Python membership loop.

    A batch that filters to NOTHING (the normal case on a clean corpus)
    becomes one negative-key filler row instead: Ray skips the remaining
    fused UDFs on an empty batch and emits a schema-less empty block, so
    the filler must be born HERE, not appended downstream
    (joins.filler_if_empty). All real bucket keys are 63-bit masked
    (lsh_band_keys_batch / stable_hash63), so key < SENTINEL_CEILING can
    never name a real bucket: the LSH/simhash pair kernels see it as a
    single-doc bucket (doc_id 0 repeated -> no pairs), and jaccard's
    key-partitioned stage drops it with its sentinel filter."""
    from ebook_ocr_ray.joins import SENTINEL_CEILING

    def only_hot(t: pa.Table) -> pa.Table:
        wanted = ray.get(hot_ref)
        out = t.join(wanted, keys=["band", "key"], join_type="left semi")
        if len(out) == 0:
            out = pa.Table.from_arrays(
                [
                    pa.array(
                        [SENTINEL_CEILING - 1] if f.name == "key" else [0], f.type
                    )
                    for f in out.schema
                ],
                schema=out.schema,
            )
        return out

    return only_hot


# Above this many multi-member buckets the hot set stops being broadcast
# and the filter becomes a hash-partitioned semi-join: the hot set is
# bounded by near-dup volume, which at corpus scale can itself outgrow a
# worker's heap.
HOT_BROADCAST_MAX = 1_000_000
_MIX64 = np.uint64(0x9E3779B97F4A7C15)


def _bucket_join_key(band: np.ndarray, key: np.ndarray) -> np.ndarray:
    """63-bit mix of (band, key) for the single-int64-key hash join.
    Collisions are tolerated — callers re-check band/key equality after
    the join."""
    h = key.astype(np.uint64) * _MIX64 + band.astype(np.uint64)
    return (h & np.uint64((1 << 63) - 1)).astype(np.int64)


def _add_bkey(t: pa.Table) -> pa.Table:
    """THE bkey column builder — hot-filter join, LSH pair expansion and
    simhash pair expansion must shuffle on the identical key, so they all
    call this one helper (three drifting copies would silently
    desynchronize the hot filter from the pair kernels).

    Empty batches (a hot filter that removed a whole block — the normal
    case on a clean corpus, where almost no bucket is multi-member)
    become one sentinel-keyed filler row: every consumer of this stream
    (map_partitions_typed on bkey, safe_join on bkey) filters sentinels
    anyway, and the filler keeps the task's output bundle typed (see
    joins.filler_if_empty)."""
    from ebook_ocr_ray.joins import filler_if_empty

    if "bkey" in t.column_names:     # join-path rows already carry it
        return filler_if_empty(t, "bkey")
    return filler_if_empty(
        t.append_column(
            "bkey",
            pa.array(
                _bucket_join_key(
                    t["band"].to_numpy(zero_copy_only=False),
                    t["key"].to_numpy(zero_copy_only=False),
                ),
                pa.int64(),
            ),
        ),
        "bkey",
    )


# Pair-stage partition sizing: map_partitions_typed hands each partition
# to ONE task as ONE in-memory frame, so the partition count must track
# the volume that actually reaches the pair kernels. That is the HOT
# (multi-member) bucket count, not raw bucket rows — a 256M-row clean
# corpus has almost no hot buckets and must keep the small default
# (over-partitioning near-empty shuffles measured ~4x wall on jaccard),
# while a mirror farm's hot count grows with its pair volume. One
# partition per HOT_BUCKETS_PER_PARTITION hot buckets (floor: the
# caller's num_partitions; cap: MAX_PAIR_PARTITIONS).
HOT_BUCKETS_PER_PARTITION = 50_000
MAX_PAIR_PARTITIONS = 256


def _pair_partitions(num_partitions: int, n_hot_buckets: int | None) -> int:
    if not n_hot_buckets:
        return num_partitions
    return max(
        num_partitions,
        min(MAX_PAIR_PARTITIONS, n_hot_buckets // HOT_BUCKETS_PER_PARTITION + 1),
    )


def hot_filtered_buckets(
    buckets: ray.data.Dataset,
    bucket_schema: pa.Schema,
    hot_strategy: str = "auto",
    num_partitions: int = 8,
    n_rows: int | None = None,
    with_hot_count: bool = False,
    count_buckets: ray.data.Dataset | None = None,
) -> "ray.data.Dataset | None | tuple[ray.data.Dataset | None, int]":
    """Reduce bucket rows to those in multi-member buckets (the only rows
    that can generate candidate pairs). Returns None when every bucket is
    a singleton; with ``with_hot_count=True`` returns ``(filtered,
    n_hot_buckets)`` — the hot count is computed here anyway and is the
    right base for pair-stage partition sizing (_pair_partitions). The hot (band, key) set is broadcast while it fits
    (``ray.put`` + per-batch Arrow semi-join) and flips to a keyed
    semi-join on a mixed 63-bit key — with post-join exact (band, key)
    re-check — beyond HOT_BROADCAST_MAX; ``hot_strategy`` forces
    'broadcast' or 'join'.

    ``n_rows``: bucket-row count hint (free when the caller already
    materialized the buckets) — sizes the hash-count shuffle to the data
    so a bench-scale corpus doesn't pay 16 aggregator actors' spin-up
    for a few thousand rows. Omitted -> the cpu-count default.

    ``count_buckets``: an optional (band, key)-only view of the SAME
    rows for the count pass — in spool mode a column-pruned parquet
    re-read, so the count never drags payload-adjacent columns
    (simhash's 8-byte print, doc_id) off disk. Must contain exactly the
    same (band, key) multiset as ``buckets``."""
    from ray.data.aggregate import Count

    if hot_strategy not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown hot_strategy {hot_strategy!r}")
    # multi-member detection by HASH shuffle on the mixed 63-bit bucket
    # key, not a 2-column sort aggregate: measured on the 1.28M-doc / 2%-
    # dup stress corpus the sort-based groupby(band, key).Count over the
    # ~20M bucket rows took 78s of a 122s wall; the hash count is a
    # per-batch partial + one keyed repartition + a vectorized
    # per-partition sum. A bkey collision can only ADD a singleton
    # (band, key) to the hot set — downstream pair generation groups by
    # the exact bucket, where a 1-member group emits nothing — so the
    # result is exact.
    from ebook_ocr_ray.groups import map_partitions_typed

    def count_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "bkey": _bucket_join_key(
                    t["band"].to_numpy(zero_copy_only=False),
                    t["key"].to_numpy(zero_copy_only=False),
                ),
                "band": t["band"].to_numpy(zero_copy_only=False),
                "key": t["key"].to_numpy(zero_copy_only=False),
            }
        )
        agg = (
            df.groupby(["bkey", "band", "key"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    def hot_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby(["band", "key"], sort=False)["n"].sum().reset_index()
        out = tot.loc[tot["n"] > 1, ["band", "key"]]
        return out.astype({"band": "int32", "key": "int64"})

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    count_parts = (
        min(max(8, cpus), 16)
        if n_rows is None
        # data-adaptive: one aggregator per ~1M bucket rows, capped at the
        # cpu-derived ceiling (per-batch partials pre-shrink the shuffle,
        # so partition width tracks distinct-key volume, not row volume)
        else max(1, min(min(max(8, cpus), 16), n_rows // 1_000_000 + 1))
    )
    hot_ds = map_partitions_typed(
        (count_buckets if count_buckets is not None else buckets).map_batches(
            count_partial, batch_format="pyarrow"
        ),
        "bkey",
        hot_in_partition,
        schema=pa.schema(
            [("bkey", pa.int64()), ("band", pa.int32()),
             ("key", pa.int64()), ("n", pa.int64())]
        ),
        empty_fn=lambda: pd.DataFrame(
            {"band": pd.Series(dtype="int32"), "key": pd.Series(dtype="int64")}
        ),
        num_partitions=count_parts,
    ).materialize()
    n_hot = hot_ds.count()

    def _ret(ds):
        return (ds, n_hot) if with_hot_count else ds

    if n_hot == 0:
        return _ret(None)

    use_join = hot_strategy == "join" or (
        hot_strategy == "auto" and n_hot > HOT_BROADCAST_MAX
    )
    if not use_join:
        hot_ref = ray.put(_hot_bucket_table(hot_ds.to_pandas()))
        return _ret(buckets.map_batches(_only_hot_fn(hot_ref), batch_format="pyarrow"))

    from ebook_ocr_ray.joins import safe_join

    def hot_renamed(t: pa.Table) -> pa.Table:
        t = _add_bkey(t)
        return t.rename_columns(["band_h", "key_h", "bkey"])

    # drop_sentinels=False: the raw join keeps one sentinel-pair row per
    # partition, so `exact` ALWAYS runs and can refill a batch its own
    # filters emptied (Ray skips fused UDFs on empty batches — with the
    # built-in sentinel filter first, a partition whose rows all fail
    # the exact re-check would empty before `exact` and the filler could
    # never fire). The sentinel rows themselves fall to the band/key
    # equality filter: their null band/band_h compare to null, and
    # Arrow's filter drops nulls.
    joined = safe_join(
        buckets.map_batches(_add_bkey, batch_format="pyarrow"),
        hot_ds.map_batches(hot_renamed, batch_format="pyarrow"),
        on="bkey",
        right_on="bkey",
        num_partitions=num_partitions,
        left_schema=pa.schema(list(bucket_schema) + [pa.field("bkey", pa.int64())]),
        # hot-side types derive from the authoritative bucket schema
        right_schema=pa.schema(
            [
                ("band_h", bucket_schema.field("band").type),
                ("key_h", bucket_schema.field("key").type),
                ("bkey", pa.int64()),
            ]
        ),
        drop_sentinels=False,
    )

    def exact(t: pa.Table) -> pa.Table:
        keep = pa.compute.and_(
            pa.compute.equal(t["band"], t["band_h"]),
            pa.compute.equal(t["key"], t["key_h"]),
        )
        # keep bkey: the pair kernels shuffle on it next, and _add_bkey
        # is a no-op when the column is already present
        from ebook_ocr_ray.joins import SENTINEL_CEILING

        out = t.filter(keep).select(list(bucket_schema.names) + ["bkey"])
        if len(out) == 0:
            # typed filler with SENTINEL key AND bkey (both are shuffle
            # keys downstream — jaccard partitions on key, LSH/simhash on
            # bkey — and both wrappers filter sub-ceiling values); real
            # keys are 63-bit masked so no collision is possible
            out = pa.Table.from_arrays(
                [
                    pa.array(
                        [SENTINEL_CEILING - 1] if f.name in ("key", "bkey") else [0],
                        f.type,
                    )
                    for f in out.schema
                ],
                schema=out.schema,
            )
        return out

    return _ret(joined.map_batches(exact, batch_format="pyarrow"))


# byte-wise popcount table: vectorized hamming over uint64 prints on
# numpy 1.x (no bitwise_count ufunc) — view each word as 8 bytes, table
# lookup, row sum
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(
    np.uint8
)


def _hamming64_vec(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    z = np.bitwise_xor(x, y)
    if len(z) == 0:
        return np.zeros(0, dtype=np.int64)
    return _POP8[z.view(np.uint8).reshape(len(z), 8)].sum(axis=1).astype(np.int64)


def _make_collect_records_agg(cols: list[str], alias: str = "recs"):
    """Keyed aggregate collecting each bucket's rows as concatenated
    little-endian int64 records (one fixed-width record per row, fields
    in ``cols`` order). Accumulators are plain bytes, so partials store
    in Arrow blocks between the map-side combine and the reduce, and the
    per-group Python cost is one ndarray.tobytes — this replaces
    ``groupby().map_groups`` for pair generation, whose per-group pandas
    materialization dominated wall time on dup-heavy corpora (measured:
    80k docs at 100% dup fraction did not finish in 10 min via
    map_groups; seconds via this aggregate + batched expansion).
    uint64 fields (simhash prints) travel bit-cast as int64."""
    from ray.data.aggregate import AggregateFnV2

    class CollectRecords(AggregateFnV2):
        def __init__(self) -> None:
            super().__init__(alias, on=None, ignore_nulls=True,
                             zero_factory=lambda: b"")

        def aggregate_block(self, block) -> bytes:
            t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            arrs = [
                t[c].to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
                for c in cols
            ]
            return np.column_stack(arrs).astype("<u8").tobytes()

        def combine(self, a, b):
            # bytearray promotion makes the reduce-side left fold over many
            # partials amortized O(total) instead of O(total^2) in blob
            # bytes (a degenerate mega-bucket can span hundreds of
            # partials); Arrow binary columns accept bytearray, so partial
            # accumulators still store in blocks between stages
            if isinstance(a, bytearray):
                a += b
                return a
            return bytearray(a) + b

        def finalize(self, acc):
            return bytes(acc)

    return CollectRecords()


def candidate_pair_dataset(
    buckets: ray.data.Dataset,
    max_bucket: int | None = None,
    hot_strategy: str = "auto",
    num_partitions: int = 8,
    n_rows: int | None = None,
    count_buckets: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """groupby (band, key) -> DISTINCT unordered candidate pairs as a
    Dataset.

    Almost every bucket is a singleton (a document sharing no band key
    with anyone) and yields no pairs, so a vectorized keyed Count finds
    the multi-member buckets first (bounded by the actual near-dup
    volume; broadcast or keyed semi-join per ``hot_strategy``). Pair
    generation is then ONE hash repartition on the mixed bucket key plus
    a boundary-scanned numpy kernel per partition (lexsort, exact
    (band, key) boundaries, triu pair expansion with the MAX_BUCKET star
    fallback) — no per-group UDF, no record blobs, no sort aggregate.
    Cross-band duplicates of a pair are removed by a second hash
    repartition on id_a plus a partition-local drop_duplicates, which is
    globally exact because canonical (id_a < id_b) orientation means
    every occurrence of a pair co-locates. Pair-stage partition counts
    scale with the post-filter HOT bucket count (_pair_partitions: one
    partition per HOT_BUCKETS_PER_PARTITION hot buckets, cap
    MAX_PAIR_PARTITIONS) so no partition ever holds more than a bounded
    pair slice in one heap — slim int pairs end to end, never a driver
    collect."""
    from ebook_ocr_ray.groups import map_partitions_typed

    cap = MAX_BUCKET if max_bucket is None else max_bucket
    schema = pa.schema(
        [("doc_id", pa.int64()), ("band", pa.int32()), ("key", pa.int64())]
    )
    filtered, n_hot = hot_filtered_buckets(
        buckets, schema, hot_strategy, num_partitions=num_partitions,
        n_rows=n_rows, with_hot_count=True, count_buckets=count_buckets,
    )
    pair_parts = _pair_partitions(num_partitions, n_hot)
    if filtered is None:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        )

    # The bkey is only the SHUFFLE key; group boundaries re-scan the
    # exact (band, key) pair, so a bkey collision merely co-locates two
    # buckets and can never merge their pair sets.
    def expand_partition(df: pd.DataFrame) -> pd.DataFrame:
        band = df["band"].to_numpy(dtype=np.int64, copy=False)
        key = df["key"].to_numpy(dtype=np.int64, copy=False)
        doc = df["doc_id"].to_numpy(dtype=np.int64, copy=False)
        order = np.lexsort((doc, key, band))
        band, key, doc = band[order], key[order], doc[order]
        # exact-bucket boundaries on the sorted (band, key) columns
        new = np.r_[True, (band[1:] != band[:-1]) | (key[1:] != key[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(band)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            ids = doc[s:e]
            # de-dup within the bucket (sorted, so a boundary scan): a
            # doc_id duplicated in the input table would otherwise emit
            # self-pairs (id_a == id_b) into the edge set
            ids = ids[np.r_[True, ids[1:] != ids[:-1]]]
            if len(ids) < 2:
                continue
            head = ids[:cap]
            ai, bi = np.triu_indices(len(head), 1)
            out_a.append(head[ai])
            out_b.append(head[bi])
            if len(ids) > cap:
                logger.warning(
                    "near-dup bucket over cap: band=%s key=%s size=%d > %d — "
                    "star fallback — bounded recall: tail-tail pairs whose "
                    "only shared bucket is this one are NOT generated "
                    "(see MAX_BUCKET)", band[s], key[s], len(ids), cap,
                )
                tail = ids[cap:]
                out_a.append(np.full(len(tail), ids[0], dtype=np.int64))
                out_b.append(tail)
        if not out_a:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("id_a", "id_b")}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    pairs = map_partitions_typed(
        filtered.map_batches(_add_bkey, batch_format="pyarrow"),
        "bkey",
        expand_partition,
        schema=pa.schema(list(schema) + [pa.field("bkey", pa.int64())]),
        empty_fn=lambda: pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("id_a", "id_b")}
        ),
        num_partitions=pair_parts,
    )

    # Cross-band pair dedup: hash-partition by id_a co-locates every
    # occurrence of a pair, so a partition-local drop_duplicates is
    # globally exact — fully vectorized, no record blobs, no sort
    # aggregate (and none of the sort path's schema-less empty bundles).
    def dedup_partition(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]
        return out.astype({"id_a": "int64", "id_b": "int64"})

    return map_partitions_typed(
        pairs,
        "id_a",
        dedup_partition,
        schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
        empty_fn=lambda: pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("id_a", "id_b")}
        ),
        num_partitions=pair_parts,
    )


def _seed_edge_min(batch: pa.Table) -> pa.Table:
    """Seed labels with the per-edge minimum endpoint: emitting
    (a, min(a,b)) and (b, min(a,b)) before the keyed Min aggregate is
    exactly one propagation round from self-labels, computed directly on
    the edge batch with NO label join — so every component of diameter <= 2
    (pairs, stars, cliques: the overwhelming near-dup case) is already at
    its fixpoint when the per-round join machinery starts, saving a full
    join round at any scale."""
    a = batch["id_a"].to_numpy(zero_copy_only=False)
    b = batch["id_b"].to_numpy(zero_copy_only=False)
    m = np.minimum(a, b)
    return pa.table(
        {
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "label": pa.array(np.concatenate([m, m]), pa.int64()),
        }
    )


def label_propagation_clusters(
    edges: ray.data.Dataset, max_iters: int | None = None
) -> ray.data.Dataset:
    """Distributed connected components over an (id_a, id_b) edge dataset:
    iterative min-label propagation, the at-scale replacement for the
    driver union-find when the candidate-edge set is too large to collect.

    Each round: explode edges to (node, neighbor_label) in both
    directions, take the min label per node (keyed aggregate), and join
    labels back onto edges by relabeling endpoints. Rounds needed =
    graph diameter. Default ``max_iters=None`` iterates to the fixpoint
    (hard cap 200; a warning is logged if the cap is ever hit — wrong
    labels must never be silent); returns (node, label).
    """
    from ray.data.aggregate import Min

    labels = (
        edges.map_batches(_seed_edge_min, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    cap = 200 if max_iters is None else max_iters
    converged = False
    for _ in range(cap):
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
            converged = True
            break
    if not converged:
        logger.warning(
            "label_propagation_clusters hit the %d-iteration cap without "
            "converging — labels for high-diameter components are WRONG; "
            "raise max_iters", cap,
        )
    # NOTE: the per-round broadcast of the full label map bounds this
    # variant by driver memory for labels (not edges); see
    # label_propagation_keyed for the join-based variant with no driver
    # state at all.
    return labels


# Edge sets at or under this size take the exact driver union-find fast
# path in propagate_labels: a keyed propagation round costs two hash
# joins + one aggregate of FIXED multi-second overhead, which dwarfs the
# actual work for small graphs (measured: 26 edges cost 39 s keyed, <1 s
# via union-find). The bound is the same honesty contract as
# HOT_BROADCAST_MAX — beyond it nothing touches the driver.
PROP_DRIVER_MAX = 100_000


def _union_find_labels(edges_df: "pd.DataFrame") -> pa.Table:
    """Exact min-label connected components on the driver (bounded input:
    see PROP_DRIVER_MAX). Path-compressed union by min id, so the root of
    every set IS the component minimum — identical semantics to the keyed
    propagation's fixpoint."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(edges_df["id_a"], edges_df["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(set(map(int, edges_df["id_a"])) | set(map(int, edges_df["id_b"])))
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "label": pa.array([find(n) for n in nodes], pa.int64()),
        }
    )


def propagate_labels(
    edges: ray.data.Dataset,
    n_edges: int | None = None,
    strategy: str = "auto",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(node, label) connected components with automatic path selection:
    exact driver union-find while the edge set is tiny (<= PROP_DRIVER_MAX
    — fixed per-round shuffle overhead would dominate), fully keyed
    min-label propagation beyond it with data-adaptive partitioning.
    ``strategy`` forces 'driver' or 'keyed'. Output is value-identical
    across paths (equality-tested)."""
    if strategy not in ("auto", "driver", "keyed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if n_edges is None:
        n_edges = edges.count()
    if n_edges == 0:
        # guard BEFORE the driver path: an empty edge Dataset's to_pandas
        # frame loses its columns, so _union_find_labels would KeyError
        return ray.data.from_arrow(
            pa.schema([("node", pa.int64()), ("label", pa.int64())]).empty_table()
        )
    use_driver = strategy == "driver" or (
        strategy == "auto" and n_edges <= PROP_DRIVER_MAX
    )
    if use_driver:
        return ray.data.from_arrow(_union_find_labels(edges.to_pandas()))
    parts = max(1, min(num_partitions, n_edges // 100_000 + 1))
    return label_propagation_keyed(edges, num_partitions=parts)


def label_propagation_keyed(
    edges: ray.data.Dataset, max_iters: int | None = None, num_partitions: int = 8
) -> ray.data.Dataset:
    """Fully keyed min-label propagation: labels are attached to edge
    endpoints via hash-partitioned joins on the node key — NO driver-side
    label map, so both edges and labels can exceed driver memory. Per
    round: join labels onto id_a, then onto id_b, emit min(label_a,
    label_b) to both endpoints, keyed Min aggregate. Convergence is a
    scalar COUNT of label-mismatched edges over the already-joined round
    input — exact at any scale (a label-total "potential" would wrap
    int64 once ids reach web scale and could falsely report a fixpoint),
    free of an extra pass, and when it hits zero the round's Min
    aggregate is skipped entirely — no label ever crosses the driver.
    Default ``max_iters=None`` iterates to the fixpoint (hard cap 200,
    logged warning if hit — unconverged labels must never be silent).

    Costs two hash joins + one aggregate per round vs the broadcast
    variant's one aggregate — use it when the label set can't sit on the
    driver; otherwise label_propagation_clusters is cheaper.
    """
    from ray.data.aggregate import Min, Sum

    from ebook_ocr_ray.joins import safe_join

    labels = (
        edges.map_batches(_seed_edge_min, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    edge_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    lab_schema = lambda name: pa.schema([("node", pa.int64()), (name, pa.int64())])  # noqa: E731
    cap = 200 if max_iters is None else max_iters
    converged = False
    for _ in range(cap):
        la = safe_join(
            edges,
            labels.map_batches(
                lambda t: t.rename_columns(["node", "label_a"]), batch_format="pyarrow"
            ),
            on="id_a",
            right_on="node",
            num_partitions=num_partitions,
            left_schema=edge_schema,
            right_schema=lab_schema("label_a"),
        )
        lab = safe_join(
            la,
            labels.map_batches(
                lambda t: t.rename_columns(["node", "label_b"]), batch_format="pyarrow"
            ),
            on="id_b",
            right_on="node",
            num_partitions=num_partitions,
            left_schema=pa.schema(
                [("id_a", pa.int64()), ("id_b", pa.int64()), ("label_a", pa.int64())]
            ),
            right_schema=lab_schema("label_b"),
        )

        # two consumers (mismatch count + min emission): keep the slim
        # joined edge rows in the object store instead of re-joining
        lab = lab.materialize()

        def mismatches(batch: pa.Table) -> pa.Table:
            n = pa.compute.sum(
                pa.compute.cast(
                    pa.compute.not_equal(batch["label_a"], batch["label_b"]),
                    pa.int64(),
                )
            ).as_py()
            return pa.table({"n": pa.array([n or 0], pa.int64())})

        n_mismatch = lab.map_batches(mismatches, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n")
        )["n"]
        if not n_mismatch:       # every edge agrees: labels ARE the fixpoint
            converged = True
            break

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

        labels = (
            lab.map_batches(emit_min, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
    if not converged:
        logger.warning(
            "label_propagation_keyed hit the %d-iteration cap without "
            "converging — labels for high-diameter components are WRONG; "
            "raise max_iters", cap,
        )
    return labels


# Candidate-pair counts at or under this take the gather fast path in
# _join_pair_texts: two hash joins cost multi-second FIXED overhead,
# while a few thousand candidate texts are broadcast-class data (the
# propagate_labels/PROP_DRIVER_MAX honesty contract — candidate volume
# is bounded by true near-dup volume after the hot-bucket filter, and
# beyond the bound nothing changes: the keyed joins run as before).
PAIR_TEXT_DRIVER_MAX = 20_000


def _join_pair_texts(
    pairs: ray.data.Dataset,
    sf_dir: str,
    num_partitions: int = 8,
    n_pairs: int | None = None,
) -> ray.data.Dataset:
    """Attach both endpoint texts to each candidate pair. Small pair sets
    (<= PAIR_TEXT_DRIVER_MAX, known free when the caller materialized the
    candidates) gather the needed texts with ONE streaming membership
    filter over the documents table — no shuffle at all; larger sets take
    two hash-partitioned joins, where only candidate rows' texts ever
    move and nothing lands on the driver."""
    import os

    import pyarrow.parquet as pq

    from ebook_ocr_ray.joins import safe_join

    table_path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(table_path):          # spooled table = a dir of files
        table_path = os.path.join(
            table_path,
            sorted(f for f in os.listdir(table_path) if f.endswith(".parquet"))[0],
        )
    text_type = pq.read_schema(table_path).field("text").type
    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    if n_pairs is not None and n_pairs <= PAIR_TEXT_DRIVER_MAX:
        pdf = pairs.to_pandas()
        if "id_a" not in pdf.columns:            # empty frames lose columns
            return ray.data.from_arrow(
                pa.schema(
                    [("id_a", pa.int64()), ("id_b", pa.int64()),
                     ("text_a", text_type), ("text_b", text_type)]
                ).empty_table()
            )
        ids = np.unique(
            np.concatenate(
                [pdf["id_a"].to_numpy(np.int64), pdf["id_b"].to_numpy(np.int64)]
            )
        )
        if len(ids) == 0:
            return ray.data.from_arrow(
                pa.schema(
                    [("id_a", pa.int64()), ("id_b", pa.int64()),
                     ("text_a", text_type), ("text_b", text_type)]
                ).empty_table()
            )
        ids_ref = ray.put(ids)

        def member(t: pa.Table) -> pa.Table:
            want = ray.get(ids_ref)
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(want, d)
            pos[pos == len(want)] = 0
            return t.filter(pa.array(want[pos] == d))

        texts = (
            read_parquet_clean(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            )
            .map_batches(member, batch_format="pyarrow")
            .to_pandas()
        )
        tmap = (
            dict(zip(texts["doc_id"], texts["text"]))
            if "doc_id" in texts.columns           # empty frames lose columns
            else {}
        )
        # drop pairs whose endpoint is absent from the table: the keyed
        # path's INNER joins do the same, keeping the two paths identical
        keep = pdf["id_a"].map(tmap.__contains__) & pdf["id_b"].map(
            tmap.__contains__
        )
        pdf = pdf[keep]
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(pdf["id_a"].to_numpy(np.int64), pa.int64()),
                    "id_b": pa.array(pdf["id_b"].to_numpy(np.int64), pa.int64()),
                    "text_a": pa.array(
                        [tmap[i] for i in pdf["id_a"]], text_type
                    ),
                    "text_b": pa.array(
                        [tmap[i] for i in pdf["id_b"]], text_type
                    ),
                }
            )
        )

    def docs_as(col: str) -> ray.data.Dataset:
        return read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(
            lambda t: t.rename_columns(["doc_id", col]), batch_format="pyarrow"
        )

    with_a = safe_join(
        pairs, docs_as("text_a"),
        on="id_a", right_on="doc_id", num_partitions=num_partitions,
        left_schema=pair_schema,
        right_schema=pa.schema([("doc_id", pa.int64()), ("text_a", text_type)]),
    )
    return safe_join(
        with_a, docs_as("text_b"),
        on="id_b", right_on="doc_id", num_partitions=num_partitions,
        left_schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("text_a", text_type)]
        ),
        right_schema=pa.schema([("doc_id", pa.int64()), ("text_b", text_type)]),
    )


def minhash_clusters(
    sf_dir: str,
    k_shingle: int = 3,
    jaccard_threshold: float = 0.7,
    num_partitions: int = 8,
    hot_strategy: str = "auto",
    spool_dir: str | None = None,
) -> ray.data.Dataset:
    """(doc_id, cluster_id) for every document; cluster_id = min doc_id of
    the near-dup component (singletons map to themselves).

    Fully distributed end to end: banded LSH blocking -> capped per-bucket
    pair generation -> keyed pair dedup -> join-based exact-Jaccard verify
    -> keyed min-label propagation -> left-outer join back onto the id
    column.

    ``spool_dir``: the O(corpus) bucket rows are consumed twice (hot-key
    count + pair pass); None materializes them into the object store
    (bench-scale default), a scratch path spools them to parquet so the
    object store never carries the whole bucket set (corpus-scale mode;
    caller owns the dir lifetime — the extraction_pipeline contract).
    The candidate-pair and verified-edge sets stay materialized in both
    modes: they are bounded by the actual near-dup volume, not by the
    corpus."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode_bands(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # sentinel signature: empty docs are not near-dup candidates
        valid = np.array([bool(t and t.strip()) for t in texts], dtype=bool)
        if not valid.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band": pa.array([], pa.int32()),
                    "key": pa.array([], pa.int64()),
                }
            )
        sigs = minhash_signatures_batch(
            [t for t, v in zip(texts, valid) if v], k_shingle
        )
        keys = lsh_band_keys_batch(sigs)                  # (D, LSH_BANDS)
        ids = doc_ids[valid]
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, LSH_BANDS), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(LSH_BANDS, dtype=np.int32), len(ids)), pa.int32()
                ),
                "key": pa.array(keys.reshape(-1), pa.int64()),
            }
        )

    # Buckets are consumed twice (hot-key count pass + pair pass):
    # pin_reusable either materializes the slim (doc_id, band, key) rows
    # (~24 B x bands per doc, spillable; spool_dir=None) or spools them to
    # scratch parquet and re-reads per consumer (spool_dir set) — running
    # the minhash permutations once either way.
    from ebook_ocr_ray.state.spool import pin_reusable

    buckets = pin_reusable(
        docs.map_batches(explode_bands, batch_format="pyarrow"),
        spool_dir,
        "lsh_buckets",
        schema=pa.schema(
            [("doc_id", pa.int64()), ("band", pa.int32()), ("key", pa.int64())]
        ),
    )
    candidates = candidate_pair_dataset(
        buckets.read(), hot_strategy=hot_strategy, num_partitions=num_partitions,
        n_rows=buckets.n_rows,              # free in both modes
        # (band, key)-only view for the count pass: a pruned parquet
        # re-read in spool mode, a free projection when materialized
        count_buckets=buckets.read(columns=["band", "key"]),
    ).materialize()                                              # slim int pairs

    def _adaptive(n_rows: int) -> int:
        # a hash-shuffle op costs ~1 aggregator actor per partition;
        # shuffling a few thousand candidate rows across 8 actors is pure
        # spin-up overhead, so partition count follows the data
        return max(1, min(num_partitions, n_rows // 100_000 + 1))

    def verify(batch: pa.Table) -> pa.Table:
        # Exact-Jaccard gate, semantics identical to functions.sketches.jaccard,
        # but each doc's shingle set is built ONCE per batch (keyed by doc id)
        # instead of once per pair — at high dup fractions a doc appears in
        # dozens of candidate pairs, and shingling dominated the verify wall.
        from ebook_ocr_ray.functions.sketches import word_shingles

        cache: dict[int, set] = {}

        def sset(i: int, t: str) -> set:
            s = cache.get(i)
            if s is None:
                s = set(word_shingles(t, k_shingle))
                cache[i] = s
            return s

        keep = []
        for ia, ib, ta, tb in zip(
            batch["id_a"].to_pylist(), batch["id_b"].to_pylist(),
            batch["text_a"].to_pylist(), batch["text_b"].to_pylist(),
        ):
            sa, sb = sset(ia, ta), sset(ib, tb)
            if not sa and not sb:
                keep.append(True)                      # jaccard == 1.0
            else:
                inter = len(sa & sb)
                keep.append(
                    inter / (len(sa) + len(sb) - inter) >= jaccard_threshold
                )
        t = batch.filter(pa.array(keep, pa.bool_()))
        return t.select(["id_a", "id_b"])

    n_cand = candidates.count()                          # free: materialized
    edges = (
        _join_pair_texts(candidates, sf_dir, _adaptive(n_cand), n_pairs=n_cand)
        .map_batches(verify, batch_format="pyarrow")
        .materialize()                                   # slim int pairs; the
    )                                                    # propagation re-reads per round
    all_ids = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_edges = edges.count()
    if n_edges == 0:
        return all_ids.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "cluster_id": t["doc_id"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
    from ebook_ocr_ray.joins import safe_join

    # auto: exact driver union-find under PROP_DRIVER_MAX edges (the
    # verified edge set is a SMALL side there — broadcast-class data),
    # keyed propagation with adaptive partitioning beyond it
    labels = propagate_labels(
        edges, n_edges=n_edges, num_partitions=_adaptive(n_edges)
    )
    joined = safe_join(
        all_ids, labels,
        on="doc_id", right_on="node",
        num_partitions=num_partitions, join_type="left_outer",
        left_schema=pa.schema([("doc_id", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        label = pa.compute.coalesce(
            t["label"].cast(pa.int64()), t["doc_id"].cast(pa.int64())
        )
        return pa.table({"doc_id": t["doc_id"], "cluster_id": label})

    return joined.map_batches(finish, batch_format="pyarrow")


def simhash_pairs(
    sf_dir: str,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    hot_strategy: str = "auto",
    num_partitions: int = 8,
    spool_dir: str | None = None,
) -> ray.data.Dataset:
    """(id_a, id_b, hamming) near-dup pairs: band blocking over the 64-bit
    simhash sized so recall is GUARANTEED up to ``max_hamming`` (pigeonhole
    needs max_hamming+1 bands; the default 3 -> 4x16-bit bands). Raising
    the threshold automatically narrows the bands (e.g. 7 -> 8x8-bit).

    Buckets over ``max_bucket`` rows take the STAR fallback (same as the
    LSH kernel): the overflow tail pairs only with the bucket's min id
    (logged bounded recall — tail-tail pairs whose only shared bucket is
    the over-cap one are not generated; no row is dropped), so one
    degenerate band key cannot go quadratic, and
    pairs found in several bands are deduped by a hash repartition on
    id_a plus a partition-local drop_duplicates (globally exact: a
    pair's canonical orientation co-locates every occurrence, and its
    hamming is identical in every band) — the result stays a Dataset end
    to end."""
    tables = max_hamming + 1
    max_bucket = MAX_BUCKET if max_bucket is None else max_bucket
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # sentinel print: empty docs never pair
        valid = np.array([bool(t and t.strip()) for t in texts], dtype=bool)
        if not valid.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band": pa.array([], pa.int32()),
                    "key": pa.array([], pa.int64()),
                    "print": pa.array([], pa.uint64()),
                }
            )
        prints = simhash64_batch([t for t, v in zip(texts, valid) if v])
        ids = doc_ids[valid]
        width = 64 // tables
        mask = np.uint64((1 << width) - 1)
        shifts = (np.arange(tables, dtype=np.uint64) * np.uint64(width))
        keys = ((prints[:, None] >> shifts[None, :]) & mask).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, tables), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(tables, dtype=np.int32), len(ids)), pa.int32()
                ),
                "key": pa.array(keys.reshape(-1), pa.int64()),
                "print": pa.array(np.repeat(prints, tables), pa.uint64()),
            }
        )

    def expand_partition(df: pd.DataFrame) -> pd.DataFrame:
        """Pair expansion over hash-co-located buckets (same kernel shape
        as candidate_pair_dataset's, plus the hamming filter on prints):
        boundary-scan the exact (band, key) pair after a lexsort, so the
        shuffle key's collisions can never merge two buckets."""
        band = df["band"].to_numpy(dtype=np.int64, copy=False)
        key = df["key"].to_numpy(dtype=np.int64, copy=False)
        doc = df["doc_id"].to_numpy(dtype=np.int64, copy=False)
        prints_all = df["print"].to_numpy(dtype=np.uint64, copy=False)
        order = np.lexsort((doc, key, band))
        band, key, doc = band[order], key[order], doc[order]
        prints_all = prints_all[order]
        new = np.r_[True, (band[1:] != band[:-1]) | (key[1:] != key[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(band)]
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            ids = doc[s:e]
            prints = prints_all[s:e]
            # de-dup within the bucket (ids sorted by the lexsort): a
            # doc_id duplicated in the input table would otherwise emit
            # self-pairs at hamming 0 — same guard as the LSH kernel
            uniq = np.r_[True, ids[1:] != ids[:-1]]
            ids = ids[uniq]
            prints = prints[uniq]
            n = len(ids)
            if n < 2:
                continue
            ai, bi = np.triu_indices(min(n, max_bucket), 1)
            if n > max_bucket:
                # star fallback beyond the all-pairs cap (see MAX_BUCKET)
                logger.warning(
                    "simhash bucket over cap: band=%s key=%s size=%d > %d — "
                    "star fallback", band[s], key[s], n, max_bucket,
                )
                tail = np.arange(max_bucket, n)
                ai = np.concatenate([ai, np.zeros(len(tail), dtype=np.int64)])
                bi = np.concatenate([bi, tail])
            ham = _hamming64_vec(prints[ai], prints[bi])
            keep = ham <= max_hamming
            out_a.append(ids[ai][keep])
            out_b.append(ids[bi][keep])
            out_h.append(ham[keep])
        if not out_a:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("id_a", "id_b", "hamming")}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    # two consumers (hot-key count pass + pair pass) — pin_reusable keeps
    # the simhash computation single-pass in both modes: materialized
    # bucket rows (spool_dir=None) or scratch-parquet spool (see the
    # matching note in minhash_clusters)
    from ebook_ocr_ray.state.spool import pin_reusable

    schema = pa.schema(
        [("doc_id", pa.int64()), ("band", pa.int32()), ("key", pa.int64()),
         ("print", pa.uint64())]
    )
    buckets = pin_reusable(
        docs.map_batches(explode, batch_format="pyarrow"),
        spool_dir,
        "simhash_buckets",
        schema=schema,
    )
    # vectorized multi-member-bucket prefilter (see hot_filtered_buckets)
    filtered, n_hot = hot_filtered_buckets(
        buckets.read(), schema, hot_strategy, num_partitions=num_partitions,
        n_rows=buckets.n_rows,              # free in both modes
        with_hot_count=True,
        # count pass never needs the 8-byte print or doc_id columns
        count_buckets=buckets.read(columns=["band", "key"]),
    )
    if filtered is None:
        return ray.data.from_arrow(
            pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        )

    # same two-stage hash-partition shape as candidate_pair_dataset:
    # bucket co-location + per-partition expansion kernel, then pair
    # dedup by source id. A pair's hamming is a function of the two full
    # prints — identical in every band it co-occurs in — so keeping any
    # one occurrence per (id_a, id_b) IS the Min.
    from ebook_ocr_ray.groups import map_partitions_typed

    pair_parts = _pair_partitions(num_partitions, n_hot)
    pairs = map_partitions_typed(
        filtered.map_batches(_add_bkey, batch_format="pyarrow"),
        "bkey",
        expand_partition,
        schema=pa.schema(list(schema) + [pa.field("bkey", pa.int64())]),
        empty_fn=lambda: pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("id_a", "id_b", "hamming")}
        ),
        num_partitions=pair_parts,
    )

    def dedup_partition(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b", "hamming"]]
        return out.astype(
            {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
        )

    return map_partitions_typed(
        pairs,
        "id_a",
        dedup_partition,
        schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("hamming", pa.int64())]
        ),
        empty_fn=lambda: pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("id_a", "id_b", "hamming")}
        ),
        num_partitions=pair_parts,
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (the non-sketch member of the dedup family)
# --------------------------------------------------------------------------

# Posting lists longer than this are dropped as stop-shingles before pair
# generation (logged): a shingle shared by B documents contributes B^2/2
# candidate pairs, and a boilerplate shingle ("all rights reserved ...")
# would pull the corpus quadratic. Dropping it REMOVES its +1 from every
# affected pair's intersection — an explicit bounded-recall valve, exactly
# like MAX_BUCKET. The SQL oracle assumes no posting list overflows (true
# at oracle scale: corpus 500 < cap).
JACCARD_DF_CAP = 512


def jaccard_dup_pairs(
    sf_dir: str,
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    df_cap: int = JACCARD_DF_CAP,
    spool_dir: str | None = None,
) -> ray.data.Dataset:
    """EXACT k-word-shingle Jaccard near-dup pairs via an inverted-index
    join — no sketches, no sampling: (id_a, id_b, inter, un) for every
    doc pair with |A∩B| / |A∪B| >= threshold_num/threshold_den (compared
    as integers — ``den*inter >= num*union`` — so no float boundary can
    disagree with the oracle).

        shingle rows (doc_id, 63-bit shingle key), per-doc DISTINCT
          -> groupby shingle -> pairs within each posting list (df-capped)
          -> per-pair intersection count (typed keyed sum)
          -> two keyed joins onto the per-doc set sizes -> threshold

    Set sizes are exact (counted from the distinct string set before
    hashing). Cross-doc key collisions could in principle inflate an
    intersection by 1; at 63 bits that is ~n^2/2^64 and DETERMINISTIC —
    the driver's value-hash equality against the string-exact SQL oracle
    is the proof it never fires at oracle scale."""
    from ebook_ocr_ray.functions.textstats import stable_hash63, word_shingles
    from ebook_ocr_ray.groups import typed_keyed_sum
    from ebook_ocr_ray.joins import safe_join

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def shingle_rows(batch: pa.Table) -> pa.Table:
        # (band=0, key, doc_id) — the bucket schema, so the near-dup
        # hot-bucket machinery applies verbatim: only shingles shared by
        # >= 2 docs can generate a pair, and they are a small fraction of
        # all shingles, so the expensive per-posting-list group apply
        # runs on the filtered slice only
        ids, keys = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = set(word_shingles(t or "", k))
            ids.extend([d] * len(sh))
            # no sort: key routing and the keyed reduces are all
            # order-independent
            keys.extend(stable_hash63(s) for s in sh)
        return pa.table(
            {
                "band": pa.array(np.zeros(len(ids), dtype=np.int32), pa.int32()),
                "key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    def partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """One vectorized kernel per hash partition: pandas self-merge on
        the shingle key emits a row per (shared shingle, doc pair), then a
        local groupby pre-combines the intersection counts. All C-level;
        a per-posting-list apply here costs Python overhead per key."""
        sizes = df.groupby("key", sort=False)["doc_id"].size()
        over = sizes[sizes > df_cap]
        if len(over):
            logger.warning(
                "jaccard posting lists over cap: %d shingles with df > %d "
                "(max %d) dropped (stop-shingles; bounded recall, see "
                "JACCARD_DF_CAP)", len(over), df_cap, int(over.max()),
            )
            df = df[~df.key.isin(over.index)]
        m = df.merge(df, on="key")
        m = m[m.doc_id_x < m.doc_id_y]
        out = (
            m.groupby(["doc_id_x", "doc_id_y"], sort=False)
            .size()
            .rename("c")
            .reset_index()
            .rename(columns={"doc_id_x": "id_a", "doc_id_y": "id_b"})
        )
        return out[["id_a", "id_b", "c"]].astype("int64")

    bucket_schema = pa.schema(
        [("band", pa.int32()), ("key", pa.int64()), ("doc_id", pa.int64())]
    )
    # shingle ONCE: the rows feed three consumers (hot count, hot filter,
    # per-doc set sizes) — without pinning, each re-executes the
    # full-corpus word_shingles + md5 pass. spool_dir=None materializes
    # (slim int rows, spillable — but ~one row per word-shingle per doc,
    # comparable to the corpus itself at web scale); a scratch path spools
    # them to parquet so the sizes pass re-reads ONLY the doc_id column
    # and the object store never carries the shingle set whole.
    from ebook_ocr_ray.state.spool import pin_reusable

    srows = pin_reusable(
        docs.map_batches(shingle_rows, batch_format="pyarrow"),
        spool_dir,
        "jaccard_shingles",
        schema=bucket_schema,
    )
    filtered = hot_filtered_buckets(
        srows.read(), bucket_schema, n_rows=srows.n_rows,
        count_buckets=srows.read(columns=["band", "key"]),
    )
    if filtered is None:  # every shingle is a singleton: no pairs at all
        return ray.data.from_arrow(
            pa.schema(
                [("id_a", pa.int64()), ("id_b", pa.int64()),
                 ("inter", pa.int64()), ("un", pa.int64())]
            ).empty_table()
        )
    from ebook_ocr_ray.groups import map_partitions_typed

    from ebook_ocr_ray.joins import filler_if_empty

    pair_rows = map_partitions_typed(
        # filler_if_empty: the hot filter empties most blocks on a clean
        # corpus; the sentinel-keyed filler keeps those task outputs
        # typed, and the wrapped fn's sentinel filter drops it (null-key
        # rows from the join branch's bkey filler drop there too)
        filtered.map_batches(
            lambda t: filler_if_empty(t.select(["key", "doc_id"]), "key"),
            batch_format="pyarrow",
        ),
        "key",
        partition_pairs,
        schema=pa.schema([("key", pa.int64()), ("doc_id", pa.int64())]),
        empty_fn=lambda: pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("id_a", "id_b", "c")}
        ),
        # FIXED count, unlike the LSH/simhash pair stages: their n_rows
        # (docs x bands) tracks pair volume, but total shingle rows do
        # not — the hot filter leaves only SHARED shingles (a tiny
        # fraction) and JACCARD_DF_CAP bounds each posting list, so
        # scaling partitions by srows.n_rows over-partitions ~10x
        # (measured 39.9s -> 151.4s at 320k docs / 17M shingle rows on
        # this boot). Memory per partition is bounded by the df-capped
        # slice, not the corpus.
        num_partitions=8,
    )

    inter = typed_keyed_sum(
        pair_rows,
        ["id_a", "id_b"],
        ["c"],
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("c", pa.int64())]),
        num_partitions=4,
    )

    # per-doc set sizes from the SAME pinned shingle rows (they are
    # per-doc distinct by construction): a keyed count, not a re-shingle
    # — and in spool mode a doc_id-only column-pruned read
    def size_partial(t: pa.Table) -> pa.Table:
        ids, counts = np.unique(
            t["doc_id"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n": pa.array(counts.astype(np.int64), pa.int64())}
        )

    def size_reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", sort=False)["n"].sum().reset_index()
        return out.rename(columns={"n": "nsh"}).astype(
            {"doc_id": "int64", "nsh": "int64"}
        )

    sizes = map_partitions_typed(
        srows.read(columns=["doc_id"]).map_batches(
            size_partial, batch_format="pyarrow"
        ),
        "doc_id",
        size_reduce,
        schema=pa.schema([("doc_id", pa.int64()), ("n", pa.int64())]),
        empty_fn=lambda: pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "nsh": pd.Series(dtype="int64")}
        ),
        num_partitions=4,
    ).materialize()      # per-doc rows (2 int64/doc): both joins consume it
    sizes_schema = pa.schema([("doc_id", pa.int64()), ("nsh", pa.int64())])

    j1 = safe_join(
        inter,
        sizes,
        on="id_a",
        right_on="doc_id",
        num_partitions=4,
        left_schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("c", pa.int64())]
        ),
        right_schema=sizes_schema,
    ).map_batches(
        lambda t: pa.table(
            {"id_a": t["id_a"], "id_b": t["id_b"], "c": t["c"], "na": t["nsh"]}
        ),
        batch_format="pyarrow",
    )
    j2 = safe_join(
        j1,
        sizes,
        on="id_b",
        right_on="doc_id",
        num_partitions=4,
        left_schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("c", pa.int64()),
             ("na", pa.int64())]
        ),
        right_schema=sizes_schema,
    )

    def finish(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        un = (
            t["na"].to_numpy(zero_copy_only=False)
            + t["nsh"].to_numpy(zero_copy_only=False)
            - c
        )
        keep = threshold_den * c >= threshold_num * un
        out = pa.table(
            {
                "id_a": t["id_a"],
                "id_b": t["id_b"],
                "inter": pa.array(c, pa.int64()),
                "un": pa.array(un, pa.int64()),
            }
        )
        return out.filter(pa.array(keep, pa.bool_()))

    return j2.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Exact-dedup -> LSH cascade (the prescribed pipeline order for
# dup-saturated corpora): collapse byte-identical groups FIRST, run the
# near-dup machinery on the survivors only, then re-attach every exact
# duplicate to its representative's cluster. On a mirror-heavy corpus
# this removes the duplicated mass BEFORE pair generation — the measured
# failure mode it prevents: a 256-way-duplicated 1.28M-doc corpus forms
# buckets of 256 (below MAX_BUCKET, so not capped) and ~163M TRUE
# candidate pairs; after exact dedup the same corpus is 5,000 survivors.
# Output is VALUE-IDENTICAL to minhash_clusters on the full corpus
# whenever no bucket overflows MAX_BUCKET (identical texts share every
# shingle, so exact-dup groups are sub-cliques of near-dup components,
# and each representative is its group's min id — the component minimum
# is unchanged); the query shares minhash_clusters' oracle for exactly
# that reason, and the oracle precondition (no overflow) is the same.
# Past the cap the two paths legitimately diverge IN THE CASCADE'S
# FAVOR: the full run's star fallback drops edges that the smaller
# post-dedup buckets retain, so the cascade has strictly better recall
# on mirror-heavy corpora — equality is an at-oracle-scale contract,
# not a universal one.
# --------------------------------------------------------------------------


def _fuzzy_text_keys(texts: list) -> "np.ndarray":
    """int63 normalized-text keys — EXACTLY dedup_fuzzy_exact_ds's key
    recipe (analytics.py): stable_hash64(fuzzy_normalize(text)). None
    normalizes to '' like the fuzzy dedup does."""
    from ebook_ocr_ray.functions.textstats import stable_hash63
    from ebook_ocr_ray.pipelines.analytics import fuzzy_normalize

    return np.fromiter(
        (stable_hash63(fuzzy_normalize(t)) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )


def minhash_clusters_cascade(
    sf_dir: str,
    scratch_dir: str | None = None,
    fuzzy: bool = False,
    **minhash_kwargs,
) -> ray.data.Dataset:
    """(doc_id, cluster_id) for every document via exact-dedup ->
    survivor spool -> minhash_clusters(survivors) -> keyed re-attach.
    ``scratch_dir`` holds the survivor spool (fresh tmp dir when None;
    caller-owned lifetime otherwise, the extraction-spool contract).

    ``fuzzy=True`` collapses by NORMALIZED text (the dedup_fuzzy_exact
    key: lower -> strip non-[a-z0-9 ] -> collapse spaces) instead of
    byte identity, so case/punctuation-variant mirror farms — which
    byte-exact dedup cannot touch and which saturate LSH buckets just
    like byte mirrors — collapse pre-LSH too.

    Equality contract vs plain minhash_clusters (value-identical output),
    stated precisely. Byte-exact cascade: holds whenever no LSH bucket
    overflows MAX_BUCKET in the plain run (identical texts share every
    shingle, so exact-dup groups are sub-cliques of near-dup components
    and each representative is its group's min id). Fuzzy cascade: holds
    under the same no-overflow condition PLUS, for every
    normalization-equal (but not byte-equal) pair, (a) the plain run
    detects-and-verifies it as a near-dup edge (guaranteed when
    normalization-equal => shingle-equal; otherwise requires raw Jaccard
    >= threshold and a shared band), and (b) the variants contribute no
    edge to any doc OUTSIDE their fuzzy group that their representative's
    own text does not (again guaranteed by shingle-equality). Corpora
    violating (a)/(b) — e.g. heavy per-variant rewrites — legitimately
    diverge: the fuzzy cascade clusters normalization-equal docs that
    plain LSH would miss, a strictly-better-recall outcome for mirror
    farms, not an error."""
    import os
    import shutil
    import tempfile
    import uuid

    from ebook_ocr_ray.joins import safe_join
    from ebook_ocr_ray.pipelines.analytics import dedup_exact_docs
    from ebook_ocr_ray.pipelines.incremental import _snapshot_survivors

    own_scratch = scratch_dir is None
    if own_scratch:
        scratch_dir = tempfile.mkdtemp(prefix=f"minhash_cascade_{uuid.uuid4().hex[:8]}_")
    table_dir = os.path.join(scratch_dir, "documents.parquet")
    # atomic O_EXCL claim, not a bare emptiness check: two concurrent
    # cascades sharing a scratch_dir could both pass check-then-act and
    # write_parquet APPENDS — the survivor table would silently double
    # (state/spool.py's claim discipline, same as every other spool)
    from ebook_ocr_ray.state.spool import claim_spool_target, release_spool_claim

    claim_spool_target(table_dir)
    try:
        docs = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        key_fn = _fuzzy_text_keys if fuzzy else None   # None -> byte-exact

        # pass 1: survivors spooled as a documents table the untouched
        # minhash path can read. Byte-exact mode keeps the measured
        # broadcast dup-groups-only filter (dedup_exact_docs); fuzzy mode
        # derives survivors from the keyed survivor aggregate + a keyed
        # semi-join back onto the snapshot for their full rows (the reps
        # table is reused by pass 3 — computed once).
        # reps materialized in BOTH modes: slim (two int64 per distinct
        # text), and a lazy hash-repartition lineage cannot be unioned
        # with the join's sentinel rows (shuffle-strategy context clash)
        reps = _snapshot_survivors(docs, key_fn=key_fn).map_batches(
            lambda t: t.rename_columns(["rkey", "rep"]), batch_format="pyarrow"
        ).materialize()
        if fuzzy:
            surv_ids = reps.map_batches(
                lambda t: pa.table({"sid": t["rep"].cast(pa.int64())}),
                batch_format="pyarrow",
            )
            safe_join(
                docs, surv_ids,
                on="doc_id", right_on="sid", num_partitions=8,
                left_schema=pa.schema(
                    [("doc_id", pa.int64()), ("text", pa.string())]
                ),
                right_schema=pa.schema([("sid", pa.int64())]),
            ).map_batches(
                lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
            ).write_parquet(table_dir)
        else:
            dedup_exact_docs(sf_dir).write_parquet(table_dir)

        # pass 2: near-dup clusters over survivors only
        surv_clusters = minhash_clusters(scratch_dir, **minhash_kwargs).materialize()

        # pass 3: every doc -> its representative (keyed survivor agg +
        # hash join on the 63-bit key; no driver state) -> the
        # representative's cluster
        def key_rows(t: pa.Table) -> pa.Table:
            # the SAME key recipe as the reps aggregate above (one
            # canonical string->int63 hash per mode; any drift breaks
            # the rep join silently)
            from ebook_ocr_ray.pipelines.incremental import _text_keys

            kf = key_fn or _text_keys
            return pa.table(
                {
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "key": pa.array(kf(t["text"].to_pylist()), pa.int64()),
                }
            )

        with_rep = safe_join(
            docs.map_batches(key_rows, batch_format="pyarrow"),
            reps,
            on="key",
            right_on="rkey",
            num_partitions=8,
            left_schema=pa.schema([("doc_id", pa.int64()), ("key", pa.int64())]),
            right_schema=pa.schema([("rkey", pa.int64()), ("rep", pa.int64())]),
        )
        clusters_renamed = surv_clusters.map_batches(
            lambda t: t.rename_columns(["sdoc", "cluster_id"]),
            batch_format="pyarrow",
        )
        out = safe_join(
            with_rep.map_batches(
                lambda t: t.select(["doc_id", "rep"]), batch_format="pyarrow"
            ),
            clusters_renamed,
            on="rep",
            right_on="sdoc",
            num_partitions=8,
            left_schema=pa.schema([("doc_id", pa.int64()), ("rep", pa.int64())]),
            right_schema=pa.schema([("sdoc", pa.int64()), ("cluster_id", pa.int64())]),
        ).map_batches(
            lambda t: t.select(["doc_id", "cluster_id"]), batch_format="pyarrow"
        )
        # the joins consume the spool lazily: force execution before the
        # scratch dir can be deleted. The claim releases only on SUCCESS
        # — a crashed run leaves it behind on purpose (its directory
        # state is unknown; the spool.py discipline)
        release_spool_claim(table_dir)
        return out.materialize() if own_scratch else out
    finally:
        if own_scratch:
            shutil.rmtree(scratch_dir, ignore_errors=True)
