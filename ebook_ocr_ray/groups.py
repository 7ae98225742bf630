"""Warning-free group-apply for LOW-CARDINALITY int64 keys.

``ds.groupby(key).map_groups(fn)`` is sort-shuffle based: when the sort
produces more output partitions than there are distinct key values (a
16-bucket key over a 64-block corpus guarantees it), the empty
partitions surface as schema-less empty blocks, and every one of them
triggers Ray's "Operator produced a RefBundle with a different schema"
warning (ray/data/_internal/execution/streaming_executor_state.py:793)
— the untyped block is built by the map operator when a task's input
bundle holds no rows, so returning typed empties from the UDF cannot
fix it.

``map_groups_typed`` keeps the exact per-group semantics but removes
the failure mode by construction:

- co-location is a HASH repartition on the key (+ in-partition sort),
  not a global sort — ``num_partitions`` is explicit and sized to the
  key cardinality instead of the block count;
- one sentinel row per partition (key below ``joins.SENTINEL_CEILING``,
  placed with the same replicated hash function ``joins.sentinel_keys``
  uses for the join operator — ray/data/_internal/arrow_ops/
  transform_pyarrow.py:70-97) guarantees no map task ever sees an
  empty input bundle;
- the group-apply wrapper filters the sentinels back out and yields a
  TYPED empty batch when a partition carried nothing else.

Only int64 keys are supported (string keys hash process-dependently —
see joins.py). High-cardinality groupbys (urls, users, hashes) should
keep using ``groupby().map_groups``: their sort partitions are
statistically dense and the sort path needs no cap choice.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa
import ray.data

from ebook_ocr_ray.joins import SENTINEL_CEILING, _sentinel_table, sentinel_keys


def _out_arrow(out):
    """Normalize a group-apply output to a metadata-free Arrow table:
    ``Table.from_pandas`` attaches a b'pandas' schema-metadata blob that
    makes the schema UNHASHABLE, and every downstream shuffle aggregator
    then logs "Failed to hash the schemas (for deduplication)" per
    block. Emitting clean Arrow here silences the whole chain."""
    if isinstance(out, pd.DataFrame):
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
    if isinstance(out, pa.Table) and out.schema.metadata:
        return out.replace_schema_metadata(None)
    return out


def _make_wrapped(fn, key: str, batch_format: str, empty_fn):
    from ray.data.grouped_data import _apply_udf_to_groups

    def wrapped(block):
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        # strip the per-partition sentinel rows (order-preserving filter,
        # so the in-partition key sort — and hence the group boundary
        # scan — stays valid)
        t = t.filter(pa.compute.greater_equal(t[key], SENTINEL_CEILING + 1))
        n = 0
        if len(t):
            for out in _apply_udf_to_groups(fn, t, [key], batch_format):
                n += 1
                yield _out_arrow(out)
        if n == 0:
            yield _out_arrow(empty_fn())

    # module-level factory (not a closure over Dataset objects) so the task
    # payload pickles small — the same serializability rule Ray's own
    # map_groups wrapper follows (ray/data/grouped_data.py:260-280)
    return wrapped


def map_groups_typed(
    ds: ray.data.Dataset,
    key: str,
    fn: Callable,
    *,
    schema: pa.Schema,
    empty_fn: Callable[[], "pd.DataFrame | pa.Table"],
    num_partitions: int,
    batch_format: str = "pandas",
) -> ray.data.Dataset:
    """Drop-in for ``ds.groupby(key).map_groups(fn, batch_format=...)``
    for low-cardinality int64 keys.

    ``schema``: the Arrow schema of ``ds`` rows (needed to build typed
    sentinel rows without triggering a partial execution).
    ``empty_fn``: zero-row batch in ``fn``'s OUTPUT format/dtypes —
    yielded for partitions that carried only sentinels, so every block
    this stage emits is schema-typed.
    ``num_partitions``: size to the key cardinality (>= cardinality is
    wasteful but safe; a fraction of it trades parallelism for block
    size)."""
    assert schema.field(key).type == pa.int64(), "map_groups_typed needs int64 keys"
    from ray.data.context import ShuffleStrategy

    sent = ray.data.from_arrow(
        _sentinel_table(schema, key, sentinel_keys(num_partitions))
    )
    # keyed repartition is only wired for the hash-shuffle strategy, and
    # the check reads the CHAIN's captured context at execution time, so
    # the flip goes on ``ds.context`` (not the process-global context —
    # that would leak into unrelated pipelines). Caveat: any shuffle
    # upstream in the SAME chain also becomes hash-based; callers here
    # feed pure map chains (read -> map_batches), where the strategy is
    # irrelevant.
    shuffled = ds.union(sent)
    shuffled.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    shuffled = shuffled.repartition(num_partitions, keys=[key], sort=True)
    return shuffled.map_batches(
        _make_wrapped(fn, key, batch_format, empty_fn),
        batch_size=None,
        batch_format=None,
    )


def typed_keyed_sum(
    partials: ray.data.Dataset,
    key_cols: list[str],
    sum_cols: list[str],
    partials_schema: pa.Schema,
    num_partitions: int = 4,
) -> ray.data.Dataset:
    """Warning-free keyed Sum for LOW-cardinality keys of any dtype.

    The sort-based ``groupby().aggregate(Sum...)`` emits one schema-less
    empty bundle per unpopulated output partition — guaranteed whenever
    distinct keys < input block count (a 6-group pricing rollup over a
    64-block corpus always warns). This routes the reduce through
    ``map_groups_typed`` on a 63-bit surrogate hash of the key tuple:
    the per-partition sentinel rows make empty input bundles impossible,
    and a surrogate-hash collision between distinct key tuples is
    resolved by the in-group pandas groupby over the TRUE key columns
    (it simply emits both rows). Output columns are key_cols + sum_cols,
    value- and dtype-identical to the built-in aggregate.

    Meant for partial-combiner outputs (slim rows, few distinct keys).
    High-cardinality keys should keep the built-in aggregate: its sort
    partitions are dense and it avoids hashing every key tuple."""
    import hashlib

    def add_skey(t: pa.Table) -> pa.Table:
        cols = [t[c].to_pylist() for c in key_cols]
        skeys = [
            int.from_bytes(
                hashlib.md5(
                    "\x1f".join(repr(v) for v in row).encode("utf-8")
                ).digest()[:8],
                "little",
            )
            & ((1 << 63) - 1)
            for row in zip(*cols)
        ]
        return t.append_column("skey", pa.array(skeys, pa.int64()))

    def group_fn(g: "pd.DataFrame") -> "pd.DataFrame":
        out = (
            g.groupby(key_cols, sort=False, dropna=False)[sum_cols]
            .sum()
            .reset_index()
        )
        return out[key_cols + sum_cols]

    def empty_fn() -> pa.Table:
        # an ARROW empty table, not an empty pandas frame: an empty object
        # Series (the pandas dtype of a string column) infers Arrow type
        # `null` under from_pandas, which would reintroduce exactly the
        # schema-mismatch bundles this module exists to eliminate
        return pa.schema(
            [partials_schema.field(c) for c in key_cols]
            + [pa.field(c, pa.int64()) for c in sum_cols]
        ).empty_table()

    schema = pa.schema(
        [partials_schema.field(c) for c in key_cols + sum_cols]
        + [pa.field("skey", pa.int64())]
    )
    keyed = partials.map_batches(
        lambda t: add_skey(t.select(key_cols + sum_cols)), batch_format="pyarrow"
    )
    # per-PARTITION application: the in-partition pandas groupby already
    # reduces every key tuple at once, so a per-group apply would only
    # add Python overhead per distinct key (measured 7s for 11k keys)
    return map_partitions_typed(
        keyed,
        "skey",
        group_fn,
        schema=schema,
        empty_fn=empty_fn,
        num_partitions=num_partitions,
    )


def map_partitions_typed(
    ds: ray.data.Dataset,
    key: str,
    fn: Callable,
    *,
    schema: pa.Schema,
    empty_fn: Callable[[], "pd.DataFrame | pa.Table"],
    num_partitions: int,
) -> ray.data.Dataset:
    """Hash-partition by ``key`` (int64) and apply ``fn`` once per
    PARTITION — all rows of a key co-located in one pandas frame — with
    the same sentinel/typed-empty machinery as ``map_groups_typed``.

    For vectorized whole-partition kernels (a pandas self-merge, a numpy
    matmul over many small groups) where a per-group apply would pay
    Python call + frame-construction overhead per key. ``fn`` must
    handle multiple keys per frame itself (groupby/merge inside)."""
    assert schema.field(key).type == pa.int64(), "map_partitions_typed needs int64 keys"
    from ray.data.context import ShuffleStrategy

    sent = ray.data.from_arrow(
        _sentinel_table(schema, key, sentinel_keys(num_partitions))
    )
    shuffled = ds.union(sent)
    shuffled.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    shuffled = shuffled.repartition(num_partitions, keys=[key], sort=False)

    def wrapped(block):
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        t = t.filter(pa.compute.greater_equal(t[key], SENTINEL_CEILING + 1))
        if len(t) == 0:
            yield _out_arrow(empty_fn())
            return
        yield _out_arrow(fn(t.to_pandas()))

    return shuffled.map_batches(wrapped, batch_size=None, batch_format=None)
