"""Hash-join helper immune to empty shuffle partitions.

Ray 2.49's ``Dataset.join`` crashes when a hash partition receives zero
rows on either side: ``JoinAggregator.finalize`` builds the partition
from the blocks it received, an empty builder yields a 0-column table,
and the Arrow join then fails with "No match ... for key field reference"
(ray/data/_internal/execution/operators/join.py:103-126). At corpus
scale every partition is statistically populated and the operator is the
right tool; at small or sparse key scale (candidate pairs, label tables,
tiny test corpora) empty partitions are routine.

``safe_join`` makes emptiness impossible by construction: it appends ONE
sentinel row per partition per side, keyed by integers below
``SENTINEL_CEILING`` (-2^61 — far outside any realistic id space, so
ordinary negative keys still work), and filters sentinel rows from the
output. Sentinel keys are found by replicating the shuffle's placement
function — it hashes a tuple of pyarrow scalars modulo the partition
count (ray/data/_internal/arrow_ops/transform_pyarrow.py:70-97) and
CPython integer hashing is PYTHONHASHSEED-independent, so driver-side
probing predicts worker-side placement exactly. Only int64 keys are
supported (string hashing IS seed-dependent across processes).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

_MAX_PROBE = 1_000_000

# Sentinel keys live strictly below this; rows with keys >= it are real.
# int64 spans +-9.2e18, so any id scheme using values above -2.3e18 — i.e.
# every realistic one, including signed hashes of up to 61 bits — is safe.
SENTINEL_CEILING = -(2**61)


def sentinel_keys(num_partitions: int) -> list[int]:
    """int64 keys below SENTINEL_CEILING covering every partition once."""
    need = set(range(num_partitions))
    out: list[int] = []
    k = SENTINEL_CEILING - 1
    while need:
        pid = hash((pa.scalar(k, pa.int64()),)) % num_partitions
        if pid in need:
            need.remove(pid)
            out.append(k)
        k -= 1
        if k < SENTINEL_CEILING - _MAX_PROBE:  # pragma: no cover
            raise RuntimeError(f"could not cover {len(need)} partitions")
    return out


def _sentinel_table(schema: pa.Schema, key_col: str, keys: list[int]) -> pa.Table:
    """One row per sentinel key; every non-key column is null."""
    arrays = []
    for field in schema:
        if field.name == key_col:
            arrays.append(pa.array(keys, pa.int64()))
        else:
            arrays.append(pa.nulls(len(keys), field.type))
    return pa.Table.from_arrays(arrays, schema=pa.schema(schema))


def filler_if_empty(t: pa.Table, key_col: str) -> pa.Table:
    """Typed one-row stand-in for an entirely-empty map output.

    Ray's map tasks drop empty output blocks, so a task whose filter
    removed every row emits a zero-block, schema-less RefBundle, and the
    executor logs a schema-divergence warning for the operator
    (streaming_executor_state.py:286,793). Returning one sentinel-keyed
    row instead keeps every bundle typed at zero semantic cost: the key
    sits below ``SENTINEL_CEILING``, so whichever sentinel-aware stage
    consumes the stream next (``map_partitions_typed`` /
    ``map_groups_typed`` wrappers, ``safe_join``'s drop_sentinels)
    filters it with the machinery it already runs. Only use upstream of
    such a stage, keyed on the column that stage filters."""
    if len(t):
        return t
    return _sentinel_table(t.schema, key_col, [SENTINEL_CEILING - 1])


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))


def safe_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str,
    num_partitions: int,
    join_type: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    drop_sentinels: bool = True,
) -> ray.data.Dataset:
    """``left.join(right)`` on a single int64 key, guaranteed safe for any
    key sparsity. Supports "inner" and "left_outer". Costs one extra row
    per partition per side plus one output filter — negligible against
    the shuffle itself.

    Pass ``left_schema``/``right_schema`` explicitly when the side is a
    lazy multi-stage dataset: ``Dataset.schema()`` on those triggers a
    partial execution whose work is then thrown away.

    ``drop_sentinels=False`` returns the RAW join output — sentinel rows
    included — for callers whose next map stage filters AND refills
    itself. Rationale: Ray skips fused UDFs on empty intermediate
    batches, so a caller UDF placed after the built-in filter never runs
    on a partition the filter emptied and cannot emit its
    ``filler_if_empty`` row; with the raw output, every join partition
    carries at least its sentinel-pair row (matched sentinel keys exist
    on both sides, surviving inner AND left_outer), so the caller's UDF
    always runs. The caller MUST drop rows with ``on`` <
    ``SENTINEL_CEILING + 1`` (null-safe: pa.compute.greater_equal
    propagates null to dropped)."""
    assert join_type in ("inner", "left_outer")
    keys = sentinel_keys(num_partitions)
    lschema = left_schema if left_schema is not None else _arrow_schema(left)
    rschema = right_schema if right_schema is not None else _arrow_schema(right)
    assert lschema.field(on).type == pa.int64(), "safe_join needs int64 keys"
    assert rschema.field(right_on).type == pa.int64(), "safe_join needs int64 keys"
    left_s = left.union(
        ray.data.from_arrow(_sentinel_table(lschema, on, keys))
    )
    right_s = right.union(
        ray.data.from_arrow(_sentinel_table(rschema, right_on, keys))
    )
    joined = left_s.join(
        right_s,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
    )
    if not drop_sentinels:
        return joined

    def _drop_sentinels(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.greater_equal(t[on], SENTINEL_CEILING + 1))

    return joined.map_batches(_drop_sentinels, batch_format="pyarrow")
