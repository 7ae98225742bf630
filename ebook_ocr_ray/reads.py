"""Metadata-clean parquet reads.

Parquet files written through pandas carry a ``b'pandas'`` blob in the
Arrow schema metadata. A schema with metadata is UNHASHABLE
(``hash(schema)`` raises "unhashable type: 'dict'"), so every
sort/join/shuffle reduce that tries to dedup its input schemas
(ray/data/_internal/arrow_ops/transform_pyarrow.py:175-181) logs a
"Failed to hash the schemas (for deduplication)" warning per task AND
loses the early-exit fast path, re-unifying schemas on every concat.

``read_parquet_clean`` strips the metadata right at the read — a
metadata-only table rewrite (zero-copy on the data buffers) that fuses
into the read stage. Use it everywhere a read feeds a shuffle, join, or
sort; plain ``ray.data.read_parquet`` remains fine for reads that only
flow through maps emitting freshly-built tables.

Caveat: the fused map means ``ds.count()`` can no longer answer from
file metadata alone — call sites that count a bare read should keep the
plain read. The ReadParquet task itself may still log the warning once
per file when IT concatenates row-group tables (before any user code
runs); that residue is Ray-internal and harmless.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(paths, **kwargs) -> ray.data.Dataset:
    return ray.data.read_parquet(paths, **kwargs).map_batches(
        _strip_meta, batch_format="pyarrow"
    )


def parquet_num_rows(path: str) -> int:
    """Row count from parquet FOOTERS only (no data read), handling both a
    single file and a directory of files (the spooled-table layout that a
    bare ``pq.ParquetFile(path)`` chokes on). Non-parquet siblings
    (markers, manifests) are skipped; nested dirs (hive layouts) walk."""
    import os

    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        return pq.read_metadata(path).num_rows
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total
