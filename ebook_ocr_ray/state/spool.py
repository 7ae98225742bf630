"""Spool-or-materialize for multiply-consumed slim intermediates.

Several pipelines compute a slim row set once and consume it several
times (LSH bucket rows: hot count + pair pass; jaccard shingle rows:
hot count + pair pass + per-doc sizes; quality scored rows: threshold
histogram + bucket attach). Two honest ways to make that reuse cheap:

- ``materialize()``: the rows live (spillable) in the object store and
  every consumer reads them for free. Right at bench scale — but the
  intermediate is O(corpus), so at 100 TB it means the object store
  carries a corpus-sized working set for the pipeline's whole lifetime.
- spool to scratch parquet: one streaming write, then each consumer is
  a fresh lazy read — COLUMN-PRUNED where the consumer wants fewer
  columns, which a materialized dataset cannot offer. The object store
  only ever holds in-flight blocks. Right at corpus scale; costs one
  local-scratch write + a re-read per consumer.

``pin_reusable`` picks by ``spool_dir`` (None -> materialize), matching
``extraction_pipeline(spool_dir=)``'s contract: the caller owns the
scratch directory's lifetime and must not delete it before the LAST
consumer has executed. Reference analog: the stage-directory IR economy
of /root/reference/src/layout/detector.py:168-205 (persist once, re-read
cheaply).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


class ReusableRows:
    """A multiply-consumable slim row set: ``read()`` returns a dataset
    over the SAME rows each call — a no-op view in materialize mode, a
    fresh (optionally column-pruned) parquet read in spool mode.
    ``n_rows`` is free in both modes (materialized count / footers)."""

    def __init__(self, ds: ray.data.Dataset, n_rows: int, path: str | None = None):
        self._ds = ds
        self.n_rows = n_rows
        self.path = path

    def read(self, columns: list[str] | None = None) -> ray.data.Dataset:
        if self.path is not None:
            from ebook_ocr_ray.reads import read_parquet_clean

            return read_parquet_clean(self.path, columns=columns)
        if columns is None:
            return self._ds
        return self._ds.select_columns(columns)


def claim_spool_target(path: str) -> None:
    """Claim ``path`` as a fresh spool target, atomically. write_parquet
    APPENDS (Ray 2.49 SaveMode.APPEND), so a reused — or concurrently
    claimed — directory would silently double the rows. The dirty check
    alone is check-then-act (two racing runs both see empty and both
    write); an O_EXCL sibling claim file (``{path}.claim`` — OUTSIDE the
    data dir, so parquet readers never see it) is the atomic arbiter:
    exactly one claimer wins, everyone else gets the ValueError."""
    path = os.path.normpath(path)
    if os.path.isdir(path) and os.listdir(path):
        raise ValueError(
            f"spool target {path!r} is not empty — write_parquet appends, "
            "so reuse would double the rows; pass a fresh scratch path"
        )
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    try:
        fd = os.open(f"{path}.claim", os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise ValueError(
            f"spool target {path!r} is already claimed ({path}.claim "
            "exists: a crashed run's leftover, or a concurrent claimer) "
            "— pass a fresh scratch path"
        ) from None
    os.makedirs(path, exist_ok=True)


def release_spool_claim(path: str) -> None:
    """Release the O_EXCL claim after the spool WRITE completes. The
    claim only arbitrates the write; once the data directory is
    non-empty the dirty check in ``claim_spool_target`` is what refuses
    reuse. Releasing means a user who cleans the data directory can
    re-run with the same path without also hunting down the ``.claim``
    sibling (a crashed run still leaves its claim behind, on purpose —
    its directory state is unknown)."""
    try:
        os.remove(f"{os.path.normpath(path)}.claim")
    except FileNotFoundError:
        pass


def pin_reusable(
    ds: ray.data.Dataset,
    spool_dir: str | None,
    name: str,
    schema: pa.Schema,
) -> ReusableRows:
    """Execute ``ds`` once and make its rows cheaply re-readable.

    ``spool_dir=None``: ``materialize()`` (object-store residency,
    bench-scale default — behavior unchanged from the pre-spool code).
    Otherwise the rows stream into ``{spool_dir}/{name}`` parquet and
    consumers re-read from disk. ``schema`` covers the zero-row case
    (an empty write leaves no files to read back). A non-empty target
    subdirectory is refused: write_parquet APPENDS (Ray 2.49
    SaveMode.APPEND), so reuse would silently double the rows."""
    if spool_dir is None:
        m = ds.materialize()
        return ReusableRows(m, m.count())

    from ebook_ocr_ray.reads import parquet_num_rows, read_parquet_clean

    sub = os.path.join(spool_dir, name)
    claim_spool_target(sub)
    ds.write_parquet(sub)
    release_spool_claim(sub)
    n = parquet_num_rows(sub)
    if n == 0:
        return ReusableRows(ray.data.from_arrow(schema.empty_table()), 0)
    return ReusableRows(read_parquet_clean(sub), n, path=sub)
