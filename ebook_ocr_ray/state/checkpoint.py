"""Resumable partitioned output with a lineage manifest.

Re-expresses the reference's stage-level resume (pickle cache + idempotent
stage dirs, /root/reference/src/layout/detector.py:168-205,
split_spread.py:266-291) as the north-rule checkpoint contract:

- output laid out as one directory per url-hash partition
  (``part=<id>/``), written atomically (tmp dir + rename);
- a ``manifest.parquet`` lineage table records per-partition doc_count,
  byte_count, char_count, extractor_version_hash, status;
- a restarted run reads the manifest, SKIPS completed partitions (filter
  before the extractor, so no payload is even synthesized/read for them)
  and only processes the remainder;
- a version-hash change invalidates the whole manifest (different
  extractor semantics -> recompute everything).

The per-partition loop below drives one bounded Ray job per partition
group. Grouping partitions into waves keeps scheduling overhead low while
preserving restart granularity.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ebook_ocr_ray.config import DEFAULT_NUM_PARTITIONS, ENGINE_VERSION

MANIFEST = "manifest.parquet"


def version_hash(extra: str = "") -> str:
    return hashlib.md5((ENGINE_VERSION + extra).encode()).hexdigest()[:16]


def read_manifest(out_dir: str) -> pd.DataFrame:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        return pd.DataFrame(
            columns=["part_id", "doc_count", "byte_count", "char_count",
                     "extractor_version_hash", "status"]
        )
    return pd.read_parquet(path)


def completed_parts(out_dir: str, vhash: str) -> set[int]:
    m = read_manifest(out_dir)
    if m.empty:
        return set()
    ok = m[(m.status == "complete") & (m.extractor_version_hash == vhash)]
    return set(ok.part_id.astype(int))


def _append_manifest(out_dir: str, rows: list[dict]) -> None:
    m = read_manifest(out_dir)
    m = pd.concat([m, pd.DataFrame(rows)], ignore_index=True)
    m = m.drop_duplicates(subset=["part_id"], keep="last")
    tmp = os.path.join(out_dir, MANIFEST + ".tmp")
    m.to_parquet(tmp)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))


def part_filter(parts: set[int]):
    """map_batches fn dropping rows outside ``parts`` (needs a part_id
    column). Apply to the PREPARED pages, before extraction."""
    parts_ref = ray.put(parts)

    def keep_group(batch: pa.Table) -> pa.Table:
        wanted = ray.get(parts_ref)
        mask = [p in wanted for p in batch["part_id"].to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return keep_group


def run_checkpointed_extraction(
    extracted_factory,
    out_dir: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    waves: int = 4,
    fail_after_waves: int | None = None,
    vhash: str | None = None,
) -> pd.DataFrame:
    """Execute extraction in ``waves`` partition groups, each written
    atomically and recorded in the manifest; returns the final manifest.

    ``extracted_factory(parts: set[int]) -> Dataset`` must build the
    pipeline restricted to those url-hash partitions, applying
    ``part_filter(parts)`` to the prepared pages BEFORE the extractor —
    that is what makes skipped partitions genuinely free on restart (no
    payload read, no extraction). ``fail_after_waves`` simulates a
    mid-run crash for resume tests.
    """
    os.makedirs(out_dir, exist_ok=True)
    vhash = vhash or version_hash()
    done = completed_parts(out_dir, vhash)

    all_parts = list(range(num_partitions))
    todo = [p for p in all_parts if p not in done]
    groups = [todo[i::waves] for i in range(waves)]
    groups = [g for g in groups if g]

    for wave_idx, group in enumerate(groups):
        if fail_after_waves is not None and wave_idx >= fail_after_waves:
            break
        group_set = set(group)
        ds = extracted_factory(group_set)
        tmp_dir = os.path.join(out_dir, f"_tmp_wave_{wave_idx}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        # the wave STREAMS into the partitioned sink — materializing here
        # would pin the whole wave's payload in the object store, which at
        # corpus scale defeats the point of waves
        ds.write_parquet(tmp_dir, partition_cols=["part_id"])

        # per-partition stats via the same partial-aggregation combiner as
        # the lineage table (one row per (part, batch) reaches the driver,
        # not one per document); computed from the just-written files with
        # only the three needed columns read back — the second consumer
        # re-reads pruned parquet instead of forcing the first into a
        # materialize. An all-empty wave has no files and yields an empty
        # frame.
        import glob as _glob

        import ray.data as _rd

        from ebook_ocr_ray.pipelines.extraction import lineage

        wave_files = _glob.glob(os.path.join(tmp_dir, "**", "*.parquet"), recursive=True)
        if wave_files:
            written = _rd.read_parquet(
                tmp_dir, columns=["part_id", "payload_bytes", "extracted_text"]
            )
            stats_df = lineage(written, key="part_id").to_pandas()
        else:
            stats_df = pd.DataFrame()
        if "part_id" in stats_df.columns:
            # the hive partition column reads back as STRING — without the
            # cast every int `part in stats.index` probe below misses and
            # the manifest records doc_count=0 for every partition (the
            # cast lives inside the column guard: zero-row fragments can
            # yield a frame with no part_id column at all)
            stats_df["part_id"] = stats_df["part_id"].astype("int64")
            stats = stats_df.set_index("part_id")
        else:
            stats = pd.DataFrame(
                columns=["doc_count", "byte_count", "char_count"]
            )

        rows = []
        for part in sorted(group_set):
            # keep the hive key name (part_id=N) so the partition column
            # survives a hive-aware read and matches the non-checkpoint
            # write path's layout
            src = os.path.join(tmp_dir, f"part_id={part}")
            dst = os.path.join(out_dir, f"part_id={part}")
            if os.path.exists(src):
                # overwrite-publish: the MANIFEST (not the dir) is the
                # completeness record, so replacing a stale version is safe
                from ebook_ocr_ray.state.atomic import replace_dir

                replace_dir(src, dst)
            else:
                # a zero-row partition still "publishes": remove any stale
                # directory from a previous engine version, otherwise a
                # recompute that now filters those rows out would record
                # status=complete while outdated rows survive on disk
                shutil.rmtree(dst, ignore_errors=True)
            s = stats.loc[part] if part in stats.index else None
            rows.append(
                {
                    "part_id": part,
                    "doc_count": int(s.doc_count) if s is not None else 0,
                    "byte_count": int(s.byte_count) if s is not None else 0,
                    "char_count": int(s.char_count) if s is not None else 0,
                    "extractor_version_hash": vhash,
                    "status": "complete",
                }
            )
        shutil.rmtree(tmp_dir, ignore_errors=True)
        _append_manifest(out_dir, rows)

    return read_manifest(out_dir)


def read_checkpointed_output(out_dir: str) -> pd.DataFrame:
    """Read back every published partition directory, restoring the
    part_id column from the hive directory names."""
    frames = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part_id="):
            df = pd.read_parquet(os.path.join(out_dir, name))
            df["part_id"] = int(name.split("=", 1)[1])
            frames.append(df)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)
