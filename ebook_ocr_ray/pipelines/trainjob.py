"""The composed training-data job: the single pipeline a user would
actually submit over a crawl at 100 TB, chaining every family of this
engine end to end —

    extract (ensemble, exact-dedup of recrawls, spooled)
      -> Gopher rule filter (map-side, zero shuffle)
      -> fuzzy exact-dedup + MinHash-LSH near-dedup cascade
      -> decontaminate against the benchmark slice (broadcast n-grams)
      -> context-window chunking + greedy sequence packing

as ONE streamed chain of spool waves: every corpus-sized intermediate
lives on scratch parquet behind an O_EXCL claim (the checkpoint-wave
discipline of ``extraction_pipeline(spool_dir=...)``), every re-read is
column-pruned, and nothing corpus-sized is ever collected on the driver.
The only driver-side materialization is the benchmark slice's n-gram set
(~1% of docs — the documented boundedness assumption of
``decontam.decontaminate``; a real deployment feeds an external eval
list instead).

Document identity: downstream stages key on ``doc_id =
stable_hash63(url)`` — a real crawl has no integer ids, and the 63-bit
surrogate is THE canonical string->int64 key of this codebase, so the
id survives re-sharding and re-runs byte-identically.

Every stage's semantics are frozen by its own operator's oracle; the
composed job has its own full-value DuckDB oracle
(``__ray_entry__._training_job_sql``) whose output — the packing plan —
transitively pins every upstream decision (a drift anywhere changes doc
membership, chunk boundaries, or pack order).

Reference analog: the reference's `make run` target chains its six
per-stage CLIs (extract-frames -> deduplicate -> split-spreads ->
detect-layout -> run-ocr -> consolidate -> convert) over one spooled
HASHDIR (Makefile:133-154); this module is the same composition
expressed as one lazy Ray Data chain over spool waves.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import parquet_num_rows, read_parquet_clean

# Mirrors analytics.CHUNK_* / PACK_* defaults (the chunk/pack oracles).
from ebook_ocr_ray.pipelines.analytics import (
    CHUNK_OVERLAP,
    CHUNK_TOKENS,
    PACK_BUDGET_TOKENS,
)
from ebook_ocr_ray.pipelines.decontam import BENCH_MOD, DECONTAM_NGRAM


def training_data_job(
    sf_dir: str,
    scratch_dir: str,
    bench_mod: int = BENCH_MOD,
    decontam_n: int = DECONTAM_NGRAM,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
    budget_tokens: int = PACK_BUDGET_TOKENS,
    **minhash_kwargs,
) -> dict[str, ray.data.Dataset]:
    """Run the composed job; returns lazy handles onto the results:

    - ``docs``:   the final training corpus (doc_id, text), reading from
                  the final spool wave
    - ``chunks``: (doc_id, chunk_idx, chunk_text, n_tokens)
    - ``pack``:   the packing plan (bucket, seq_idx, doc_id, chunk_idx,
                  n_tokens)

    ``scratch_dir`` (caller-owned lifetime) holds the spool waves:
    ``prepared/`` (extraction spool), ``clean/documents.parquet``
    (extracted + Gopher-kept docs), ``cascade/`` (near-dup survivor
    spool), ``final/documents.parquet`` (training corpus). Delete only
    after the returned datasets are consumed. Stage semantics:

    1. ``extraction_pipeline(sf_dir, with_duplicates=True, spool_dir=
       prepared/)`` — recrawl exact-dedup + ensemble extraction, spooled.
    2. Gopher rules applied map-side on the extracted text
       (``quality.gopher_keep_mask`` — same frame as gopher_quality).
    3. ``neardup.minhash_clusters_cascade(fuzzy=True)`` over the clean
       wave; training keeps one representative per near-dup cluster
       (doc_id == cluster_id), fetched back by a keyed semi-join.
    4. Decontamination: the benchmark is the clean wave's
       ``doc_id % bench_mod == 0`` slice; a training doc survives iff it
       is NOT in the slice and shares no ``decontam_n``-gram with it.
    5. ``analytics.chunk_documents`` / ``pack_sequences`` over the final
       wave (two column-pruned reads of one spool, not two pipelines).
    """
    from ebook_ocr_ray.functions.textstats import stable_hash63
    from ebook_ocr_ray.joins import safe_join
    from ebook_ocr_ray.pipelines.analytics import chunk_documents, pack_sequences
    from ebook_ocr_ray.pipelines.decontam import bench_ngram_set, word_shingles
    from ebook_ocr_ray.pipelines.extraction import extraction_pipeline
    from ebook_ocr_ray.pipelines.neardup import minhash_clusters_cascade
    from ebook_ocr_ray.pipelines.quality import gopher_keep_mask
    from ebook_ocr_ray.state.spool import claim_spool_target, release_spool_claim

    clean_root = os.path.join(scratch_dir, "clean")
    final_root = os.path.join(scratch_dir, "final")
    clean_dir = os.path.join(clean_root, "documents.parquet")
    final_dir = os.path.join(final_root, "documents.parquet")

    # ---- wave 1: extract -> Gopher filter -> clean spool ----------------
    extracted = extraction_pipeline(
        sf_dir,
        with_duplicates=True,
        spool_dir=os.path.join(scratch_dir, "prepared"),
    )

    def to_docs(t: pa.Table) -> pa.Table:
        texts = t["extracted_text"].to_pylist()
        ids = [stable_hash63(u) for u in t["url"].to_pylist()]
        keep = gopher_keep_mask(texts)
        out = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        return out.filter(pa.array(keep))

    claim_spool_target(clean_dir)
    extracted.map_batches(to_docs, batch_format="pyarrow").write_parquet(clean_dir)
    release_spool_claim(clean_dir)
    if parquet_num_rows(clean_dir) == 0:
        # every document failed the Gopher rules: write_parquet of an
        # empty dataset leaves NO files, so the downstream wave reads
        # would raise — return typed empty handles instead (the same
        # zero-row guard pin_reusable applies to its spools)
        return _empty_outputs()

    # ---- wave 2: fuzzy + minhash cascade, keep cluster representatives --
    clusters = minhash_clusters_cascade(
        clean_root,
        fuzzy=True,
        scratch_dir=os.path.join(scratch_dir, "cascade"),
        **minhash_kwargs,
    )

    def reps_only(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        cl = t["cluster_id"].to_numpy(zero_copy_only=False)
        return pa.table({"rid": pa.array(ids[ids == cl], pa.int64())})

    reps = clusters.map_batches(reps_only, batch_format="pyarrow")
    survivors = safe_join(
        read_parquet_clean(clean_dir, columns=["doc_id", "text"]),
        reps,
        on="doc_id",
        right_on="rid",
        num_partitions=8,
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        right_schema=pa.schema([("rid", pa.int64())]),
    ).map_batches(lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")

    # ---- decontaminate: benchmark = the clean wave's % slice ------------
    from ebook_ocr_ray.pipelines.decontam import bench_slice_batch

    bench_texts = [
        r["text"]
        for r in read_parquet_clean(clean_dir, columns=["doc_id", "text"])
        .map_batches(
            lambda t: bench_slice_batch(t, bench_mod), batch_format="pyarrow"
        )
        .take_all()
    ]
    bench_ref = ray.put(bench_ngram_set(bench_texts, decontam_n))

    def decontam_filter(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.empty(len(ids), dtype=bool)
        for i, (d, x) in enumerate(zip(ids, t["text"].to_pylist())):
            mask[i] = d % bench_mod != 0 and not bench.intersection(
                word_shingles(x or "", decontam_n)
            )
        return t.filter(pa.array(mask))

    final = survivors.map_batches(decontam_filter, batch_format="pyarrow")

    # ---- wave 3: final spool -> chunk + pack -----------------------------
    claim_spool_target(final_dir)
    final.write_parquet(final_dir)
    release_spool_claim(final_dir)
    if parquet_num_rows(final_dir) == 0:
        # decontamination removed every survivor (a corpus that IS the
        # benchmark): same zero-row guard as the clean wave
        return _empty_outputs()

    return {
        "docs": read_parquet_clean(final_dir, columns=["doc_id", "text"]),
        "chunks": chunk_documents(final_root, chunk_tokens, overlap),
        "pack": pack_sequences(final_root, budget_tokens, chunk_tokens, overlap),
    }


def _empty_outputs() -> dict:
    """Typed zero-row handles in the exact schemas of the non-degenerate
    outputs (docs / chunk_documents / pack_sequences)."""
    return {
        "docs": ray.data.from_arrow(
            pa.schema([("doc_id", pa.int64()), ("text", pa.string())]).empty_table()
        ),
        "chunks": ray.data.from_arrow(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("chunk_idx", pa.int64()),
                    ("chunk_text", pa.string()),
                    ("n_tokens", pa.int64()),
                ]
            ).empty_table()
        ),
        "pack": ray.data.from_arrow(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("seq_idx", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("chunk_idx", pa.int64()),
                    ("n_tokens", pa.int64()),
                ]
            ).empty_table()
        ),
    }
