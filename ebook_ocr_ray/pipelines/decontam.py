"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation (benchmark) set.

No analog exists in the reference repo — this is one of the engine's
beyond-reference training-data operators. The rule is the published
n-gram-overlap practice (GPT-3 appendix C / Llama decontamination): a
training document is contaminated when any of its length-``n`` word
n-grams also occurs in any benchmark document. Shingling reuses
``functions.textstats.word_shingles`` (docs shorter than ``n`` words
contribute their whole text as one shingle; empty docs contribute
nothing), so the same tokenization backs dedup sketches and
decontamination.

Scale posture (100 TB corpus): eval suites are megabytes while the
corpus is not, so the benchmark n-gram set is the canonical broadcast
small side — built once, ``ray.put`` once, membership-tested per
streamed Arrow batch. The corpus side never shuffles and never
materializes; output is one slim row per document. If a benchmark set
ever outgrew a worker's heap, the same shape as the near-dup hot-bucket
filter applies (flip the broadcast to a keyed semi-join on the shingle
hash) — not implemented because no real eval suite is that large.
"""
from __future__ import annotations

from typing import Iterable

import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.functions.textstats import word_shingles

# Default n-gram length for contamination checks; 8 words is the
# GPT-3-style scale (13-gram) adjusted down for the short synthetic docs
# so planted overlaps are actually detectable in tests.
DECONTAM_NGRAM = 8

# Synthetic eval set: every doc whose id is divisible by this modulus.
# At real scale the benchmark is an external text list, not a corpus
# slice — `decontaminate_ds` takes exactly that.
BENCH_MOD = 97


def bench_ngram_set(texts: Iterable[str], n: int = DECONTAM_NGRAM) -> set[str]:
    """Distinct word n-grams over the benchmark texts (the broadcast
    small side). Plain strings, not hashes: membership must be exact so
    the DuckDB oracle can mirror it without collision caveats."""
    out: set[str] = set()
    for t in texts:
        out.update(word_shingles(t, n))
    return out


def decontaminate_ds(
    docs: ray.data.Dataset, bench_ref: "ray.ObjectRef", n: int = DECONTAM_NGRAM
) -> ray.data.Dataset:
    """Per-document contamination flags against a broadcast benchmark
    n-gram set (``ray.put(bench_ngram_set(...))``).

    Input needs (doc_id, text); output is one slim row per doc:
    (doc_id, n_hits, contaminated) where n_hits counts the DISTINCT
    doc n-grams found in the benchmark set and contaminated is 0/1
    (int64 — the driver's value hash is dtype-sensitive and DuckDB
    booleans round-trip to object dtype). Pure streaming map; the
    set is fetched zero-copy-ish from the object store once per task."""

    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        hits = []
        for t in batch["text"].to_pylist():
            sh = word_shingles(t or "", n)
            hits.append(len(bench.intersection(sh)) if sh else 0)
        h = pa.array(hits, pa.int64())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hits": h,
                "contaminated": pa.compute.cast(
                    pa.compute.greater(h, 0), pa.int64()
                ),
            }
        )

    return docs.map_batches(flag, batch_format="pyarrow")


def decontaminate(
    sf_dir: str, n: int = DECONTAM_NGRAM, bench_mod: int = BENCH_MOD
) -> ray.data.Dataset:
    """Flagship entry over the synthetic corpus: the benchmark is the
    deterministic slice doc_id % bench_mod == 0 (its texts are tiny —
    ~1% of docs — and collected once, which is the documented
    boundedness assumption for any real eval suite), every document is
    scored against it. Benchmark members trivially flag themselves when
    non-empty — kept in the output so the caller chooses whether to
    drop the slice or the overlap."""
    path = f"{sf_dir}/documents.parquet"

    def keep_bench(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % bench_mod == 0)).select(["text"])

    bench_texts = [
        r["text"]
        for r in ray.data.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(keep_bench, batch_format="pyarrow")
        .take_all()
    ]
    bench_ref = ray.put(bench_ngram_set(bench_texts, n))
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    return decontaminate_ds(docs, bench_ref, n)
