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
materializes; output is one slim row per document. For a benchmark set
that outgrows a worker's heap, ``decontaminate_ds_join`` flips the
broadcast to a keyed semi-join on the shingle hash (the near-dup
hot-bucket filter's shape, with the same post-join exact re-check), at
the price of shuffling the corpus's shingle rows.
"""
from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean

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


def _shingle_key64(shingles: list[str]) -> np.ndarray:
    """Deterministic 63-bit int join key for shingle strings — THE
    canonical stable hash (textstats.stable_hash64) masked positive, so
    every operator's string->int63 key is one recipe. Collisions are
    handled by the post-join exact re-check, not assumed away."""
    from ebook_ocr_ray.functions.textstats import stable_hash63, stable_hash64

    return np.array(
        [stable_hash63(s) for s in shingles],
        dtype=np.int64,
    )


def decontaminate_ds_join(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    n: int = DECONTAM_NGRAM,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """The keyed fallback for eval sets BEYOND broadcast size: instead of
    shipping the benchmark n-gram set to every task, both sides explode
    to slim (key, shingle) rows and meet in a hash semi-join.

    corpus (doc_id, text)  -> per-doc DISTINCT shingle rows
    bench  (text)          -> globally DISTINCT shingle rows (keyed agg)
    inner safe_join on the 63-bit shingle key, post-join exact string
    re-check (hash collisions surface as inequality, never as a false
    hit), keyed per-doc count, then a left_outer join back onto the doc
    list so uncontaminated documents keep their (0, 0) row.

    Output is identical to ``decontaminate_ds`` — equality is pinned by
    a test. The trade: the corpus's shingle rows shuffle (slim — one
    int64 + one short string each), which is exactly what paying for a
    too-big broadcast side buys back."""
    from ebook_ocr_ray.groups import map_partitions_typed
    from ebook_ocr_ray.joins import safe_join

    def corpus_rows(batch: pa.Table) -> pa.Table:
        ids, keys, strs = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = set(word_shingles(t or "", n))        # per-doc DISTINCT
            if not sh:
                continue
            sh = sorted(sh)
            ids.extend([d] * len(sh))
            strs.extend(sh)
        from ebook_ocr_ray.joins import filler_if_empty

        return filler_if_empty(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "gkey": pa.array(_shingle_key64(strs), pa.int64()),
                    "shingle": pa.array(strs, pa.string()),
                }
            ),
            "gkey",
        )

    def bench_rows(batch: pa.Table) -> pa.Table:
        out = set()
        for t in batch["text"].to_pylist():
            out.update(word_shingles(t or "", n))
        strs = sorted(out)
        from ebook_ocr_ray.joins import filler_if_empty

        # the bench side is a tiny filtered slice of the corpus read, so
        # whole-block-empty outputs are the NORMAL case; the sentinel
        # filler keeps the bundle typed and the downstream
        # map_partitions_typed wrapper filters it (joins.filler_if_empty)
        return filler_if_empty(
            pa.table(
                {
                    "gkey": pa.array(_shingle_key64(strs), pa.int64()),
                    "shingle_b": pa.array(strs, pa.string()),
                }
            ),
            "gkey",
        )

    # global distinct on the bench side: hash-partitioned per-partition
    # drop_duplicates (no driver state). The sentinel-backed repartition
    # replaces the sort-based groupby().Count, whose empty output
    # partitions log a schema-less-RefBundle warning per block.
    bench_distinct = map_partitions_typed(
        bench.map_batches(bench_rows, batch_format="pyarrow"),
        "gkey",
        lambda df: df.drop_duplicates(["gkey", "shingle_b"])[
            ["gkey", "shingle_b"]
        ].astype({"gkey": "int64"}),
        schema=pa.schema([("gkey", pa.int64()), ("shingle_b", pa.string())]),
        empty_fn=lambda: pa.schema(
            [("gkey", pa.int64()), ("shingle_b", pa.string())]
        ).empty_table(),
        num_partitions=4,
    )

    # drop_sentinels=False: the raw join keeps one sentinel-pair row per
    # partition, so hit_partial ALWAYS runs (Ray skips fused UDFs on
    # empty batches — with the built-in sentinel filter first, a
    # no-overlap partition would empty before hit_partial and its filler
    # could never fire); hit_partial owns both the sentinel drop and the
    # refill
    joined = safe_join(
        docs.map_batches(corpus_rows, batch_format="pyarrow"),
        bench_distinct,
        on="gkey",
        right_on="gkey",
        num_partitions=num_partitions,
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("gkey", pa.int64()), ("shingle", pa.string())]
        ),
        right_schema=pa.schema([("gkey", pa.int64()), ("shingle_b", pa.string())]),
        drop_sentinels=False,
    )

    def hit_partial(t: pa.Table) -> pa.Table:
        from ebook_ocr_ray.joins import SENTINEL_CEILING, filler_if_empty

        t = t.filter(pa.compute.greater_equal(t["gkey"], SENTINEL_CEILING + 1))
        t = t.filter(pa.compute.equal(t["shingle"], t["shingle_b"]))  # exact
        df = pd.DataFrame({"doc_id": t["doc_id"].to_pylist()})
        agg = df.groupby("doc_id", sort=False).size().rename("h").reset_index()
        out = pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)
        if len(out) == 0:
            out = pa.table(
                {"doc_id": pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
            )
        return filler_if_empty(out, "doc_id")

    def hit_reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", sort=False)["h"].sum().rename("n_hits").reset_index()
        return out.astype({"doc_id": "int64", "n_hits": "int64"})

    counts = map_partitions_typed(
        joined.map_batches(hit_partial, batch_format="pyarrow"),
        "doc_id",
        hit_reduce,
        schema=pa.schema([("doc_id", pa.int64()), ("h", pa.int64())]),
        empty_fn=lambda: pa.schema(
            [("doc_id", pa.int64()), ("n_hits", pa.int64())]
        ).empty_table(),
        num_partitions=4,
    )

    doc_ids = docs.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )
    # drop_sentinels=False + finish owning the sentinel filter: a join
    # partition holding no real doc would otherwise be emptied by the
    # fused built-in filter BEFORE finish, Ray would skip finish on the
    # empty batch, and the operator would emit a schema-less bundle.
    # With the raw join, finish always runs (every partition keeps its
    # sentinel-pair row); its typed-EMPTY return emits a typed block,
    # which suffices here because this is the terminal stage — no filler
    # row that could leak into user-visible output.
    out = safe_join(
        doc_ids,
        counts,
        on="doc_id",
        right_on="doc_id",
        num_partitions=num_partitions,
        join_type="left_outer",
        left_schema=pa.schema([("doc_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())]),
        drop_sentinels=False,
    )

    def finish(t: pa.Table) -> pa.Table:
        from ebook_ocr_ray.joins import SENTINEL_CEILING

        t = t.filter(pa.compute.greater_equal(t["doc_id"], SENTINEL_CEILING + 1))
        h = pa.compute.fill_null(t["n_hits"].combine_chunks(), 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hits": h.cast(pa.int64()),
                "contaminated": pa.compute.cast(pa.compute.greater(h, 0), pa.int64()),
            }
        )

    final = out.map_batches(finish, batch_format="pyarrow")
    # the planner plans the WHOLE DAG with the FINAL dataset's context,
    # and this chain's final join descends from the sort-default doc_ids
    # side — the keyed repartitions inside the typed reduces (above) need
    # the hash strategy visible at the root or planning raises
    from ray.data.context import ShuffleStrategy

    final.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return final


def bench_slice_batch(t: pa.Table, bench_mod: int) -> pa.Table:
    """THE benchmark-slice filter, shared by both decontaminate variants
    (two drifting copies previously) and importable by composed jobs:
    keeps doc_id % bench_mod == 0, text column only. A block holding no
    bench member emits one empty-TEXT row instead of an empty table —
    Ray skips downstream fused UDFs on an empty batch and emits a
    schema-less block; "" shingles to nothing, so the join variant's
    bench_rows turns the row into its own sentinel-keyed filler
    (joins.filler_if_empty) and the broadcast variant's n-gram set
    ignores it."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    out = t.filter(pa.array(ids % bench_mod == 0)).select(["text"])
    if len(out) == 0:
        out = pa.table({"text": pa.array([""], pa.string())})
    return out


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

    bench_texts = [
        r["text"]
        for r in read_parquet_clean(path, columns=["doc_id", "text"])
        .map_batches(
            lambda t: bench_slice_batch(t, bench_mod), batch_format="pyarrow"
        )
        .take_all()
    ]
    bench_ref = ray.put(bench_ngram_set(bench_texts, n))
    docs = read_parquet_clean(path, columns=["doc_id", "text"])
    return decontaminate_ds(docs, bench_ref, n)


def decontaminate_join(
    sf_dir: str, n: int = DECONTAM_NGRAM, bench_mod: int = BENCH_MOD
) -> ray.data.Dataset:
    """``decontaminate`` through the keyed semi-join fallback — the path a
    beyond-broadcast eval suite takes. Same benchmark slice, same output,
    no driver-side n-gram set at any point."""
    path = f"{sf_dir}/documents.parquet"

    bench = read_parquet_clean(path, columns=["doc_id", "text"]).map_batches(
        lambda t: bench_slice_batch(t, bench_mod), batch_format="pyarrow"
    )
    docs = read_parquet_clean(path, columns=["doc_id", "text"])
    return decontaminate_ds_join(docs, bench, n)
