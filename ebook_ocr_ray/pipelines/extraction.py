"""The flagship extraction pipeline, Ray-Data-first.

    read_parquet(documents)                      # column-pruned read
      -> map_batches(pages synthesis)            # 1->N flat map (north-rule table)
      -> map_batches(prepare_batch)              # sniff + md5 + url-hash part_id
      -> exact dedup by content hash             # shuffle on content_sha —
                                                 #   BEFORE the expensive stage,
                                                 #   so duplicate payloads are
                                                 #   extracted exactly once
      -> map_batches(DocumentExtractor actor)    # stateful ensemble, Arrow in/out
      -> write_parquet(partition_cols=part_id)   # resumable layout
      -> groupby(site).aggregate                 # lineage (partial agg first)

Stage ordering rationale at 100 TB: the payload column dominates bytes, so
dedup keys on a 32-char hash move tiny rows through the shuffle relative to
extraction cost saved; extraction output drops the payload column so
everything after streams slim rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ebook_ocr_ray.config import DEFAULT_NUM_PARTITIONS, ExtractionConfig
from ebook_ocr_ray.sources.pages import pages_from_documents_batch
from ebook_ocr_ray.stages.extract import DocumentExtractor, prepare_batch

# Task granularity: ~1k docs x ~1.3ms ≈ 1.3s per task. Small batches looked
# harmless at sf0.01 but at amplified scale the driver pays ~5ms of
# scheduling per task — batch_size=128 produced thousands of tasks and a
# serial O(n) driver cost that capped scaling efficiency at ~0.6.
EXTRACT_BATCH_SIZE = 1024


def _extract_pool_size() -> int:
    """Fixed actor-pool size: cluster CPUs minus headroom for the upstream
    read/synthesis task stages. Measured on this box: a FIXED pool reaches
    steady state ~2.5x faster than autoscaling concurrency=(2, N) —
    autoscaler ramp-up dominates short runs and never helps a saturated
    pipeline."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus - max(2, cpus // 8))


def load_documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    cols = columns or ["doc_id", "text", "lang"]
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


def pages_dataset(
    sf_dir: str,
    with_duplicates: bool = False,
    kind: str | None = None,
    repeat: int = 1,
) -> ray.data.Dataset:
    """Synthesize the north-rule pages table from the documents table.
    ``kind`` filters to 'html' / 'pdf' rows (decided by doc_id, so the
    filter prunes before payload synthesis). ``repeat`` > 1 amplifies the
    corpus deterministically (FIXTURES.md §6 scaling-bench input): copy r
    gets doc_id + r*10_000_000, hence distinct urls and payloads."""
    docs = load_documents(sf_dir)
    if repeat > 1:

        def amplify(t: pa.Table) -> pa.Table:
            tables = []
            for r in range(repeat):
                ids = pa.compute.add(t["doc_id"], r * 10_000_000)
                tables.append(t.set_column(t.schema.get_field_index("doc_id"), "doc_id", ids))
            return pa.concat_tables(tables)

        docs = docs.map_batches(amplify, batch_format="pyarrow")
        # re-split so downstream heavy stages see ~4 blocks per core —
        # block count, not batch_size, is what bounds their parallelism
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        docs = docs.repartition(max(64, cpus * 4))
    if kind in ("pdf", "html"):
        want_pdf = kind == "pdf"

        def keep_kind(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 7 == 3) if want_pdf else (ids % 7 != 3)
            return t.filter(pa.array(mask))

        docs = docs.map_batches(keep_kind, batch_format="pyarrow")
    return docs.map_batches(
        pages_from_documents_batch,
        batch_format="pyarrow",
        fn_kwargs={"with_duplicates": with_duplicates},
    )


def prepare_pages(
    pages: ray.data.Dataset, num_partitions: int = DEFAULT_NUM_PARTITIONS
) -> ray.data.Dataset:
    return pages.map_batches(
        prepare_batch, batch_format="pyarrow", fn_kwargs={"num_partitions": num_partitions}
    )


def _survivor_key(ts_us: np.ndarray, urls: list[str]) -> list[str]:
    """Total order for picking the surviving crawl of a duplicate group:
    earliest warc_ts, then lexicographic url."""
    return [f"{t:020d}|{u}" for t, u in zip(ts_us, urls)]


def dedup_exact(
    prepared: ray.data.Dataset, slim: ray.data.Dataset | None = None
) -> ray.data.Dataset:
    """Keep one row per payload hash — the earliest crawl (warc_ts, url as
    the deterministic tiebreak). Exact-hash analog of the reference's
    sequential frame dedup (src/preprocessing/deduplicate.py:9-66).

    Scale design: duplicate rows are NEVER shuffled. A slim first pass
    aggregates (content_sha -> count, min survivor key) — the shuffle moves
    one ~60-byte row per (sha, batch) partial — then only the multi-crawl
    shas (a small fraction of the corpus) are collected and broadcast via
    ray.put, and the main pass filters each row locally: unique sha rows
    stream straight through; duplicate-group rows survive only when they
    carry the group's minimal key. At larger dup fractions the broadcast
    dict becomes a Bloom filter + keyed side table; the aggregate stays.

    ``slim`` optionally supplies a second instance of the prepared dataset
    for the counting pass (each Dataset executes once; synthesizing pages
    is cheaper than shuffling payloads).
    """
    src = slim if slim is not None else prepared

    def sha_partial(batch: pa.Table) -> pa.Table:
        ts_us = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = _survivor_key(ts_us, batch["url"].to_pylist())
        df = pd.DataFrame({"content_sha": batch["content_sha"].to_pylist(), "key": keys})
        agg = (
            df.groupby("content_sha", sort=False)
            .agg(n=("key", "size"), min_key=("key", "min"))
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Min, Sum

    agg = (
        src.map_batches(sha_partial, batch_format="pyarrow")
        .groupby("content_sha")
        .aggregate(Sum("n", alias_name="n"), Min("min_key", alias_name="min_key"))
    )
    dup_groups = agg.map_batches(
        lambda t: t.filter(pa.compute.greater(t["n"], 1)), batch_format="pyarrow"
    ).to_pandas()
    survivors = (
        dict(zip(dup_groups["content_sha"], dup_groups["min_key"]))
        if "content_sha" in dup_groups.columns
        else {}
    )
    survivors_ref = ray.put(survivors)

    def keep_survivors(batch: pa.Table) -> pa.Table:
        survivors = ray.get(survivors_ref)
        if not survivors:
            return batch
        ts_us = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = _survivor_key(ts_us, batch["url"].to_pylist())
        shas = batch["content_sha"].to_pylist()
        mask = [survivors.get(s) in (None, k) for s, k in zip(shas, keys)]
        return batch.filter(pa.array(mask))

    return prepared.map_batches(keep_survivors, batch_format="pyarrow")


def extract(
    pages: ray.data.Dataset,
    cfg: ExtractionConfig | None = None,
    use_actors: bool = False,
) -> ray.data.Dataset:
    """The ensemble extraction stage.

    Default is a stateless task pool shipping ONE DocumentExtractor
    instance through the object store: this engine's extractor state is a
    compiled ruleset (regexes + config), cheap to broadcast, and measured
    ~2x faster end-to-end than an actor pool here because actor processes
    pay a per-execution spawn+import cost that tasks (reusing warm
    workers) do not. ``use_actors=True`` switches to a fixed-size actor
    pool — the right mode when __init__ loads genuinely heavy state (an ML
    model, a large index): fixed size, not autoscaling, which was measured
    ~2.5x slower to reach steady state."""
    if use_actors:
        return pages.map_batches(
            DocumentExtractor,
            fn_constructor_kwargs={"cfg": cfg or ExtractionConfig()},
            batch_format="pyarrow",
            batch_size=EXTRACT_BATCH_SIZE,
            concurrency=_extract_pool_size(),
            num_cpus=1,
        )
    return pages.map_batches(
        DocumentExtractor(cfg or ExtractionConfig()),
        batch_format="pyarrow",
        batch_size=EXTRACT_BATCH_SIZE,
    )


def lineage(extracted: ray.data.Dataset, key: str = "site") -> ray.data.Dataset:
    """Per-site lineage/metrics: doc & byte & char counts. Partial
    aggregation inside map_batches first, so the shuffle moves one row per
    (site, batch) instead of one per document (the combiner pattern —
    SURVEY.md G6)."""

    def partial(batch: pa.Table) -> pa.Table:
        tdf = pd.DataFrame(
            {
                "k": batch[key].to_pylist(),
                "payload_bytes": batch["payload_bytes"].to_pylist(),
                "chars": pa.compute.utf8_length(
                    batch["extracted_text"].cast(pa.large_string())
                ).to_pylist(),
            }
        )
        agg = tdf.groupby("k", sort=False).agg(
            doc_count=("k", "size"),
            byte_count=("payload_bytes", "sum"),
            char_count=("chars", "sum"),
        )
        agg = agg.reset_index().rename(columns={"k": key})
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = extracted.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(key).aggregate(
        Sum("doc_count", alias_name="doc_count"),
        Sum("byte_count", alias_name="byte_count"),
        Sum("char_count", alias_name="char_count"),
    )


def extraction_pipeline(
    sf_dir: str,
    with_duplicates: bool = False,
    dedup: bool = True,
    cfg: ExtractionConfig | None = None,
    repeat: int = 1,
) -> ray.data.Dataset:
    """documents -> pages -> prepare -> (dedup) -> extract.

    Dedup needs two passes over the prepared pages (slim survivor
    aggregate, then the filtered main pass). In the sandbox the pages are
    synthesized, so the prepared dataset is materialized once and shared —
    at sf scales that is tens of MB. At 100 TB the input is a Parquet
    table: drop the materialize and let each pass be its own
    ``read_parquet`` — pass A reads (url, warc_ts, payload) to hash and
    aggregate, pass B re-reads, filters to survivors and extracts. Input
    IO happens twice; extraction happens once, on survivors only.
    """
    prepared = prepare_pages(
        pages_dataset(sf_dir, with_duplicates=with_duplicates, repeat=repeat)
    )
    if dedup:
        prepared = prepared.materialize()
        prepared = dedup_exact(prepared, slim=prepared)
    return extract(prepared, cfg)
