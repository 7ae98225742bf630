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

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ebook_ocr_ray.config import DEFAULT_NUM_PARTITIONS, ExtractionConfig
from ebook_ocr_ray.sources.pages import pages_from_documents_batch
from ebook_ocr_ray.stages.extract import DocumentExtractor, prepare_batch

# Actor-pool sizing: autoscale between 2 and the sandbox's core budget;
# batch small enough that a batch of multi-KB HTML docs stays well under
# a block, large enough to amortize actor dispatch.
EXTRACT_BATCH_SIZE = 256
EXTRACT_CONCURRENCY = (2, 24)


def load_documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    cols = columns or ["doc_id", "text", "lang"]
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


def pages_dataset(
    sf_dir: str,
    with_duplicates: bool = False,
    kind: str | None = None,
) -> ray.data.Dataset:
    """Synthesize the north-rule pages table from the documents table.
    ``kind`` filters to 'html' / 'pdf' rows (decided by doc_id, so the
    filter prunes before payload synthesis)."""
    docs = load_documents(sf_dir)
    if kind == "pdf":
        docs = docs.map_batches(
            lambda t: t.filter(pa.compute.equal(pa.compute.mod(t["doc_id"], 7), 3)),
            batch_format="pyarrow",
        )
    elif kind == "html":
        docs = docs.map_batches(
            lambda t: t.filter(pa.compute.not_equal(pa.compute.mod(t["doc_id"], 7), 3)),
            batch_format="pyarrow",
        )
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


def dedup_exact(prepared: ray.data.Dataset) -> ray.data.Dataset:
    """Keep one row per payload hash: the earliest crawl (warc_ts, url as
    the deterministic tiebreak). Exact-hash analog of the reference's
    sequential frame dedup (src/preprocessing/deduplicate.py:9-66),
    re-expressed as a keyed shuffle instead of an ordered scan so it
    parallelizes."""

    def first_crawl(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["warc_ts", "url"], kind="mergesort").head(1)

    return prepared.groupby("content_sha").map_groups(first_crawl, batch_format="pandas")


def extract(
    pages: ray.data.Dataset, cfg: ExtractionConfig | None = None
) -> ray.data.Dataset:
    return pages.map_batches(
        DocumentExtractor,
        fn_constructor_kwargs={"cfg": cfg or ExtractionConfig()},
        batch_format="pyarrow",
        batch_size=EXTRACT_BATCH_SIZE,
        concurrency=EXTRACT_CONCURRENCY,
        num_cpus=1,
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
) -> ray.data.Dataset:
    """documents -> pages -> prepare -> (dedup) -> extract."""
    prepared = prepare_pages(pages_dataset(sf_dir, with_duplicates=with_duplicates))
    if dedup:
        prepared = dedup_exact(prepared)
    return extract(prepared, cfg)
