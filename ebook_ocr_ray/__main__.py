"""CLI entry points — the analog of the reference's Makefile step targets
(/root/reference/Makefile:37-160) and CLI options (--limit from
src/cli/run_ocr.py:28-37, engine selection from rover/ensemble.py:300-327).

    python -m ebook_ocr_ray extract   --sf-dir ... --out /tmp/out [--limit N]
                                      [--extractors dom,density] [--primary dom]
                                      [--no-dedup] [--resume]
    python -m ebook_ocr_ray structural --sf-dir ... --out /tmp/out [--limit N]
    python -m ebook_ocr_ray lineage    --sf-dir ...

Owns its Ray session (guarded init) — the only places allowed to, per the
driver contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_extract(args) -> int:
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.config import ExtractionConfig
    from ebook_ocr_ray.pipelines.extraction import (
        dedup_apply,
        dedup_survivor_state,
        extract,
        pages_dataset,
        prepare_pages,
    )
    from ebook_ocr_ray.state.checkpoint import part_filter, run_checkpointed_extraction

    cfg = ExtractionConfig(
        extractors=tuple(args.extractors.split(",")),
        primary=args.primary,
    )

    def base_pages(parts: set[int] | None = None):
        pages = pages_dataset(args.sf_dir, with_duplicates=args.with_duplicates)
        if args.limit:
            pages = pages.limit(args.limit)
        prepared = prepare_pages(pages)
        if parts is not None:
            prepared = prepared.map_batches(part_filter(parts), batch_format="pyarrow")
        return prepared

    # dedup survivor state is computed ONCE over the whole corpus (before
    # any wave-level part filtering) so checkpointed runs dedup globally,
    # identically to a non-checkpointed run — only the cheap broadcast
    # keep-filter runs inside each wave. Computed LAZILY on the first
    # wave that actually needs it: a --resume over a finished manifest
    # must cost zero corpus scans.
    _state_cache: dict[str, tuple] = {}

    def dedup_state():
        if "s" not in _state_cache:
            _state_cache["s"] = dedup_survivor_state(
                base_pages().select_columns(["content_sha", "warc_ts", "url"])
            )
        return _state_cache["s"]

    def prepared_pages(parts: set[int] | None = None):
        prepared = base_pages(parts)
        if not args.no_dedup:
            prepared = dedup_apply(prepared, *dedup_state())
        return prepared

    def extracted_factory(parts: set[int]):
        return extract(prepared_pages(parts), cfg)

    if args.resume or args.checkpoint:
        manifest = run_checkpointed_extraction(extracted_factory, args.out)
        done = int((manifest.status == "complete").sum())
        print(json.dumps({"out": args.out, "partitions_complete": done}))
    else:
        ds = extract(prepared_pages(), cfg)
        ds.write_parquet(args.out, partition_cols=["part_id"])
        print(json.dumps({"out": args.out, "rows": "written"}))
    ray.shutdown()
    return 0


def cmd_structural(args) -> int:
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.stages.structural import structural_pipeline

    ds = structural_pipeline(args.sf_dir)
    if args.limit:
        ds = ds.limit(args.limit)
    ds.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_lineage(args) -> int:
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.extraction import extraction_pipeline, lineage

    df = lineage(extraction_pipeline(args.sf_dir, dedup=False)).to_pandas()
    print(df.to_json(orient="records"))
    ray.shutdown()
    return 0


def cmd_quality(args) -> int:
    """CCNet-style quality tiers over the documents table -> parquet."""
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.quality import quality_buckets

    quality_buckets(args.sf_dir, spool_dir=args.spool_dir).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_dedup_url(args) -> int:
    """Canonical-URL dedup over the pages table -> parquet."""
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.extraction import dedup_url, pages_dataset

    pages = pages_dataset(args.sf_dir, with_url_variants=args.with_url_variants)
    dedup_url(pages, num_partitions=args.num_partitions).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_gopher(args) -> int:
    """Gopher-rule quality metrics + keep verdicts -> parquet."""
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.quality import gopher_quality

    gopher_quality(args.sf_dir).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_trainjob(args) -> int:
    """The composed training-data job (pipelines/trainjob.py): extract ->
    Gopher filter -> fuzzy+MinHash dedup cascade -> decontaminate ->
    chunk + pack, one streamed chain of spool waves. Writes the final
    corpus, the chunk table and the packing plan as parquet under
    --out; --scratch holds the spool waves (fresh tmp dir if omitted)."""
    import shutil
    import tempfile

    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.trainjob import training_data_job

    own_scratch = args.scratch is None
    scratch = args.scratch or tempfile.mkdtemp(prefix="trainjob_")
    try:
        out = training_data_job(args.sf_dir, scratch)
        counts = {}
        from ebook_ocr_ray.reads import parquet_num_rows

        for name in ("docs", "chunks", "pack"):
            path = os.path.join(args.out, name)
            out[name].write_parquet(path)
            # count from the just-written footers: out[name].count() would
            # re-execute the whole lazy chunk/pack chain a second time
            counts[name] = parquet_num_rows(path)
        print(json.dumps({"out": args.out, "scratch": scratch, **counts}))
    finally:
        if own_scratch:
            shutil.rmtree(scratch, ignore_errors=True)
    ray.shutdown()
    return 0


def cmd_crawl_delta(args) -> int:
    """CDX-style diff of the two synthetic crawl snapshots -> parquet."""
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.extraction import crawl_delta, snapshot_pages

    crawl_delta(
        snapshot_pages(args.sf_dir, "a"),
        snapshot_pages(args.sf_dir, "b"),
        num_partitions=args.num_partitions,
    ).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_crawl_history(args) -> int:
    """Per-url crawl index (CDX build) -> parquet."""
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.extraction import crawl_history, pages_dataset

    pages = pages_dataset(
        args.sf_dir, with_duplicates=True, with_versions=True
    )
    crawl_history(pages, num_partitions=args.num_partitions).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_dedup_spans(args) -> int:
    """Duplicated-span removal over the documents table -> parquet."""
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.spandedup import remove_duplicated_spans

    remove_duplicated_spans(
        args.sf_dir, k=args.k, min_count=args.min_count
    ).write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_consolidate(args) -> int:
    """Reference Makefile `consolidate` target (step 5): per-url book
    artifacts written as partitioned parquet."""
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.extraction import consolidate_books, extraction_pipeline

    ds = consolidate_books(extraction_pipeline(args.sf_dir, dedup=not args.no_dedup))
    if args.limit:
        ds = ds.limit(args.limit)
    ds.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_neardup(args) -> int:
    """MinHash+LSH near-dup clusters over the documents table. --cascade
    collapses exact duplicates pre-LSH (mirror-saturated corpora);
    --fuzzy widens that collapse to the normalization key; --spool-dir
    keeps the O(corpus) bucket rows on scratch disk instead of in the
    object store."""
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.pipelines.neardup import minhash_clusters, minhash_clusters_cascade

    if args.cascade or args.fuzzy:
        ds = minhash_clusters_cascade(
            args.sf_dir, fuzzy=args.fuzzy,
            jaccard_threshold=args.threshold, spool_dir=args.spool_dir,
        )
    else:
        ds = minhash_clusters(
            args.sf_dir, jaccard_threshold=args.threshold,
            spool_dir=args.spool_dir,
        )
    ds.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def cmd_preview_trim_grid(args) -> int:
    """Reference Makefile `preview-trim-grid` target: guide-line geometry
    rows (see stages.multimodal.preview_trim_grid)."""
    ray = _ray_session(args.num_cpus)
    from ebook_ocr_ray.stages.multimodal import preview_trim_grid

    ds = preview_trim_grid(args.sf_dir, step=args.step, max_ratio=args.max)
    ds.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="ebook_ocr_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract", help="run the extraction pipeline")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=0, help="head-N of the pages table")
    p.add_argument("--extractors", default="dom,density,readability")
    p.add_argument("--primary", default="dom")
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--with-duplicates", action="store_true")
    p.add_argument("--checkpoint", action="store_true", help="partitioned + manifest")
    p.add_argument("--resume", action="store_true", help="skip completed partitions")
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("structural", help="book_md -> XML compile")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_structural)

    p = sub.add_parser("lineage", help="per-site lineage table")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_lineage)

    p = sub.add_parser("consolidate", help="per-url book artifacts (step 5)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_consolidate)

    p = sub.add_parser("quality", help="CCNet-style quality tiers -> parquet")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--spool-dir", default=None,
                   help="scratch dir: scored rows spool to disk, not object store")
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_quality)

    p = sub.add_parser("dedup-url", help="canonical-URL dedup -> parquet")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--with-url-variants", action="store_true",
                   help="plant the deterministic messy-URL recrawls")
    p.add_argument("--num-partitions", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_dedup_url)

    p = sub.add_parser("gopher", help="Gopher-rule quality filter -> parquet")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_gopher)

    p = sub.add_parser(
        "trainjob",
        help="composed training-data job: extract -> filter -> dedup "
        "cascade -> decontaminate -> chunk+pack -> parquet",
    )
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--scratch", default=None, help="spool-wave dir (kept)")
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_trainjob)

    p = sub.add_parser("crawl-history", help="per-url crawl index -> parquet")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--num-partitions", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_crawl_history)

    p = sub.add_parser("crawl-delta", help="snapshot diff (CDX-style) -> parquet")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--num-partitions", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_crawl_delta)

    p = sub.add_parser("dedup-spans", help="duplicated-span removal -> parquet")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--min-count", type=int, default=2)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_dedup_spans)

    p = sub.add_parser("neardup", help="MinHash+LSH near-dup clusters")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--cascade", action="store_true",
                   help="collapse exact duplicates before LSH")
    p.add_argument("--fuzzy", action="store_true",
                   help="cascade on the normalized-text key (implies --cascade)")
    p.add_argument("--spool-dir", default=None,
                   help="scratch dir: bucket rows spool to disk, not object store")
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_neardup)

    p = sub.add_parser("preview-trim-grid", help="trim guide-line geometry")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--step", type=float, default=0.05)
    p.add_argument("--max", type=float, default=0.30)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_preview_trim_grid)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
