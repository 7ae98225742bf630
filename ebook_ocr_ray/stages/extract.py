"""Ray Data stages for the extraction pipeline.

Two stages:

- ``prepare_batch``      stateless map_batches fn: content-type sniff, md5
                         content hash, url-hash partition id, site, payload
                         size. Cheap, runs before dedup so duplicate
                         payloads never reach the expensive extractor.
- ``DocumentExtractor``  callable class holding the compiled extractor
                         ensemble. Shipped as ONE instance through the
                         object store for a task pool (the default — its
                         state is a cheap ruleset), or passed as the
                         class with concurrency=N for a fixed actor pool
                         when __init__ loads heavy state (the analog of
                         the reference's lazy engine singletons,
                         src/rover/engines/core.py:14-64).

All batch IO is Arrow (batch_format="pyarrow"); the binary payload column
never round-trips through pandas.
"""

from __future__ import annotations

import hashlib
import json
import re
from urllib.parse import urlsplit

import pyarrow as pa

from ebook_ocr_ray.config import DEFAULT_NUM_PARTITIONS, ExtractionConfig
from ebook_ocr_ray.functions.ensemble import merge_sources
from ebook_ocr_ray.functions.html_dom import parse_blocks
from ebook_ocr_ray.functions.html_extract import EXTRACTOR_FNS, figure_zones
from ebook_ocr_ray.functions.pdf_extract import extract_pdf_text, is_pdf_payload
from ebook_ocr_ray.sources.pages import PAGES_SCHEMA


def url_partition(url: str, num_partitions: int = DEFAULT_NUM_PARTITIONS) -> int:
    """Stable url-hash partition id (md5 prefix; never Python's salted
    hash()). This single key is reused by dedup, lineage and the output
    layout so downstream groupbys co-locate with it."""
    return int(hashlib.md5(url.encode("utf-8")).hexdigest()[:8], 16) % num_partitions


def site_of(url: str) -> str:
    host = urlsplit(url).netloc
    return host.split(".", 1)[0] if host else ""


def payload_sha(payloads: list[bytes | None]) -> list[str]:
    """THE payload content key: md5 hex, '' for a null payload. Shared by
    exact dedup (prepare_batch) and crawl_delta — their cross-operator
    equality contract ('same content' means the same thing everywhere)
    holds because both call this one function."""
    return [hashlib.md5(p).hexdigest() if p is not None else "" for p in payloads]


def prepare_batch(batch: pa.Table, num_partitions: int = DEFAULT_NUM_PARTITIONS) -> pa.Table:
    """Annotate pages rows with routing/dedup metadata. Stateless; the md5
    over payload bytes is the exact-dedup key (analog of the frame
    perceptual hash, reference src/preprocessing/deduplicate.py:9-66, in
    its exact-hash form)."""
    urls = batch["url"].to_pylist()
    payloads = batch["html"].to_pylist()
    shas = payload_sha(payloads)
    kinds = ["pdf" if p is not None and is_pdf_payload(p) else "html" for p in payloads]
    parts = [url_partition(u, num_partitions) for u in urls]
    sites = [site_of(u) for u in urls]
    sizes = [len(p) if p is not None else 0 for p in payloads]
    return (
        batch.append_column("content_sha", pa.array(shas, pa.string()))
        .append_column("doc_kind", pa.array(kinds, pa.string()))
        .append_column("part_id", pa.array(parts, pa.int32()))
        .append_column("site", pa.array(sites, pa.string()))
        .append_column("payload_bytes", pa.array(sizes, pa.int64()))
    )


# Arrow schema of prepare_batch's output: the pages source schema plus
# the five appended columns, composed from sources.pages.PAGES_SCHEMA
# (ONE source of truth — a hand-copied field list would silently drift
# if the pages schema ever changes). Stages that rebuild prepared rows
# from pandas (the dedup tie/bloom resolvers' per-group first-wins
# picks) convert through THIS schema so their blocks unify with the
# Arrow passthrough branch they union into — from_pandas inference would
# type an all-null html group as `null`, splitting the union's schema.
PREPARED_PAGE_SCHEMA = pa.schema(
    list(PAGES_SCHEMA)
    + [
        pa.field("content_sha", pa.string()),
        pa.field("doc_kind", pa.string()),
        pa.field("part_id", pa.int32()),
        pa.field("site", pa.string()),
        pa.field("payload_bytes", pa.int64()),
    ]
)


# compiled once at import: this runs in the synthesis/split hot path on
# every payload byte-string
_ARTICLE_RE = re.compile(rb"<article>.*?</article>", re.DOTALL)


def split_multidoc_batch(batch: pa.Table) -> pa.Table:
    """1->N flat map: a payload carrying several <article> elements splits
    into one pages row per article (url gains a #aK fragment; other
    columns are inherited). Single-article / PDF rows pass through
    untouched.

    The analog of the reference's spread-page split
    (src/preprocessing/split_spread.py:174-216): one physical capture ->
    N logical documents, with stable derived keys instead of renumbering
    (SURVEY.md M3/M4)."""
    urls, tss, payloads, texts, langs = [], [], [], [], []
    for url, ts, payload, text, lang in zip(
        batch["url"].to_pylist(),
        batch["warc_ts"].to_pylist(),
        batch["html"].to_pylist(),
        batch["text"].to_pylist(),
        batch["lang"].to_pylist(),
    ):
        matches = list(_ARTICLE_RE.finditer(payload or b""))
        if len(matches) < 2:
            urls.append(url)
            tss.append(ts)
            payloads.append(payload)
            texts.append(text)
            langs.append(lang)
            continue
        head = payload[: matches[0].start()]
        tail = payload[matches[-1].end():]
        for k, m in enumerate(matches):
            # segment runs from the end of the previous article to this
            # article's end, so inter-article content lands exactly once
            # (attached to the following logical page), never dropped
            seg_start = matches[k - 1].end() if k > 0 else m.start()
            urls.append(f"{url}#a{k}")
            tss.append(ts)
            payloads.append(head + payload[seg_start:m.end()] + tail)
            texts.append(text)
            langs.append(lang)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(payloads, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


OUT_FIELDS = [
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("site", pa.string()),
    ("part_id", pa.int32()),
    ("doc_kind", pa.string()),
    ("content_sha", pa.string()),
    ("payload_bytes", pa.int64()),
    ("extracted_text", pa.large_string()),
    ("headings", pa.list_(pa.string())),
    ("n_lines", pa.int32()),
    ("gaps_filled", pa.int32()),
    ("agreement_milli", pa.int32()),
    ("contributions", pa.string()),
    ("engine", pa.string()),
    ("error", pa.string()),
]
OUT_SCHEMA = pa.schema(OUT_FIELDS)


def extract_one(
    payload: bytes, cfg: ExtractionConfig
) -> tuple[str, list[str], int, int, dict[str, int], float]:
    """Pure per-document extraction. Returns
    (text, headings, n_lines, gaps_filled, contributions, agreement)."""
    if is_pdf_payload(payload):
        text, n_lines, titles = extract_pdf_text(payload)
        return text, titles, n_lines, 0, {"layout": n_lines}, 1.0

    html = payload.decode("utf-8", errors="replace")
    blocks = parse_blocks(html)
    # registry resolution: config-registered callables extend the built-in
    # dict (the open-registry surface, SURVEY.md §2.10 / reference 4th
    # engine runners.py:344-389)
    source_spans = {
        name: (cfg.custom_extractors.get(name) or EXTRACTOR_FNS[name])(blocks)
        for name in cfg.extractors
    }
    # figure-zone masking (A8, runners.py:392-448 + core.py:98-196): the
    # primary variant reports figure zones; any OTHER variant's span whose
    # center falls inside a zone is dropped before voting, so a variant
    # that kept caption/figure text cannot out-vote the primary's
    # content judgement
    if cfg.primary == "dom" and "dom" not in cfg.custom_extractors:
        zones = figure_zones(blocks)
        if zones:
            from ebook_ocr_ray.functions.geometry import center_in

            for name, spans in source_spans.items():
                if name == cfg.primary:
                    continue
                source_spans[name] = [
                    s
                    for s in spans
                    if not any(center_in(z, (s.x1, s.y1, s.x2, s.y2)) for z in zones)
                ]
    merged = merge_sources(
        source_spans,
        weights=cfg.weights,
        primary=cfg.primary,
        min_conf=cfg.min_conf,
        align_tol=cfg.align_tol,
    )
    # headings role mirrors the primary (dom) variant's block selection —
    # chrome headings the ensemble rejects must not leak into the headings
    # column (analog of yomitoku section_headings, runners.py:19-86)
    body = [b for b in blocks if not b.in_head]
    any_main = any(b.in_main for b in body)
    heading_texts = [
        b.text
        for b in body
        if b.is_heading and (b.in_main if any_main else not b.in_chrome)
    ]
    return (
        merged.text,
        heading_texts,
        len(merged.lines),
        merged.gaps_filled,
        merged.contributions,
        merged.agreement,
    )


class DocumentExtractor:
    """Actor-pool stage: the extractor ensemble for one worker.

    __init__ runs once per actor (compile config, build registry);
    __call__ runs per Arrow batch. Per-document failures are caught and
    recorded in the ``error`` column so a poison document cannot fail a
    block (reference precedent: per-engine try/except,
    src/rover/engines/runners.py:85-86).
    """

    def __init__(self, cfg: ExtractionConfig | None = None):
        self.cfg = cfg or ExtractionConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ebook_ocr_ray.functions.textstats import is_low_quality

        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        # the crawl-supplied plain-text column is the chain's engine of
        # last resort (the tesseract slot in ocr_with_fallback,
        # src/layout_ocr.py:50-66) — absent when the caller stripped it
        raw_texts = (
            batch["text"].to_pylist()
            if "text" in batch.column_names
            else [None] * len(urls)
        )

        texts: list[str] = []
        headings: list[list[str]] = []
        n_lines: list[int] = []
        gaps: list[int] = []
        contribs: list[str] = []
        agreements: list[int] = []
        engines: list[str] = []
        errors: list[str | None] = []

        def fall_back(raw: str | None) -> None:
            raw = raw or ""
            texts.append(raw)
            headings.append([])
            n_lines.append(len(raw.split("\n")) if raw else 0)
            gaps.append(0)
            contribs.append(json.dumps({"raw_text": len(raw.split("\n")) if raw else 0}))
            agreements.append(0)
            engines.append("raw_text")

        for payload, raw in zip(payloads, raw_texts):
            try:
                t, h, n, g, c, a = extract_one(payload or b"", self.cfg)
                low = self.cfg.fallback_enabled and is_low_quality(
                    t, self.cfg.fallback_min_length, self.cfg.fallback_max_non_char
                )
                if low and raw and not is_low_quality(
                    raw, self.cfg.fallback_min_length, self.cfg.fallback_max_non_char
                ):
                    fall_back(raw)
                else:
                    texts.append(t)
                    headings.append(h)
                    n_lines.append(n)
                    gaps.append(g)
                    contribs.append(json.dumps(c, sort_keys=True))
                    agreements.append(int(round(a * 1000)))
                    engines.append("ensemble")
                errors.append(None)
            except Exception as exc:  # poison-document guard
                if self.cfg.fallback_enabled and raw:
                    fall_back(raw)                       # recovery, error kept
                else:
                    texts.append("")
                    headings.append([])
                    n_lines.append(0)
                    gaps.append(0)
                    contribs.append("{}")
                    agreements.append(0)
                    engines.append("none")
                errors.append(f"{type(exc).__name__}: {exc}")

        has_meta = "content_sha" in batch.column_names
        arrays = [
            batch["url"],
            batch["warc_ts"],
            batch["site"] if has_meta else pa.array([site_of(u) for u in urls], pa.string()),
            batch["part_id"]
            if has_meta
            else pa.array([url_partition(u) for u in urls], pa.int32()),
            batch["doc_kind"]
            if has_meta
            else pa.array(
                ["pdf" if p and is_pdf_payload(p) else "html" for p in payloads], pa.string()
            ),
            batch["content_sha"]
            if has_meta
            else pa.array([hashlib.md5(p or b"").hexdigest() for p in payloads], pa.string()),
            batch["payload_bytes"]
            if has_meta
            else pa.array([len(p or b"") for p in payloads], pa.int64()),
            pa.array(texts, pa.large_string()),
            pa.array(headings, pa.list_(pa.string())),
            pa.array(n_lines, pa.int32()),
            pa.array(gaps, pa.int32()),
            pa.array(agreements, pa.int32()),
            pa.array(contribs, pa.string()),
            pa.array(engines, pa.string()),
            pa.array(errors, pa.string()),
        ]
        return pa.Table.from_arrays(arrays, schema=OUT_SCHEMA)
