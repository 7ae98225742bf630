"""Driver contract for the Ray-Data-native extraction engine.

The driver initialises Ray itself; nothing here (or in the library) calls
ray.init/ray.shutdown.

Correctness design note: the north-rule ``pages`` table is synthesized
deterministically from the ``documents`` table (see
ebook_ocr_ray/sources/pages.py), constructed so the reference-semantics
extractor recovers exactly ``'Document {doc_id}' || chr(10) || text`` per
url. That closed form is what lets even the full HTML/PDF ensemble
extraction pipeline be verified by a DuckDB oracle, not just rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ebook_ocr_ray.functions.textstats import STOPWORDS

_URL_SQL = "'https://site-' || (doc_id % 20) || '.example/doc/' || doc_id"
_TEXT_SQL = "'Document ' || format('{:,}', doc_id) || chr(10) || text"
_TS_SQL = "TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND"
_STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))

# Shared byte-exact oracle for the compiled book XML; __FIGURE_SRC__ is a
# SQL expression for the figure src attribute (file reference, or the
# base64 data URI of the joined media payload for the embedded variant).
_STRUCTURAL_XML_SQL = """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             greatest(1, CAST(floor(len(string_split(text, ' ')) / 3)
                              AS BIGINT)) AS third
      FROM documents)
    SELECT doc_id,
      '<book><metadata><title /><pages>3</pages></metadata>'
      || '<toc><entry level="1" number="1" page="2" match="exact">Opening</entry>'
      || '<entry level="2" number="1.1" page="3" match="exact">Detail</entry></toc>'
      || '<front-matter><pagebreak number="1" /></front-matter>'
      || '<chapter number="1" title="Opening"><pagebreak number="2" />'
      || '<paragraph readAloud="true">' || array_to_string(ws[1:third], ' ')
      || '.</paragraph>'
      || '<paragraph readAloud="false">boilerplate footer ' || doc_id
      || '</paragraph>'
      || '<section number="1.1" title="Detail"><pagebreak number="3" />'
      || '<paragraph readAloud="true">' || array_to_string(ws[third+1:], ' ')
      || '.</paragraph>'
      || '<list type="unordered" readAloud="true"><item>first point</item>'
      || '<item>second point</item></list>'
      || '<figure src="' || __FIGURE_SRC__ || '" />'
      || '<heading level="3" readAloud="true">Deep note</heading>'
      || '</section></chapter>'
      || '<!-- ERROR: line 19: heading level 4 clamped to 3 --></book>'
          AS book_xml
    FROM w
"""


def _le32(expr: str) -> str:
    """Little-endian u32 hex of an integer SQL expression."""
    return (
        f"lpad(to_hex(({expr}) % 256), 2, '0')"
        f" || lpad(to_hex((({expr}) // 256) % 256), 2, '0')"
        f" || lpad(to_hex((({expr}) // 65536) % 256), 2, '0')"
        f" || lpad(to_hex((({expr}) // 16777216) % 256), 2, '0')"
    )


# image docs (doc_id % 3 = 0): payload = b"FAKEIMG\x00" + pack("<III", w, h, seed)
_EMBEDDED_FIGURE_SQL = f"""CASE WHEN doc_id % 3 = 0 THEN
      'data:image/fake;base64,' || to_base64(from_hex('46414B45494D4700'
        || {_le32('32 + (doc_id % 8) * 16')}
        || {_le32('24 + (doc_id % 5) * 12')}
        || {_le32('doc_id')}))
    ELSE 'fig_' || doc_id || '.png' END"""



def entry() -> Any:
    """Flagship pipeline on sf0.001: pages synthesis (with duplicate
    recrawls) -> sniff/hash -> exact dedup -> actor-pool ensemble
    extraction. Returns the streaming Dataset."""
    from ebook_ocr_ray.pipelines.extraction import extraction_pipeline

    return extraction_pipeline("/root/testdata/sf0.001", with_duplicates=True, dedup=True)


# --------------------------------------------------------------------------


def _sorted_frame(ds: Any, by: list[str]):
    """Driver-result boundary: collect a (small, already-aggregated) result
    and give it a total row order. The driver's value-hash must see a
    deterministic row sequence regardless of Ray's block arrival order;
    aggregate outputs are tiny relative to the corpus, so collecting here
    is the write_parquet analog, not a mid-pipeline materialization."""
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    return df.sort_values(by, kind="mergesort").reset_index(drop=True)


def _extract_docs(sf_dir: str, kind: str | None = None):
    from ebook_ocr_ray.pipelines.extraction import extract, pages_dataset, prepare_pages

    ds = extract(prepare_pages(pages_dataset(sf_dir, kind=kind)))
    return ds.select_columns(["url", "extracted_text"])


def _extract_headings(sf_dir: str):
    import pyarrow as pa

    from ebook_ocr_ray.pipelines.extraction import extract, pages_dataset, prepare_pages

    ds = extract(prepare_pages(pages_dataset(sf_dir)))

    def explode(batch: pa.Table) -> pa.Table:
        urls, heads = [], []
        for url, hs in zip(batch["url"].to_pylist(), batch["headings"].to_pylist()):
            for h in hs:
                urls.append(url)
                heads.append(h)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "heading": pa.array(heads, pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")


def _dedup_pages(sf_dir: str):
    from ebook_ocr_ray.pipelines.extraction import dedup_exact, pages_dataset, prepare_pages

    ds = dedup_exact(prepare_pages(pages_dataset(sf_dir, with_duplicates=True)))
    return ds.select_columns(["url", "warc_ts"])


def _dedup_pages_bloom(sf_dir: str):
    """Bounded-memory dedup variant (Bloom membership broadcast + keyed
    first-wins over the hit slice) — same survivors, same oracle."""
    from ebook_ocr_ray.pipelines.extraction import (
        dedup_exact_bloom,
        pages_dataset,
        prepare_pages,
    )

    def prepared():
        return prepare_pages(pages_dataset(sf_dir, with_duplicates=True))

    return dedup_exact_bloom(prepared(), slim=prepared()).select_columns(
        ["url", "warc_ts"]
    )


def _dedup_url(sf_dir: str):
    """Canonical-URL dedup: crawls of one page under messy URL variants
    (uppercase scheme/host + www. + trailing slash; tracking query +
    fragment) collapse to the earliest crawl of the normalized URL."""
    from ebook_ocr_ray.pipelines.extraction import dedup_url, pages_dataset

    return _sorted_frame(
        dedup_url(pages_dataset(sf_dir, with_url_variants=True)), ["url_norm"]
    )


def _gopher_quality(sf_dir: str):
    from ebook_ocr_ray.pipelines.quality import gopher_quality

    return gopher_quality(sf_dir)


def _anchor_text_stats(sf_dir: str):
    from ebook_ocr_ray.pipelines.linkgraph import anchor_text_stats

    return anchor_text_stats(sf_dir)


def _crawl_delta(sf_dir: str):
    """CDX-style snapshot diff: per-url added/removed/changed/same across
    the two deterministic crawl snapshots (sources/pages.py
    snapshot_pages_batch)."""
    from ebook_ocr_ray.pipelines.extraction import crawl_delta, snapshot_pages

    return _sorted_frame(
        crawl_delta(snapshot_pages(sf_dir, "a"), snapshot_pages(sf_dir, "b")),
        ["url"],
    )


def _crawl_history(sf_dir: str):
    """CDX index build: per url the crawl count, distinct payload count
    and first/last crawl ts, over the duplicates+versions fixture."""
    from ebook_ocr_ray.pipelines.extraction import crawl_history, pages_dataset

    return _sorted_frame(
        crawl_history(
            pages_dataset(sf_dir, with_duplicates=True, with_versions=True)
        ),
        ["url"],
    )


def _sequence_dedup_pages(sf_dir: str):
    from ebook_ocr_ray.pipelines.extraction import pages_dataset, prepare_pages, sequence_dedup

    ds = sequence_dedup(prepare_pages(pages_dataset(sf_dir, with_versions=True)))
    return ds.select_columns(["url", "warc_ts"])


def _outlinks(sf_dir: str):
    from ebook_ocr_ray.pipelines.extraction import outlinks

    return outlinks(sf_dir)


def _lineage_sites(sf_dir: str):
    from ebook_ocr_ray.pipelines.extraction import extraction_pipeline, lineage

    return _sorted_frame(
        lineage(extraction_pipeline(sf_dir, dedup=False)).select_columns(
            ["site", "doc_count", "char_count"]
        ),
        ["site"],
    )


def _extract_metrics(sf_dir: str):
    from ebook_ocr_ray.pipelines.extraction import extraction_pipeline

    ds = extraction_pipeline(sf_dir, dedup=False)
    return ds.select_columns(["url", "doc_kind", "n_lines", "gaps_filled", "contributions"])


def _structural_xml(sf_dir: str):
    from ebook_ocr_ray.stages.structural import structural_pipeline

    return structural_pipeline(sf_dir).select_columns(["doc_id", "book_xml"])


def _structural_stats(sf_dir: str):
    """Every synthesized book compiles to exactly 3 pages with exactly one
    parse error (the deliberate #### deep-heading clamp) — closed-form
    constants the oracle can assert."""
    from ebook_ocr_ray.stages.structural import structural_pipeline

    return structural_pipeline(sf_dir).select_columns(["doc_id", "n_pages", "n_errors"])


def _media_image_features(sf_dir: str):
    from ebook_ocr_ray.stages.multimodal import image_features

    return image_features(sf_dir).select_columns(["media_id", "pix_mean", "pix_std"])


def _preview_trim_grid(sf_dir: str):
    from ebook_ocr_ray.stages.multimodal import preview_trim_grid

    return preview_trim_grid(sf_dir)


def _preview_trim_grid_sql() -> str:
    """Closed-form oracle for the trim-grid preview: the ratio ladder's
    exact accumulated doubles (and the labels formatted from them) are
    computed by the same Python loop and embedded as literals; px mirrors
    int() truncation as floor (dimensions and ratios are positive)."""
    from ebook_ocr_ray.stages.multimodal import TRIM_DIRECTIONS, trim_ratios

    rows = ", ".join(
        f"('{direction}', '{prefix}:{r:.2f}', '{color}', {r!r}::DOUBLE)"
        for direction, prefix, color in TRIM_DIRECTIONS
        for r in trim_ratios()
    )
    return f"""
        WITH imgs AS (
          SELECT doc_id AS media_id,
                 32 + (doc_id % 8) * 16 AS w,
                 24 + (doc_id % 5) * 12 AS h
          FROM documents WHERE doc_id % 3 = 0),
        guides(direction, label, color, ratio) AS (VALUES {rows})
        SELECT i.media_id, g.direction, g.ratio,
               CAST(floor(CASE g.direction
                 WHEN 'top' THEN i.h * g.ratio
                 WHEN 'bottom' THEN i.h * (1 - g.ratio)
                 WHEN 'left' THEN i.w * g.ratio
                 ELSE i.w * (1 - g.ratio) END) AS BIGINT) AS px,
               g.label, g.color
        FROM imgs i CROSS JOIN guides g
        ORDER BY i.media_id, g.direction, g.ratio
    """


def _vlm_captions(sf_dir: str):
    from ebook_ocr_ray.stages.vlm import vlm_captions

    return vlm_captions(sf_dir)


def _media_frame_counts(sf_dir: str):
    """Frames sampled per synthetic video (every 5th of 10 + id%20 frames)
    — closed-form oracle."""
    import pyarrow as pa

    from ebook_ocr_ray.stages.multimodal import video_frames

    ds = video_frames(sf_dir, every=5)

    def count(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"media_id": batch["media_id"].to_pylist()})
        agg = df.groupby("media_id").size().reset_index(name="n_frames")
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(count, batch_format="pyarrow")
        .groupby("media_id")
        .aggregate(Sum("n_frames", alias_name="n_frames"))
    )


def _media_audio_features(sf_dir: str):
    """Actor-pool audio features (frame RMS, zero-crossing rate,
    duration). The fake decoder's integer-sawtooth waveform makes all
    three closed-form, so the whole stage is oracle-checked."""
    from ebook_ocr_ray.stages.multimodal import audio_features

    return audio_features(sf_dir).select_columns(
        ["media_id", "rms", "zcr", "duration_s"]
    )


def _media_frame_index(sf_dir: str):
    """Exact 1->N frame-sample layout: one row per sampled frame with its
    source frame index (0, 5, 10, ... per video) — closed-form oracle."""
    from ebook_ocr_ray.stages.multimodal import video_frames

    return video_frames(sf_dir, every=5).select_columns(["media_id", "frame_idx"])


def _structural_xml_embedded(sf_dir: str):
    """M34 analog: figure file references replaced by base64 data URIs of
    the joined media payloads — the payload bytes are closed-form, so the
    embedded XML is fully oracle-checked."""
    from ebook_ocr_ray.stages.structural import embedded_figures_pipeline

    return embedded_figures_pipeline(sf_dir)


def _heading_rules(sf_dir: str):
    """Every denormalized book carries exactly 2 repairable defects
    (chapter lost its number -> ADD_NUMBER; section number uses a dash
    separator -> FORMAT_ONLY) and a 100% TOC match rate after repair-aware
    matching — closed-form oracle."""
    from ebook_ocr_ray.stages.structural import heading_repair_pipeline

    return heading_repair_pipeline(sf_dir)


def _corpus_metrics(sf_dir: str):
    """Global metrics over the html slice (pdf line counts depend on pixel
    wrapping, html docs always vote exactly 2 lines -> closed form)."""
    from ebook_ocr_ray.pipelines.extraction import corpus_metrics, extraction_pipeline

    return corpus_metrics(extraction_pipeline(sf_dir, dedup=False, kind="html"))


def _split_spreads(sf_dir: str):
    """Multi-article payloads (the spread analog) split 1->2 before
    extraction; closed-form oracle per article."""
    return _spread_extracted(sf_dir).select_columns(["url", "extracted_text"])


def _spread_extracted(sf_dir: str):
    """Shared by split_spreads and consolidate_books: multi-article
    payloads split 1->N, then ensemble-extracted (one row per article,
    urls carry #aK derived keys)."""
    import pyarrow as pa

    from ebook_ocr_ray.pipelines.extraction import extract, load_documents, prepare_pages
    from ebook_ocr_ray.sources.pages import PAGES_SCHEMA, page_ts, page_url, synth_spread_html
    from ebook_ocr_ray.stages.extract import split_multidoc_batch

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        return pa.Table.from_arrays(
            [
                pa.array([page_url(i) for i in ids], pa.string()),
                pa.array([page_ts(i) for i in ids], pa.timestamp("us")),
                pa.array([synth_spread_html(i, t) for i, t in zip(ids, texts)], pa.binary()),
                pa.array(texts, pa.string()),
                pa.array(langs, pa.string()),
            ],
            schema=PAGES_SCHEMA,
        )

    pages = (
        load_documents(sf_dir)
        .map_batches(build, batch_format="pyarrow")
        .map_batches(split_multidoc_batch, batch_format="pyarrow")
    )
    return extract(prepare_pages(pages))


def _consolidate_books(sf_dir: str):
    """Reference step-5 analog (src/consolidate.py:53-91): article parts
    of each url consolidated in order into book_txt / book_md with page
    markers and ## heading wraps — closed-form oracle per document."""
    from ebook_ocr_ray.pipelines.extraction import consolidate_books

    return consolidate_books(_spread_extracted(sf_dir))


def _extract_fallback(sf_dir: str):
    """Fallback-chain query (E15 analog, src/layout_ocr.py:50-66): a
    deterministic slice of payloads (doc_id % 10 == 7) is corrupted to
    unparseable bytes; the ensemble result fails the quality floor and
    the engine falls back to the crawl's raw text column — closed-form
    recoverable, so the whole chain is oracle-checked."""
    import pyarrow as pa

    from ebook_ocr_ray.pipelines.extraction import extract, pages_dataset, prepare_pages

    GARBAGE = b"\x00\x01###$$$%%%&&&***!!!<<<>>>///\\\\|||~~~^^^"

    def corrupt(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        for i, u in enumerate(urls):
            if int(u.rsplit("/", 1)[1]) % 10 == 7:
                payloads[i] = GARBAGE
        return batch.set_column(
            batch.schema.get_field_index("html"), "html", pa.array(payloads, pa.binary())
        )

    pages = pages_dataset(sf_dir).map_batches(corrupt, batch_format="pyarrow")
    return extract(prepare_pages(pages)).select_columns(
        ["url", "extracted_text", "engine"]
    )


def _heading_pattern_stats(sf_dir: str):
    """Corpus heading-category histogram (NUMBERED / UNNUMBERED /
    SPECIAL): every synth book contributes 2 numbered structure headings
    + 1 unnumbered note — closed-form oracle."""
    import pyarrow as pa
    from ray.data import read_parquet

    from ebook_ocr_ray.functions.bookparse import parse_document
    from ebook_ocr_ray.functions.headrules import classify_heading
    from ebook_ocr_ray.groups import typed_keyed_sum
    from ebook_ocr_ray.stages.structural import synth_book_md

    docs = read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            doc = parse_document(synth_book_md(doc_id, text))
            for _ln, _lvl, h in doc.headings:
                c = classify_heading(h)
                counts[c] = counts.get(c, 0) + 1
        # explicit types: an empty batch otherwise yields a null-typed
        # table and the shuffle logs a schema-mismatch warning
        return pa.table({"category": pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    # typed_keyed_sum instead of groupby().aggregate(Sum): the sort-based
    # aggregate emits one schema-less empty RefBundle per unpopulated
    # output partition (3 categories over a 64-block corpus guarantees
    # warnings); the sentinel-backed hash reduce is warning-free
    return typed_keyed_sum(
        docs.map_batches(partial, batch_format="pyarrow"),
        key_cols=["category"],
        sum_cols=["n"],
        partials_schema=pa.schema(
            [("category", pa.string()), ("n", pa.int64())]
        ),
        num_partitions=4,
    ).sort("category")


def _site_boilerplate(sf_dir: str):
    from ebook_ocr_ray.pipelines.boilerplate import site_boilerplate_pages

    return site_boilerplate_pages(sf_dir)


def _strip_boilerplate(sf_dir: str):
    from ebook_ocr_ray.pipelines.boilerplate import strip_boilerplate

    return strip_boilerplate(sf_dir)


def _dedup_incremental(sf_dir: str):
    from ebook_ocr_ray.pipelines.incremental import dedup_incremental

    return dedup_incremental(sf_dir)


def _dedup_spans(sf_dir: str):
    from ebook_ocr_ray.pipelines.spandedup import remove_duplicated_spans

    return remove_duplicated_spans(sf_dir)


def _pagerank(sf_dir: str):
    from ebook_ocr_ray.pipelines.linkgraph import pagerank

    return pagerank(sf_dir)


def _pagerank_sql(iters: int = 3) -> str:
    """Closed-form oracle for linkgraph.pagerank: the synth link graph is
    12 root-relative hrefs per html page, every edge distinct; the
    integer update rule is replayed verbatim with one CTE layer per
    iteration (all int64 floor arithmetic — equality by construction,
    not within-epsilon)."""
    hrefs = "('/'),('/about'),('/news'),('/contact'),('/t/0'),('/t/1')," \
            "('/t/2'),('/t/3'),('/t/4'),('/t/5'),('/privacy'),('/terms')"
    layers = []
    for k in range(1, iters + 1):
        layers.append(f"""
        r{k} AS (
          SELECT n.url,
                 150000 + COALESCE(SUM((85 * p.r) // (100 * o.d)), 0) AS r
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.url
          LEFT JOIN r{k - 1} p ON p.url = e.src
          LEFT JOIN outdeg o ON o.src = e.src
          GROUP BY n.url)""")
    return f"""
        WITH docs AS (SELECT doc_id FROM documents WHERE doc_id % 7 <> 3),
        pages AS (SELECT
            'https://site-' || (doc_id % 20) || '.example' AS host,
            'https://site-' || (doc_id % 20) || '.example/doc/' || doc_id
              AS url
          FROM docs),
        hrefs(href) AS (VALUES {hrefs}),
        edges AS (SELECT DISTINCT p.url AS src, p.host || h.href AS dst
                  FROM pages p CROSS JOIN hrefs h),
        nodes AS (SELECT src AS url FROM edges
                  UNION SELECT dst FROM edges),
        outdeg AS (SELECT src, COUNT(*)::BIGINT AS d FROM edges GROUP BY src),
        r0 AS (SELECT url, 1000000::BIGINT AS r FROM nodes),
        {",".join(layers)}
        SELECT url, r::BIGINT AS rank FROM r{iters} ORDER BY url
    """


def _dedup_spans_sql(k: int = 8, min_count: int = 2) -> str:
    """Closed-form oracle for spandedup.remove_duplicated_spans: spans
    counted by STRING (the jaccard_dup_pairs idiom — the Ray side keys on
    63-bit stable hashes, and the driver's value-hash equality is the
    collision-freedom proof), coverage as the DISTINCT union of covered
    1-based word positions, rebuild as an ordered string_agg anti-joined
    against the covered set."""
    return f"""
        WITH docs AS (
          SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
          FROM documents
        ),
        posr AS (
          SELECT doc_id,
                 unnest(range(1, len(w) - {k} + 2)) AS pos,
                 unnest(list_transform(range(1, len(w) - {k} + 2),
                        i -> array_to_string(w[i:i+{k - 1}], ' '))) AS s
          FROM docs WHERE len(w) >= {k}
        ),
        hot AS (SELECT s FROM posr GROUP BY s HAVING COUNT(*) >= {min_count}),
        cov AS (
          SELECT DISTINCT doc_id, idx FROM (
            SELECT p.doc_id, unnest(range(p.pos, p.pos + {k})) AS idx
            FROM posr p JOIN hot USING (s))
        ),
        words AS (
          SELECT doc_id, unnest(w) AS word,
                 unnest(range(1, len(w) + 1)) AS idx
          FROM docs
        ),
        kept AS (
          SELECT wd.doc_id, wd.word, wd.idx
          FROM words wd LEFT JOIN cov c
            ON c.doc_id = wd.doc_id AND c.idx = wd.idx
          WHERE c.doc_id IS NULL
        ),
        agg AS (
          SELECT doc_id, string_agg(word, ' ' ORDER BY idx) AS ct,
                 COUNT(*) AS nk
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.ct, '') AS clean_text,
               (len(d.w) - coalesce(a.nk, 0))::BIGINT AS n_removed
        FROM docs d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
    """


# Queries whose latest driver-recorded green is oldest enumerate FIRST:
# the driver samples a prefix-biased subset of queries(), and insertion
# order is the only lever to refresh stale records (VERDICT r04 "Next
# round" item 3). Order: never-recorded, then last-green r1, r2, r3.
_STALE_RECORD_FIRST = [
    "training_data_job",                                   # new this round
    "minhash_clusters_cascade_fuzzy",                      # never recorded
    "heading_rules", "site_boilerplate",                   # last green r1
    "heading_pattern_stats", "corpus_metrics",
    "extract_metrics", "structural_xml",                   # last green r2
    "structural_xml_embedded", "structural_stats",
    "media_image_features", "media_frame_counts",
    "vlm_captions", "preview_trim_grid",
    "dedup_incremental", "text_profile", "quality_buckets",  # last green r3
    "knn_brute", "knn_ivf", "embedding_dup_pairs",
    "dedup_semantic", "minhash_clusters",
    "minhash_clusters_cascade", "simhash_pairs",
]


def _training_job(sf_dir: str):
    """The composed extract->filter->dedup-cascade->decontaminate->pack
    job (pipelines/trainjob.py); the collected result is the packing
    plan, which transitively pins every upstream stage. Scratch waves
    live in a fresh tmp dir, deleted after collection."""
    import shutil
    import tempfile

    from ebook_ocr_ray.pipelines.trainjob import training_data_job

    scratch = tempfile.mkdtemp(prefix="trainjob_q_")
    try:
        return _sorted_frame(
            training_data_job(sf_dir, scratch)["pack"],
            ["bucket", "seq_idx", "doc_id", "chunk_idx"],
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from ebook_ocr_ray.pipelines import analytics, decontam, neardup, neighbors, quality

    base = {
        "training_data_job": _training_job,
        "jaccard_dup_pairs": lambda sf: _sorted_frame(
            neardup.jaccard_dup_pairs(sf), ["id_a", "id_b"]
        ),
        "dedup_spans": lambda sf: _sorted_frame(_dedup_spans(sf), ["doc_id"]),
        "strip_boilerplate": lambda sf: _sorted_frame(
            _strip_boilerplate(sf), ["url"]
        ),
        "media_audio_features": _media_audio_features,
        "media_frame_index": _media_frame_index,
        # round-4 additions (also never driver-recorded yet)
        "dedup_url": _dedup_url,
        "gopher_quality": lambda sf: _sorted_frame(_gopher_quality(sf), ["doc_id"]),
        "anchor_text_stats": lambda sf: _sorted_frame(
            _anchor_text_stats(sf), ["site", "href"]
        ),
        "crawl_delta": _crawl_delta,
        "crawl_history": _crawl_history,
        # extraction family (closed-form oracles)
        "extract_docs": _extract_docs,
        "extract_html": lambda sf: _extract_docs(sf, kind="html"),
        "extract_pdf": lambda sf: _extract_docs(sf, kind="pdf"),
        "extract_headings": _extract_headings,
        "dedup_pages": _dedup_pages,
        "dedup_pages_bloom": _dedup_pages_bloom,
        "sequence_dedup_pages": _sequence_dedup_pages,
        "split_spreads": _split_spreads,
        "consolidate_books": _consolidate_books,
        "extract_fallback": _extract_fallback,
        "lineage_sites": _lineage_sites,
        "outlinks": _outlinks,
        "pagerank": lambda sf: _sorted_frame(_pagerank(sf), ["url"]),
        # relational / windowed (aggregates returned as total-ordered frames)
        "q1_pricing": lambda sf: _sorted_frame(
            analytics.q1_pricing(sf), ["l_returnflag", "l_linestatus"]
        ),
        "priority_revenue": lambda sf: _sorted_frame(
            analytics.priority_revenue(sf), ["priority"]
        ),
        "purchase_attribution": analytics.purchase_attribution,
        "clicks_before_purchase": analytics.clicks_before_purchase,
        "events_hourly": lambda sf: _sorted_frame(
            analytics.events_hourly(sf), ["user_id", "window_start"]
        ),
        "events_gaps": analytics.events_gaps,
        "orders_by_region": lambda sf: _sorted_frame(
            analytics.orders_by_region(sf), ["region"]
        ),
        "top_terms": analytics.top_terms,
        "source_stats": lambda sf: _sorted_frame(analytics.source_stats(sf), ["source"]),
        "sessionize": lambda sf: _sorted_frame(
            analytics.sessionize(sf), ["user_id", "session_idx"]
        ),
        "top_docs_per_source": lambda sf: _sorted_frame(
            analytics.top_docs_per_source(sf), ["source", "rank"]
        ),
        "token_quantiles": lambda sf: _sorted_frame(
            analytics.token_quantiles_per_source(sf), ["source"]
        ),
        "redact_pii": analytics.redact_pii,
        "stratified_sample": analytics.stratified_sample,
        "rebalance_langs": lambda sf: _sorted_frame(
            analytics.rebalance_langs(sf), ["doc_id"]
        ),
        "chunk_documents": analytics.chunk_documents,
        "repetition_profile": analytics.repetition_profile,
        "distinct_terms_hll": analytics.distinct_terms_hll,
        "pack_sequences": lambda sf: _sorted_frame(
            analytics.pack_sequences(sf), ["bucket", "seq_idx", "doc_id", "chunk_idx"]
        ),
        "tfidf_top_terms": lambda sf: _sorted_frame(
            analytics.tfidf_top_terms(sf), ["source", "term"]
        ),
        # text analysis
        "train_val_split": analytics.train_val_split,
        "decontaminate": lambda sf: _sorted_frame(decontam.decontaminate(sf), ["doc_id"]),
        "decontaminate_join": lambda sf: _sorted_frame(
            decontam.decontaminate_join(sf), ["doc_id"]
        ),
        "token_stats": analytics.token_table,
        "doc_fingerprint": analytics.fingerprint_table,
        "dedup_exact_docs": analytics.dedup_exact_docs,
        "dedup_fuzzy_exact": lambda sf: _sorted_frame(
            analytics.dedup_fuzzy_exact(sf), ["doc_id"]
        ),
        "dedup_incremental": lambda sf: _sorted_frame(
            _dedup_incremental(sf), ["doc_id"]
        ),
        "text_profile": analytics.text_profile,
        "quality_buckets": lambda sf: _sorted_frame(
            quality.quality_buckets(sf), ["doc_id"]
        ),
        # similarity / near-dup
        "knn_brute": neighbors.knn_brute,
        "knn_ivf": neighbors.knn_ivf,                    # rows-only (approx)
        "embedding_dup_pairs": neighbors.embedding_dup_pairs,
        "dedup_semantic": lambda sf: _sorted_frame(
            neighbors.dedup_semantic(sf), ["vec_id"]
        ),
        "minhash_clusters": lambda sf: _sorted_frame(
            neardup.minhash_clusters(sf), ["doc_id"]
        ),
        "minhash_clusters_cascade": lambda sf: _sorted_frame(
            neardup.minhash_clusters_cascade(sf), ["doc_id"]
        ),
        # fuzzy (normalized-text) cascade stage: the sf corpora hold no
        # case/punct variants, so the equality contract reduces to the
        # byte-exact one and the minhash oracle applies verbatim
        "minhash_clusters_cascade_fuzzy": lambda sf: _sorted_frame(
            neardup.minhash_clusters_cascade(sf, fuzzy=True), ["doc_id"]
        ),
        "simhash_pairs": lambda sf: _sorted_frame(
            neardup.simhash_pairs(sf), ["id_a", "id_b"]
        ),
        # extraction metadata (ensemble internals, closed-form oracle)
        "extract_metrics": _extract_metrics,
        # structural stage (book_converter analog)
        "structural_xml": _structural_xml,
        "structural_xml_embedded": _structural_xml_embedded,
        "structural_stats": _structural_stats,
        # multimodal columns (binary payload + typed metadata)
        "media_image_features": _media_image_features,
        "media_frame_counts": _media_frame_counts,
        "vlm_captions": _vlm_captions,
        "preview_trim_grid": lambda sf: _sorted_frame(
            _preview_trim_grid(sf), ["media_id", "direction", "ratio"]
        ),
        # heading normalization / self-repair rules
        "heading_rules": _heading_rules,
        # corpus-level boilerplate mining (groupby site)
        "site_boilerplate": _site_boilerplate,
        "heading_pattern_stats": _heading_pattern_stats,
        # global pipeline metrics (one-row aggregate)
        "corpus_metrics": _corpus_metrics,
    }
    front = {k: base[k] for k in _STALE_RECORD_FIRST}
    return front | {k: v for k, v in base.items() if k not in front}


# Shared CTE fragments for the sketch oracles: exact re-expression of
# functions/textstats.py shingle_hashes (md5 first-8-bytes little-endian ->
# uint64) in DuckDB HUGEINT arithmetic. `mult` carries exact 256^i literals
# because DuckDB's ** operator is double-precision pow and loses low bits.
_MULT_CTE = """mult(i, m) AS (VALUES (0, 1::HUGEINT), (1, 256::HUGEINT),
  (2, 65536::HUGEINT), (3, 16777216::HUGEINT), (4, 4294967296::HUGEINT),
  (5, 1099511627776::HUGEINT), (6, 281474976710656::HUGEINT),
  (7, 72057594037927936::HUGEINT))"""

# word_shingles semantics (textstats.py:97-106): split on single spaces
# (empties kept), len(words) < k collapses to ONE whole-text shingle,
# empty/whitespace-only docs produce no shingles at all (sketch sentinels).
def _shingle_ctes(k: int, src: str = "documents", prefix: str = "") -> str:
    """``src``/``prefix`` let one query host several shingle chains (the
    composed training-job oracle shingles two different corpora at two
    different k) without CTE-name collisions."""
    joined = " || ' ' || ".join(f"w[i+{d}]" if d else "w[i]" for d in range(k))
    # trim's second argument lists every char Python str.strip() removes
    # for ASCII input (bare trim() strips ONLY spaces, which would keep a
    # '\\n'-only doc alive in the oracle while the pipeline sentinels it)
    return f"""{prefix}docs AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM {src}
  WHERE text IS NOT NULL
    AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) <> ''
),
{prefix}shingled AS (
  SELECT doc_id,
    CASE WHEN len(w) < {k} THEN [array_to_string(w, ' ')]
         ELSE list_transform(range(1, len(w) - {k - 2}), i -> {joined})
    END AS shingles
  FROM {prefix}docs
)"""


def _text_profile_sql() -> str:
    """Closed-form oracle for analytics.text_profile. Each column mirrors
    the Python heuristic exactly: trigram hits are counted with the
    replace-length trick (non-overlapping left-to-right removal == Python
    str.count), dict order of _LANG_PROFILES becomes the tie-break
    priority, the (.)\\1{4} char-run penalty becomes a positional
    self-join (RE2 has no backreferences), int(round(x)) maps to
    CAST(x AS BIGINT) — ties-to-even for DOUBLE inputs, which this
    expression is (typeof-verified; DECIMAL casts round half AWAY and
    would diverge) — and the Karp-Rabin fold runs through list_reduce in
    HUGEINT. The alpha class \\p{L} + explicit ASCII whitespace mirrors
    Python isalpha()/isspace() up to exotic Unicode spaces (U+00A0 etc.),
    which the corpus schema excludes."""
    from ebook_ocr_ray.functions.textstats import _LANG_PROFILES

    grams = ", ".join(
        f"('{lang}', {prio}, '{g}')"
        for prio, (lang, gs) in enumerate(_LANG_PROFILES.items())
        for g in gs
    )
    return f"""
        WITH langgrams(lang, prio, g) AS (VALUES {grams}),
        samp AS (SELECT doc_id, lower(substr(text, 1, 512)) AS s FROM documents),
        hits AS (
          SELECT d.doc_id, lg.lang, lg.prio,
                 SUM((length(d.s) - length(replace(d.s, lg.g, '')))
                     // length(lg.g)) AS hits
          FROM samp d CROSS JOIN langgrams lg
          GROUP BY 1, 2, 3),
        best AS (
          SELECT doc_id, lang, hits,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY hits DESC, prio) AS rn
          FROM hits),
        lang_pred AS (
          SELECT doc_id, CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_pred
          FROM best WHERE rn = 1),
        runs AS (
          SELECT DISTINCT d.doc_id
          FROM documents d,
               LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 3, 1)))
                        AS i) r
          WHERE substr(d.text, r.i::INT, 1) <> chr(10)
            AND substr(d.text, r.i::INT, 1) = substr(d.text, r.i::INT + 1, 1)
            AND substr(d.text, r.i::INT, 1) = substr(d.text, r.i::INT + 2, 1)
            AND substr(d.text, r.i::INT, 1) = substr(d.text, r.i::INT + 3, 1)
            AND substr(d.text, r.i::INT, 1) = substr(d.text, r.i::INT + 4, 1)),
        quality AS (
          SELECT d.doc_id,
            CASE WHEN length(d.text) = 0 THEN 0 ELSE
              CAST(greatest(0.0, least(1.0,
                0.4 * least(len(string_split(d.text, ' ')) / 50.0, 1.0)
              + 0.3 * ((length(d.text)
                        - length(regexp_replace(d.text,
                                                '[\\p{{L}}\\t\\n\\x0b\\f\\r ]',
                                                '', 'g')))::DOUBLE
                       / length(d.text))
              + 0.3 * least((len(list_filter(string_split(d.text, ' '),
                             w -> w IN ({_STOPLIST_SQL})))::DOUBLE
                             / len(string_split(d.text, ' '))) * 4, 1.0)
              - CASE WHEN r.doc_id IS NOT NULL THEN 0.5 ELSE 0.0 END
              )) * 1000 AS BIGINT) END AS quality_milli
          FROM documents d LEFT JOIN runs r ON d.doc_id = r.doc_id),
        roll AS (
          SELECT doc_id,
            CASE WHEN length(text) = 0 THEN 0 ELSE
              list_reduce(
                list_transform(string_split(text, ''), c -> unicode(c)::HUGEINT),
                (a, c) -> (a * 1000003 + c) % 2305843009213693951)
            END::BIGINT AS fp_roll
          FROM documents)
        SELECT d.doc_id, l.lang_pred, q.quality_milli, r.fp_roll
        FROM documents d
        JOIN lang_pred l ON d.doc_id = l.doc_id
        JOIN quality q ON d.doc_id = q.doc_id
        JOIN roll r ON d.doc_id = r.doc_id
    """


def _distinct_terms_hll_sql() -> str:
    """Closed-form oracle for analytics.distinct_terms_hll: the HLL
    registers, the EXACT-integer harmonic sum (every addend is a power of
    two from an embedded table, so no float summation order exists), and
    the single-division estimate with the linear-counting branch are all
    reproduced with the identical double literals and operation order —
    the sketch estimate is bit-deterministic, so even the approximate
    column byte-matches."""
    from ebook_ocr_ray.functions.sketches import HLL_ALPHA

    bitlen = ", ".join(f"({k}, {1 << (k - 1)}::HUGEINT)" for k in range(1, 53))
    pow2 = ", ".join(f"({e}, {1 << e}::HUGEINT)" for e in range(11, 65))
    return f"""
        WITH {_MULT_CTE},
        bl(k, p) AS (VALUES {bitlen}),
        pow2(e, v) AS (VALUES {pow2}),
        t AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS term
              FROM documents),
        h AS (
          SELECT (
            SELECT SUM(
               ((strpos('0123456789abcdef', substr(md5(t.term), 2*i+1, 1))-1) * 16
              + (strpos('0123456789abcdef', substr(md5(t.term), 2*i+2, 1))-1))::HUGEINT * m
            ) FROM mult
          ) AS h FROM t
        ),
        hb AS (SELECT h // 4503599627370496 AS bucket,
                      h % 4503599627370496 AS rest FROM h),
        rk AS (SELECT bucket,
                      53 - (SELECT COALESCE(MAX(k), 0) FROM bl
                            WHERE hb.rest >= bl.p) AS rank
               FROM hb),
        regs0 AS (SELECT bucket, MAX(rank) AS reg FROM rk GROUP BY bucket),
        allregs AS (
          SELECT gs.b AS bucket, COALESCE(r.reg, 0) AS reg
          FROM (SELECT unnest(range(0, 4096)) AS b) gs
          LEFT JOIN regs0 r ON gs.b = r.bucket),
        s AS (SELECT SUM(p2.v) AS s_int,
                     CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
              FROM allregs JOIN pow2 p2 ON p2.e = 64 - reg),
        raw AS (SELECT {HLL_ALPHA!r}::DOUBLE * 4096 * 4096
                         * 18446744073709551616.0
                         / CAST(s_int AS DOUBLE) AS e, v FROM s),
        est AS (SELECT CASE WHEN e <= 10240.0 AND v > 0
                            THEN 4096 * ln(4096.0 / v) ELSE e END AS e
                FROM raw)
        SELECT (SELECT COUNT(*) FROM t) AS n_exact,
               CAST(floor(e) AS BIGINT) AS hll_estimate
        FROM est
    """


def _jaccard_dup_pairs_sql() -> str:
    """Closed-form oracle for neardup.jaccard_dup_pairs: exact 3-word-
    shingle Jaccard >= 1/2 via a string-exact shingle self-join (the Ray
    side keys on 63-bit shingle hashes — value-hash equality here is the
    collision-freedom proof). Integer-rational threshold compare, same as
    the pipeline. Precondition: no posting list exceeds JACCARD_DF_CAP
    (holds at oracle scale: corpus 500 < 512)."""
    return f"""
        WITH {_shingle_ctes(3)},
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM shingled),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pair_inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT p.id_a, p.id_b, p.inter,
               (sa.n + sb.n - p.inter) AS un
        FROM pair_inter p
        JOIN sizes sa ON sa.doc_id = p.id_a
        JOIN sizes sb ON sb.doc_id = p.id_b
        WHERE 2 * p.inter >= (sa.n + sb.n - p.inter)
        ORDER BY p.id_a, p.id_b
    """


def _simhash_pairs_sql() -> str:
    """Closed-form oracle for neardup.simhash_pairs (max_hamming=3):
    pigeonhole band sizing (4 tables) guarantees every pair within hamming
    3 shares a band, so the pipeline's output is EXACTLY the set of
    non-empty-text doc pairs with hamming(simhash64) <= 3 — computable by
    an all-pairs hamming filter with no banding at oracle scale.
    Precondition: no bucket exceeds MAX_BUCKET (holds by construction
    here: bucket size <= corpus 500 < 512; the pipeline logs loudly when
    its bounded-recall star fallback ever engages)."""
    return f"""
        WITH {_MULT_CTE},
        {_shingle_ctes(2)},
        sh AS (SELECT doc_id, unnest(shingles) AS s FROM shingled),
        hashed AS (
          SELECT doc_id, (
            SELECT SUM(
               ((strpos('0123456789abcdef', substr(md5(sh.s), 2*i+1, 1))-1) * 16
              + (strpos('0123456789abcdef', substr(md5(sh.s), 2*i+2, 1))-1))::HUGEINT * m
            ) FROM mult
          ) AS h FROM sh
        ),
        bits AS (
          SELECT doc_id, j.j AS j,
            CASE WHEN SUM(CASE WHEN (h // (1::HUGEINT << j.j)) % 2 = 1
                              THEN 1 ELSE -1 END) > 0
                 THEN 1 ELSE 0 END AS bit
          FROM hashed CROSS JOIN range(0, 64) j(j)
          GROUP BY doc_id, j.j
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)::BIGINT AS hamming
        FROM bits a JOIN bits b ON a.j = b.j AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 3
        ORDER BY 1, 2
    """


def _minhash_clusters_sql() -> str:
    """Closed-form oracle for neardup.minhash_clusters: 64-perm MinHash
    (universal-hash constants from sketches.py embedded as literals), 16x4
    banded LSH candidates, exact-Jaccard(3-word shingles) >= 0.7 verify,
    connected components via recursive CTE, cluster label = component min
    doc_id (singletons label themselves). Precondition: no LSH bucket
    exceeds MAX_BUCKET (holds here — corpus 500 < 512; overflow engages
    the pipeline's logged bounded-recall star fallback)."""
    from ebook_ocr_ray.functions.sketches import _A, _B

    perms = ", ".join(
        f"({p}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for p, (a, b) in enumerate(zip(_A, _B))
    )
    return f"""
        WITH RECURSIVE {_MULT_CTE},
        perms(p, a, b) AS (VALUES {perms}),
        {_shingle_ctes(3)},
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM shingled),
        hashed AS (
          SELECT doc_id, (
            SELECT SUM(
               ((strpos('0123456789abcdef', substr(md5(sh.s), 2*i+1, 1))-1) * 16
              + (strpos('0123456789abcdef', substr(md5(sh.s), 2*i+2, 1))-1))::HUGEINT * m
            ) % 2147483647 FROM mult
          ) AS x FROM sh
        ),
        sigs AS (
          SELECT doc_id, p, MIN((a * x + b) % 2147483647) AS sig
          FROM hashed CROSS JOIN perms
          GROUP BY doc_id, p
        ),
        bandsigs AS (
          SELECT doc_id, p // 4 AS band,
            MAX(CASE WHEN p % 4 = 0 THEN sig END) AS s0,
            MAX(CASE WHEN p % 4 = 1 THEN sig END) AS s1,
            MAX(CASE WHEN p % 4 = 2 THEN sig END) AS s2,
            MAX(CASE WHEN p % 4 = 3 THEN sig END) AS s3
          FROM sigs GROUP BY doc_id, p // 4
        ),
        bands AS (
          SELECT doc_id, band,
            ((((((s0 * 1000003 + s1) % 9223372036854775808) * 1000003 + s2)
               % 9223372036854775808) * 1000003 + s3)
               % 9223372036854775808)::BIGINT AS key
          FROM bandsigs
        ),
        cands AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.key = b.key
                      AND a.doc_id < b.doc_id
        ),
        shc AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS i
          FROM cands c
          JOIN sh sa ON sa.doc_id = c.id_a
          JOIN sh sb ON sb.doc_id = c.id_b AND sa.s = sb.s
          GROUP BY c.id_a, c.id_b
        ),
        edges AS (
          SELECT c.id_a AS a, c.id_b AS b
          FROM cands c
          JOIN shc na ON na.doc_id = c.id_a
          JOIN shc nb ON nb.doc_id = c.id_b
          LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
          WHERE COALESCE(i.i, 0)::DOUBLE
                  / (na.n + nb.n - COALESCE(i.i, 0)) >= 0.7
        ),
        sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
        reach AS (
          SELECT a AS node, b AS r FROM sym
          UNION
          SELECT r.node, e.b AS r FROM reach r JOIN sym e ON r.r = e.a
        ),
        labels AS (SELECT node, LEAST(MIN(r), node) AS label
                   FROM reach GROUP BY node)
        SELECT d.doc_id, COALESCE(l.label, d.doc_id)::BIGINT AS cluster_id
        FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
        ORDER BY d.doc_id
    """


def _decontaminate_sql() -> str:
    """Closed-form oracle for decontam.decontaminate: benchmark = docs
    with doc_id % BENCH_MOD == 0, contamination = count of DISTINCT
    8-word shingles shared with any benchmark doc (shingle semantics
    identical to the sketch oracles via _shingle_ctes: <8-word docs are
    one whole-text shingle, empty docs none)."""
    from ebook_ocr_ray.pipelines.decontam import BENCH_MOD, DECONTAM_NGRAM

    return f"""
        WITH {_shingle_ctes(DECONTAM_NGRAM)},
        ds AS (SELECT doc_id, unnest(shingles) AS s FROM shingled),
        bench AS (SELECT DISTINCT s FROM ds WHERE doc_id % {BENCH_MOD} = 0),
        hits AS (
          SELECT ds.doc_id, COUNT(DISTINCT ds.s) AS n
          FROM ds JOIN bench USING (s)
          GROUP BY ds.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
               CAST(CASE WHEN COALESCE(h.n, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS contaminated
        FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        ORDER BY d.doc_id
    """


def _dedup_url_sql() -> str:
    """Replays pages synthesis (base crawl + the two URL-variant recrawls
    for doc_id % 6 == 1, sources/pages.py URL_VARIANT_EVERY) and the exact
    normalization rewrite chain of extraction.URL_NORM_REWRITES — same
    regexes, same order, RE2 on both sides."""
    return f"""
        WITH crawls AS (
            SELECT {_URL_SQL} AS url, {_TS_SQL} AS warc_ts FROM documents
            UNION ALL
            SELECT 'HTTP://WWW.SITE-' || (doc_id % 20) || '.EXAMPLE/DOC/'
                       || doc_id || '/',
                   {_TS_SQL} + INTERVAL 1 DAY
            FROM documents WHERE doc_id % 6 = 1
            UNION ALL
            SELECT {_URL_SQL} || '?utm_source=feed&ref=rss#frag',
                   {_TS_SQL} + INTERVAL 2 DAY
            FROM documents WHERE doc_id % 6 = 1
        ), norm AS (
            SELECT regexp_replace(regexp_replace(regexp_replace(
                       lower(url), '^(https?://|www\\.)+', ''),
                       '[?#].*$', ''), '/+$', '') AS url_norm,
                   url, warc_ts
            FROM crawls
        )
        SELECT url_norm, url, warc_ts,
               CAST(COUNT(*) OVER (PARTITION BY url_norm) AS BIGINT) AS n_crawls
        FROM norm
        QUALIFY ROW_NUMBER() OVER (PARTITION BY url_norm
                                   ORDER BY warc_ts, url) = 1
        ORDER BY url_norm
    """


def _gopher_quality_sql() -> str:
    """Replays quality.gopher_rule_stats: same split-on-single-space
    tokenization (string_split, not regex — '' yields one empty token on
    both sides), same integer cross-multiplied thresholds, stoplist
    shared from textstats.STOPWORDS."""
    return f"""
        WITH words AS (
            -- COALESCE matches the engine's fillna(''): a NULL-text doc
            -- must emit one empty-token row on BOTH sides, not vanish
            SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS w
            FROM documents
        ), wc AS (
            SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2
        ), per AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_words,
                   CAST(SUM(c * length(w)) AS BIGINT) AS sum_wlen,
                   CAST(COALESCE(SUM(CASE WHEN w IN ({_STOPLIST_SQL})
                                          THEN c END), 0) AS BIGINT) AS n_stop,
                   CAST(MAX(c) AS BIGINT) AS top_n
            FROM wc GROUP BY doc_id
        )
        SELECT doc_id, n_words, sum_wlen, n_stop, top_n,
               CAST(CASE WHEN n_words >= 40
                          AND 3 * n_words <= sum_wlen
                          AND sum_wlen <= 10 * n_words
                          AND n_stop >= 2
                          AND 5 * top_n <= n_words
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM per ORDER BY doc_id
    """


def _quality_buckets_sql(vocab_cap: int | None = None) -> str:
    """Replays quality.quality_buckets INCLUDING the per-language
    vocabulary cap (quality.py QUALITY_LM_VOCAB_CAP): model entries are
    the top-cap bigrams per lang under the frozen rank (count DESC,
    bigram ASC, mirrored by QUALIFY row_number); a bigram past the cap
    scores at the lang's add-one default lp. Totals T and global vocab V
    stay PRE-cap, so kept entries' probabilities are cap-independent.
    The micro-nat CAST is the only float op; scoring / thresholds /
    buckets are exact int64 in both engines. quantile_disc ==
    sorted[ceil(q*n)-1], the token_quantiles convention."""
    from ebook_ocr_ray.pipelines.quality import QUALITY_LM_VOCAB_CAP

    cap = QUALITY_LM_VOCAB_CAP if vocab_cap is None else vocab_cap
    return f"""
        WITH docs AS (SELECT doc_id, lang, text FROM documents),
        bg AS (
          SELECT doc_id, lang,
                 unnest(list_transform(range(1, length(text)),
                        i -> substr(text, i, 2))) AS g
          FROM docs WHERE length(text) >= 2),
        model AS (SELECT lang, g, COUNT(*)::BIGINT AS c FROM bg GROUP BY 1, 2),
        tot AS (SELECT lang, SUM(c)::BIGINT AS t FROM model
                WHERE lang IS NOT NULL GROUP BY 1),
        vocab AS (SELECT COUNT(DISTINCT g)::BIGINT AS v FROM bg),
        model_q AS (
          SELECT m.lang, m.g,
                 CAST(-ln((m.c + 1)::DOUBLE / (tt.t + vocab.v)) * 1000000
                      AS BIGINT) AS lp
          FROM model m JOIN tot tt ON tt.lang = m.lang CROSS JOIN vocab
          QUALIFY row_number() OVER (PARTITION BY m.lang
                                     ORDER BY m.c DESC, m.g) <= {cap}),
        dflt AS (
          SELECT tt.lang,
                 CAST(-ln(1.0 / (tt.t + vocab.v)) * 1000000 AS BIGINT) AS lp
          FROM tot tt CROSS JOIN vocab),
        scored AS (
          SELECT b.doc_id, b.lang,
                 SUM(coalesce(q.lp, d.lp)) // COUNT(*) AS ce_micro
          FROM bg b
          JOIN dflt d ON d.lang = b.lang
          LEFT JOIN model_q q ON q.lang = b.lang AND q.g = b.g
          GROUP BY 1, 2),
        allscored AS (
          SELECT d.doc_id, d.lang, coalesce(s.ce_micro, 0)::BIGINT AS ce_micro
          FROM docs d LEFT JOIN scored s ON s.doc_id = d.doc_id),
        th AS (
          SELECT lang, quantile_disc(ce_micro // 1000, 1.0/3) AS t1,
                 quantile_disc(ce_micro // 1000, 2.0/3) AS t2
          FROM allscored GROUP BY lang)
        SELECT a.doc_id, a.lang, a.ce_micro,
               CASE WHEN a.ce_micro // 1000 <= th.t1 THEN 'head'
                    WHEN a.ce_micro // 1000 <= th.t2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        -- IS NOT DISTINCT FROM: the engine deliberately keeps null-lang
        -- documents (routed through its internal sentinel); a plain
        -- equality join would drop the oracle's NULL-lang group and
        -- diverge on any corpus with language-ID failures
        FROM allscored a JOIN th ON th.lang IS NOT DISTINCT FROM a.lang
        ORDER BY a.doc_id
    """


def _training_job_sql() -> str:
    """Full-value oracle for trainjob.training_data_job — the composed
    extract -> Gopher -> fuzzy-dedup -> MinHash cascade -> decontaminate
    -> chunk+pack pipeline, replayed as one CTE chain of the per-stage
    oracles. The output (the packing plan) transitively pins every
    upstream stage: any drift in extraction bytes, rule thresholds,
    dedup keys, cluster labels, or bench membership changes doc
    membership and hence pack order. Stage mirrors:

    - doc_id = stable_hash63(url): md5 first-8-bytes little-endian via
      the _MULT_CTE byte fold, mod 2^63 (textstats.stable_hash63);
    - Gopher: _gopher_quality_sql's integer thresholds inlined;
    - fuzzy survivors: dedup_fuzzy_exact's normalization, MIN(doc_id);
    - MinHash: _minhash_clusters_sql verbatim over the survivors
      (same no-bucket-overflow precondition), training keeps docs whose
      component label is their own id;
    - decontamination: _decontaminate_sql's shingle semantics, bench =
      the Gopher-kept corpus's doc_id % BENCH_MOD slice, survivors must
      be outside the slice with zero shared n-grams;
    - chunk+pack: the pack_sequences recursive greedy fold."""
    from ebook_ocr_ray.functions.sketches import _A, _B
    from ebook_ocr_ray.pipelines.analytics import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        PACK_BUCKETS,
        PACK_BUDGET_TOKENS,
    )
    from ebook_ocr_ray.pipelines.decontam import BENCH_MOD, DECONTAM_NGRAM

    perms = ", ".join(
        f"({p}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for p, (a, b) in enumerate(zip(_A, _B))
    )
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    return f"""
        WITH RECURSIVE {_MULT_CTE},
        perms(p, a, b) AS (VALUES {perms}),
        u AS (SELECT {_URL_SQL} AS url, {_TEXT_SQL} AS text FROM documents),
        corpus AS (
          SELECT (SELECT SUM(
               ((strpos('0123456789abcdef', substr(md5(u.url), 2*i+1, 1))-1) * 16
              + (strpos('0123456789abcdef', substr(md5(u.url), 2*i+2, 1))-1))::HUGEINT * m
            ) % 9223372036854775808 FROM mult)::BIGINT AS doc_id,
            u.text
          FROM u),
        gw AS (SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS w
               FROM corpus),
        gwc AS (SELECT doc_id, w, COUNT(*) AS c FROM gw GROUP BY 1, 2),
        gper AS (
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_words,
                 CAST(SUM(c * length(w)) AS BIGINT) AS sum_wlen,
                 CAST(COALESCE(SUM(CASE WHEN w IN ({_STOPLIST_SQL})
                                        THEN c END), 0) AS BIGINT) AS n_stop,
                 CAST(MAX(c) AS BIGINT) AS top_n
          FROM gwc GROUP BY doc_id),
        kept AS (
          SELECT c.doc_id, c.text FROM corpus c JOIN gper g USING (doc_id)
          WHERE g.n_words >= 40 AND 3 * g.n_words <= g.sum_wlen
            AND g.sum_wlen <= 10 * g.n_words AND g.n_stop >= 2
            AND 5 * g.top_n <= g.n_words),
        normed AS (
          SELECT doc_id, text,
                 trim(regexp_replace(regexp_replace(
                   lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nt
          FROM kept),
        freps AS (SELECT nt, MIN(doc_id) AS rep FROM normed GROUP BY nt),
        surv AS (SELECT n.doc_id, n.text FROM normed n
                 JOIN freps r ON r.nt = n.nt AND r.rep = n.doc_id),
        {_shingle_ctes(3, src="surv", prefix="m")},
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM mshingled),
        mhash AS (
          SELECT doc_id, (
            SELECT SUM(
               ((strpos('0123456789abcdef', substr(md5(sh.s), 2*i+1, 1))-1) * 16
              + (strpos('0123456789abcdef', substr(md5(sh.s), 2*i+2, 1))-1))::HUGEINT * m
            ) % 2147483647 FROM mult
          ) AS x FROM sh
        ),
        sigs AS (
          SELECT doc_id, p, MIN((a * x + b) % 2147483647) AS sig
          FROM mhash CROSS JOIN perms
          GROUP BY doc_id, p
        ),
        bandsigs AS (
          SELECT doc_id, p // 4 AS band,
            MAX(CASE WHEN p % 4 = 0 THEN sig END) AS s0,
            MAX(CASE WHEN p % 4 = 1 THEN sig END) AS s1,
            MAX(CASE WHEN p % 4 = 2 THEN sig END) AS s2,
            MAX(CASE WHEN p % 4 = 3 THEN sig END) AS s3
          FROM sigs GROUP BY doc_id, p // 4
        ),
        bands AS (
          SELECT doc_id, band,
            ((((((s0 * 1000003 + s1) % 9223372036854775808) * 1000003 + s2)
               % 9223372036854775808) * 1000003 + s3)
               % 9223372036854775808)::BIGINT AS key
          FROM bandsigs
        ),
        cands AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.key = b.key
                      AND a.doc_id < b.doc_id
        ),
        shc AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS i
          FROM cands c
          JOIN sh sa ON sa.doc_id = c.id_a
          JOIN sh sb ON sb.doc_id = c.id_b AND sa.s = sb.s
          GROUP BY c.id_a, c.id_b
        ),
        edges AS (
          SELECT c.id_a AS a, c.id_b AS b
          FROM cands c
          JOIN shc na ON na.doc_id = c.id_a
          JOIN shc nb ON nb.doc_id = c.id_b
          LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
          WHERE COALESCE(i.i, 0)::DOUBLE
                  / (na.n + nb.n - COALESCE(i.i, 0)) >= 0.7
        ),
        sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
        reach AS (
          SELECT a AS node, b AS r FROM sym
          UNION
          SELECT r.node, e.b AS r FROM reach r JOIN sym e ON r.r = e.a
        ),
        labels AS (SELECT node, LEAST(MIN(r), node) AS label
                   FROM reach GROUP BY node),
        final AS (
          SELECT s.doc_id, s.text FROM surv s
          LEFT JOIN labels l ON l.node = s.doc_id
          WHERE COALESCE(l.label, s.doc_id) = s.doc_id),
        {_shingle_ctes(DECONTAM_NGRAM, src="kept", prefix="d")},
        dsh AS (SELECT doc_id, unnest(shingles) AS s FROM dshingled),
        bench AS (SELECT DISTINCT s FROM dsh WHERE doc_id % {BENCH_MOD} = 0),
        hits AS (
          SELECT dsh.doc_id, COUNT(*) AS nh
          FROM dsh JOIN bench USING (s) GROUP BY 1),
        train AS (
          SELECT f.doc_id, f.text FROM final f
          LEFT JOIN hits h ON h.doc_id = f.doc_id
          WHERE f.doc_id % {BENCH_MOD} <> 0 AND COALESCE(h.nh, 0) = 0),
        w AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM train),
        ch AS (
          SELECT doc_id, i.i AS chunk_idx,
                 least({CHUNK_TOKENS}, n - i.i * {stride}) AS n_tokens
          FROM w, LATERAL (
            SELECT unnest(range(0, greatest(1,
              (n - {CHUNK_OVERLAP} + {stride - 1}) // {stride}))) AS i) i),
        rows_r AS (
          SELECT doc_id % {PACK_BUCKETS} AS bucket, doc_id, chunk_idx, n_tokens,
                 row_number() OVER (PARTITION BY doc_id % {PACK_BUCKETS}
                                    ORDER BY doc_id, chunk_idx) AS rn
          FROM ch),
        packed AS (
          SELECT bucket, rn, doc_id, chunk_idx, n_tokens,
                 CAST(0 AS BIGINT) AS seq_idx, n_tokens AS filled
          FROM rows_r WHERE rn = 1
          UNION ALL
          SELECT r.bucket, r.rn, r.doc_id, r.chunk_idx, r.n_tokens,
                 CASE WHEN p.filled > 0
                       AND p.filled + r.n_tokens > {PACK_BUDGET_TOKENS}
                      THEN p.seq_idx + 1 ELSE p.seq_idx END,
                 CASE WHEN p.filled > 0
                       AND p.filled + r.n_tokens > {PACK_BUDGET_TOKENS}
                      THEN r.n_tokens ELSE p.filled + r.n_tokens END
          FROM packed p
          JOIN rows_r r ON r.bucket = p.bucket AND r.rn = p.rn + 1)
        SELECT bucket, seq_idx, doc_id, chunk_idx, n_tokens
        FROM packed ORDER BY bucket, seq_idx, doc_id, chunk_idx
    """


def oracle_sql() -> dict[str, str]:
    return {
        "training_data_job": _training_job_sql(),
        "dedup_url": _dedup_url_sql(),
        "gopher_quality": _gopher_quality_sql(),
        # crawl set replayed from the duplicates+versions fixture rules
        # (DUP_EVERY / VERSION_EVERY); `rev` is the payload-identity
        # surrogate — payloads are equal exactly when (doc_id, revision
        # flag) are, so COUNT(DISTINCT rev) == the engine's distinct-md5
        "crawl_history": f"""
            WITH crawls AS (
                SELECT {_URL_SQL} AS url, {_TS_SQL} AS ts, 0 AS rev
                FROM documents
                UNION ALL
                SELECT {_URL_SQL}, {_TS_SQL} + INTERVAL 1 DAY, 0
                FROM documents WHERE doc_id % 10 = 0
                UNION ALL
                SELECT {_URL_SQL}, {_TS_SQL} + INTERVAL 1 DAY, 0
                FROM documents WHERE doc_id % 5 = 0
                UNION ALL
                SELECT {_URL_SQL}, {_TS_SQL} + INTERVAL 2 DAY, 1
                FROM documents WHERE doc_id % 5 = 0
            )
            SELECT url,
                   CAST(COUNT(*) AS BIGINT) AS n_crawls,
                   CAST(COUNT(DISTINCT rev) AS BIGINT) AS n_payloads,
                   MIN(ts) AS first_ts,
                   MAX(ts) AS last_ts
            FROM crawls GROUP BY url ORDER BY url
        """,
        # closed form of the snapshot fixture: payload equality is exactly
        # text equality (synth_payload embeds the text byte-for-byte), so
        # 'changed' is exactly the VERSION_SUFFIX rule; removal wins over
        # revision by construction (sources/pages.py snapshot_pages_batch)
        "crawl_delta": f"""
            SELECT url, status FROM (
                SELECT {_URL_SQL} AS url,
                       CASE WHEN doc_id % 13 = 5 THEN 'removed'
                            WHEN doc_id % 5 = 0 THEN 'changed'
                            ELSE 'same' END AS status
                FROM documents
                UNION ALL
                SELECT 'https://site-' || ((doc_id + 1000000000000) % 20)
                           || '.example/doc/' || (doc_id + 1000000000000) AS url,
                       'added' AS status
                FROM documents WHERE doc_id % 17 = 2
            ) ORDER BY url
        """,
        # same closed-form link table as the outlinks oracle, rolled up
        # per (site, href) target
        "anchor_text_stats": """
            WITH docs AS (SELECT doc_id FROM documents WHERE doc_id % 7 <> 3),
            idx AS (SELECT doc_id, unnest(range(0, 12)) AS link_idx FROM docs),
            links AS (
                SELECT 'site-' || (doc_id % 20) AS site,
                       CASE link_idx WHEN 0 THEN '/' WHEN 1 THEN '/about'
                            WHEN 2 THEN '/news' WHEN 3 THEN '/contact'
                            WHEN 10 THEN '/privacy' WHEN 11 THEN '/terms'
                            ELSE '/t/' || (link_idx - 4) END AS href,
                       CASE link_idx WHEN 0 THEN 'Home' WHEN 1 THEN 'About'
                            WHEN 2 THEN 'News' WHEN 3 THEN 'Contact'
                            WHEN 10 THEN 'privacy' WHEN 11 THEN 'terms'
                            ELSE 'tag-' || ((doc_id + link_idx - 4) % 50) END
                           AS anchor_text
                FROM idx
            )
            SELECT site, href,
                   CAST(COUNT(*) AS BIGINT) AS n_links,
                   CAST(COUNT(DISTINCT anchor_text) AS BIGINT) AS n_anchor_texts
            FROM links GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "decontaminate": _decontaminate_sql(),
        # the keyed semi-join fallback is output-identical by contract,
        # so it shares the broadcast path's closed-form oracle
        "decontaminate_join": _decontaminate_sql(),
        "minhash_clusters": _minhash_clusters_sql(),
        # the exact-dedup -> LSH cascade is output-identical BY THEOREM
        # (identical texts share every shingle, so exact-dup groups are
        # sub-cliques of near-dup components and each representative is
        # its group's min id), so it shares the full-corpus oracle — the
        # decontaminate_join contract
        "minhash_clusters_cascade": _minhash_clusters_sql(),
        # fuzzy stage: on corpora with NO normalization-only variants
        # (true of every sf table — no case/punct perturbations exist)
        # the fuzzy key partitions texts exactly like the byte-exact key,
        # so the same theorem and the same oracle apply
        "minhash_clusters_cascade_fuzzy": _minhash_clusters_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        "jaccard_dup_pairs": _jaccard_dup_pairs_sql(),
        "dedup_spans": _dedup_spans_sql(),
        "pagerank": _pagerank_sql(),
        # analytics.rebalance_langs: exact-integer language-cap sampling.
        # stable_hash64 replayed in HUGEINT (the simhash-oracle idiom);
        # keep iff count <= cap or hash * count < cap * 2^64 — no float
        # anywhere, so no boundary can disagree.
        "rebalance_langs": f"""
            WITH {_MULT_CTE},
            counts AS (SELECT lang, COUNT(*)::BIGINT AS c
                       FROM documents GROUP BY lang),
            hashed AS (
              SELECT d.doc_id, d.lang, (
                SELECT SUM(
                   ((strpos('0123456789abcdef',
                       substr(md5('rebalance:' || d.doc_id), 2*i+1, 1))-1) * 16
                  + (strpos('0123456789abcdef',
                       substr(md5('rebalance:' || d.doc_id), 2*i+2, 1))-1)
                   )::HUGEINT * m
                ) FROM mult
              ) AS h
              FROM documents d)
            SELECT h.doc_id, h.lang
            FROM hashed h JOIN counts c ON c.lang = h.lang
            WHERE c.c <= 100
               OR h.h * c.c::HUGEINT
                  < 100::HUGEINT * 18446744073709551616::HUGEINT
            ORDER BY h.doc_id
        """,
        # pipelines/quality.quality_buckets: CCNet-style two-pass LM
        # bucketing with the per-lang vocabulary cap — see
        # _quality_buckets_sql for the mirrored semantics.
        "quality_buckets": _quality_buckets_sql(),
        "text_profile": _text_profile_sql(),
        "distinct_terms_hll": _distinct_terms_hll_sql(),
        # Closed-form oracle for the ensemble metadata. The synthesized
        # corpus makes every column deterministic: html pages always vote 2
        # lines (title + body) with density/dom contributing both and
        # readability contributing iff its raw container confidence
        # score/(score+2) clears MIN_SPAN_CONF (score summed in the exact
        # per-block float order of _candidate_score); pdf pages emit one
        # title row plus the width-budgeted greedy wrap of pages.synth_pdf,
        # reproduced by an integer list_reduce fold (state = lines*100000
        # + x; all widths are multiples of 8 so float and int agree).
        "extract_metrics": f"""
            WITH base AS (
              SELECT doc_id, text,
                     'Document ' || format('{{:,}}', doc_id) AS title
              FROM documents),
            pdffold AS (
              SELECT doc_id AS pid,
                1 + list_reduce(
                      list_prepend(100000::BIGINT,
                        list_transform(string_split(text, ' '),
                                       w -> length(w)::BIGINT)),
                      (acc, wl) -> CASE
                        WHEN (acc % 100000) > 0
                             AND (acc % 100000) + 8 * wl > 380
                        THEN (acc // 100000 + 1) * 100000 + 8 * wl + 8
                        ELSE acc + 8 * wl + 8 END
                    ) // 100000 AS n_lines
              FROM base WHERE doc_id % 7 = 3),
            readab AS (
              SELECT doc_id AS rid,
                CASE WHEN least(s / (s + 2.0), 0.99) >= 0.5
                     THEN 2 ELSE 0 END AS r
              FROM (SELECT doc_id,
                      0.0 + least(length(title) / 100.0, 3.0)
                          + (length(title)
                             - length(replace(title, ',', ''))) * 0.5
                          + least(length(text) / 100.0, 3.0)
                          + (length(text)
                             - length(replace(text, ',', ''))) * 0.5 AS s
                    FROM base))
            SELECT {_URL_SQL} AS url,
                   CASE WHEN doc_id % 7 = 3 THEN 'pdf' ELSE 'html' END
                       AS doc_kind,
                   CAST(CASE WHEN doc_id % 7 = 3 THEN p.n_lines ELSE 2 END
                        AS INT) AS n_lines,
                   CAST(0 AS INT) AS gaps_filled,
                   CASE WHEN doc_id % 7 = 3
                        THEN '{{"layout": ' || p.n_lines || '}}'
                        ELSE '{{"density": 2, "dom": 2, "readability": '
                             || r.r || '}}' END AS contributions
            FROM documents d
            LEFT JOIN pdffold p ON d.doc_id = p.pid
            LEFT JOIN readab r ON d.doc_id = r.rid
        """,
        "extract_docs": f"""
            SELECT {_URL_SQL} AS url, {_TEXT_SQL} AS extracted_text
            FROM documents
        """,
        "extract_html": f"""
            SELECT {_URL_SQL} AS url, {_TEXT_SQL} AS extracted_text
            FROM documents WHERE doc_id % 7 <> 3
        """,
        "extract_pdf": f"""
            SELECT {_URL_SQL} AS url, {_TEXT_SQL} AS extracted_text
            FROM documents WHERE doc_id % 7 = 3
        """,
        "extract_headings": f"""
            SELECT {_URL_SQL} AS url,
                   'Document ' || format('{{:,}}', doc_id) AS heading
            FROM documents
        """,
        "dedup_pages": f"""
            SELECT {_URL_SQL} AS url, {_TS_SQL} AS warc_ts
            FROM documents
        """,
        "dedup_pages_bloom": f"""
            SELECT {_URL_SQL} AS url, {_TS_SQL} AS warc_ts
            FROM documents
        """,
        "sequence_dedup_pages": f"""
            SELECT {_URL_SQL} AS url, {_TS_SQL} AS warc_ts FROM documents
            UNION ALL
            SELECT {_URL_SQL} AS url,
                   {_TS_SQL} + INTERVAL 2 DAY AS warc_ts
            FROM documents WHERE doc_id % 5 = 0
        """,
        "split_spreads": f"""
            SELECT {_URL_SQL} || '#a0' AS url, {_TEXT_SQL} AS extracted_text
            FROM documents
            UNION ALL
            SELECT {_URL_SQL} || '#a1' AS url,
                   {_TEXT_SQL} || ' updated revision content' AS extracted_text
            FROM documents
        """,
        "extract_fallback": f"""
            SELECT {_URL_SQL} AS url,
                   CASE WHEN doc_id % 10 = 7 THEN text
                        ELSE {_TEXT_SQL} END AS extracted_text,
                   CASE WHEN doc_id % 10 = 7 THEN 'raw_text'
                        ELSE 'ensemble' END AS engine
            FROM documents
        """,
        "consolidate_books": f"""
            SELECT {_URL_SQL} AS url,
                   chr(10) || '--- a0 ---' || chr(10) || chr(10)
                     || {_TEXT_SQL} || chr(10) || chr(10)
                     || chr(10) || '--- a1 ---' || chr(10) || chr(10)
                     || {_TEXT_SQL} || ' updated revision content' || chr(10) || chr(10)
                       AS book_txt,
                   chr(10) || '--- a0 ---' || chr(10) || chr(10)
                     || chr(10) || '## Document ' || format('{{:,}}', doc_id) || chr(10)
                     || chr(10) || text || chr(10) || chr(10)
                     || chr(10) || '--- a1 ---' || chr(10) || chr(10)
                     || chr(10) || '## Document ' || format('{{:,}}', doc_id) || chr(10)
                     || chr(10) || text || ' updated revision content' || chr(10) || chr(10)
                       AS book_md,
                   CAST(2 AS BIGINT) AS n_pages
            FROM documents
        """,
        "events_gaps": """
            SELECT event_id,
                   coalesce(datediff('microsecond',
                            lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), ts),
                            -1) AS gap_us
            FROM events
        """,
        # NOTE: every aggregate SUM below is wrapped in CAST(... AS BIGINT):
        # DuckDB's SUM over integers returns HUGEINT, which lands in pandas
        # as float64 — the engine emits int64, and a dtype-sensitive value
        # hash would flag identical values as different (round-1 failure
        # mode on exactly the six uncast-SUM oracles).
        # the synthesized boilerplate frame carries exactly 12 anchors per
        # html page in a fixed order (sources/pages.py synth_html): 4 nav,
        # 6 aside tag links, 2 footer links
        "outlinks": f"""
            WITH docs AS (SELECT doc_id FROM documents WHERE doc_id % 7 <> 3),
            idx AS (SELECT doc_id, unnest(range(0, 12)) AS link_idx FROM docs)
            SELECT {_URL_SQL} AS url, link_idx,
                   CASE link_idx WHEN 0 THEN '/' WHEN 1 THEN '/about'
                        WHEN 2 THEN '/news' WHEN 3 THEN '/contact'
                        WHEN 10 THEN '/privacy' WHEN 11 THEN '/terms'
                        ELSE '/t/' || (link_idx - 4) END AS href,
                   CASE link_idx WHEN 0 THEN 'Home' WHEN 1 THEN 'About'
                        WHEN 2 THEN 'News' WHEN 3 THEN 'Contact'
                        WHEN 10 THEN 'privacy' WHEN 11 THEN 'terms'
                        ELSE 'tag-' || ((doc_id + link_idx - 4) % 50) END
                       AS anchor_text
            FROM idx
        """,
        "lineage_sites": f"""
            SELECT 'site-' || (doc_id % 20) AS site,
                   COUNT(*) AS doc_count,
                   CAST(SUM(length('Document ' || format('{{:,}}', doc_id)) + 1 + length(text))
                        AS BIGINT) AS char_count
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS base_cents,
                   CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "priority_revenue": """
            SELECT o.o_orderpriority AS priority, COUNT(*) AS n_items,
                   CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        "purchase_attribution": """
            SELECT p.event_id,
                   coalesce(
                     (SELECT c.event_id FROM events c
                      WHERE c.user_id = p.user_id AND c.event_type = 'click'
                        AND c.ts <= p.ts
                      ORDER BY c.ts DESC, c.event_id DESC LIMIT 1), -1) AS click_id
            FROM events p WHERE p.event_type = 'purchase'
        """,
        "clicks_before_purchase": """
            SELECT p.event_id,
                   CAST((SELECT COUNT(*) FROM events c
                         WHERE c.user_id = p.user_id
                           AND c.event_type = 'click'
                           AND c.ts >= p.ts - INTERVAL 1 HOUR
                           AND c.ts < p.ts) AS BIGINT) AS n_clicks
            FROM events p WHERE p.event_type = 'purchase'
        """,
        "events_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "orders_by_region": """
            SELECT r.r_name AS region, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1 ORDER BY 1
        """,
        "top_terms": """
            SELECT term, COUNT(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
            GROUP BY term ORDER BY n DESC, term LIMIT 50
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, event_id, ts, value,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) IS NULL
                      OR datediff('microsecond',
                                  lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id),
                                  ts) > 1800000000
                     THEN 1 ELSE 0 END AS new_s
              FROM events),
            s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING)
                              AS session_idx
                  FROM g)
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   COUNT(*) AS n_events,
                   MIN(ts) AS start_ts, MAX(ts) AS end_ts,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM s GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "top_docs_per_source": """
            SELECT source, doc_id, n_chars, CAST(rnk AS BIGINT) AS rank
            FROM (SELECT source, doc_id, n_chars,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY n_chars DESC, doc_id)
                             AS rnk
                  FROM documents)
            WHERE rnk <= 3 ORDER BY source, rank
        """,
        "token_quantiles": """
            WITH tok AS (SELECT source, len(string_split(text, ' ')) AS n_tokens
                         FROM documents)
            SELECT source, COUNT(*) AS n_docs,
                   quantile_disc(n_tokens, 0.5) AS p50_tokens,
                   quantile_disc(n_tokens, 0.9) AS p90_tokens
            FROM tok GROUP BY 1 ORDER BY 1
        """,
        "redact_pii": """
            WITH s AS (
              SELECT doc_id,
                     text || ' Contact user' || doc_id
                          || '@example.com or call 555-'
                          || (1000 + doc_id % 9000) || '.' AS raw
              FROM documents)
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(raw, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+',
                                    '<EMAIL>', 'g'),
                     '555-[0-9]+', '<PHONE>', 'g') AS clean_text,
                   CAST(len(regexp_extract_all(raw,
                        '[A-Za-z0-9._]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(
                        regexp_replace(raw, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+',
                                       '<EMAIL>', 'g'),
                        '555-[0-9]+')) AS BIGINT) AS n_phones
            FROM s
        """,
        # chunk windows: stride = 64-16 = 48 words;
        # n_chunks = max(1, ceil((n-overlap)/48)) — a window starting inside
        # the previous overlap adds no new tokens and is not emitted;
        # list_slice is 1-based and end-inclusive, mirroring
        # words[i*stride : i*stride+chunk] for i in range(n_chunks)
        "chunk_documents": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                       FROM documents),
            idx AS (
              SELECT doc_id, words, i.i AS chunk_idx
              FROM w, LATERAL (
                SELECT unnest(range(0, greatest(1, (len(w.words) - 16 + 47) // 48)))
                AS i) i),
            sliced AS (
              SELECT doc_id, chunk_idx,
                     list_slice(words, chunk_idx * 48 + 1,
                                least(chunk_idx * 48 + 64, len(words))) AS piece
              FROM idx)
            SELECT doc_id, chunk_idx,
                   array_to_string(piece, ' ') AS chunk_text,
                   len(piece) AS n_tokens
            FROM sliced
        """,
        # 4-gram repetition: grams of docs shorter than 4 words collapse to
        # one whole-text gram, mirroring word_shingles-style semantics
        "repetition_profile": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                       FROM documents),
            grams AS (
              SELECT doc_id,
                CASE WHEN len(words) < 4 THEN [array_to_string(words, ' ')]
                     ELSE list_transform(range(1, len(words) - 2),
                            i -> words[i] || ' ' || words[i+1] || ' '
                                 || words[i+2] || ' ' || words[i+3])
                END AS gs
              FROM w),
            g AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
            counts AS (SELECT doc_id, gram, COUNT(*) AS c
                       FROM g GROUP BY doc_id, gram)
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_grams,
                   CAST(MAX(c) AS BIGINT) AS max_gram_count,
                   CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000
                        // SUM(c) AS BIGINT) AS rep_milli
            FROM counts GROUP BY doc_id
        """,
        # greedy first-fit packing replayed as a recursive CTE: one step
        # per row rank within a bucket, state = (seq_idx, filled), exactly
        # the fold in analytics.pack_sequences
        "pack_sequences": """
            WITH RECURSIVE
            w AS (SELECT doc_id, len(string_split(text, ' ')) AS n
                  FROM documents),
            ch AS (
              SELECT doc_id, i.i AS chunk_idx,
                     least(64, n - i.i * 48) AS n_tokens
              FROM w, LATERAL (
                SELECT unnest(range(0, greatest(1, (n - 16 + 47) // 48))) AS i) i),
            rows_r AS (
              SELECT doc_id % 16 AS bucket, doc_id, chunk_idx, n_tokens,
                     row_number() OVER (PARTITION BY doc_id % 16
                                        ORDER BY doc_id, chunk_idx) AS rn
              FROM ch),
            packed AS (
              SELECT bucket, rn, doc_id, chunk_idx, n_tokens,
                     CAST(0 AS BIGINT) AS seq_idx, n_tokens AS filled
              FROM rows_r WHERE rn = 1
              UNION ALL
              SELECT r.bucket, r.rn, r.doc_id, r.chunk_idx, r.n_tokens,
                     CASE WHEN p.filled > 0 AND p.filled + r.n_tokens > 128
                          THEN p.seq_idx + 1 ELSE p.seq_idx END,
                     CASE WHEN p.filled > 0 AND p.filled + r.n_tokens > 128
                          THEN r.n_tokens ELSE p.filled + r.n_tokens END
              FROM packed p
              JOIN rows_r r ON r.bucket = p.bucket AND r.rn = p.rn + 1)
            SELECT bucket, seq_idx, doc_id, chunk_idx, n_tokens
            FROM packed ORDER BY bucket, seq_idx, doc_id, chunk_idx
        """,
        "stratified_sample": f"""
            SELECT doc_id, source FROM documents
            WHERE (strpos('0123456789abcdef',
                     substr(md5('sample-v1:' || {_URL_SQL}), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                     substr(md5('sample-v1:' || {_URL_SQL}), 2, 1)) - 1)
                < CASE source WHEN 'src0' THEN 256 WHEN 'src1' THEN 128
                              WHEN 'src2' THEN 64 WHEN 'src3' THEN 32
                              ELSE 16 END
        """,
        "tfidf_top_terms": """
            WITH tfc AS (
              SELECT source, term, COUNT(*) AS tf FROM
                (SELECT source, unnest(string_split(text, ' ')) AS term
                 FROM documents)
              GROUP BY 1, 2),
            df AS (
              SELECT term, COUNT(*) AS df FROM
                (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents)
              GROUP BY 1),
            n AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
              SELECT tfc.source, tfc.term, tfc.tf,
                     tfc.tf * ln(n.n::DOUBLE / df.df) AS tfidf
              FROM tfc JOIN df ON tfc.term = df.term CROSS JOIN n)
            SELECT source, term, CAST(tf AS BIGINT) AS tf, tfidf
            FROM (SELECT *, row_number() OVER (PARTITION BY source
                                               ORDER BY tfidf DESC, term) AS rnk
                  FROM scored)
            WHERE rnk <= 5 ORDER BY source, term
        """,
        "source_stats": """
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
            FROM documents GROUP BY source ORDER BY source
        """,
        "train_val_split": f"""
            SELECT doc_id, {_URL_SQL} AS url,
                   CASE WHEN substr(md5({_URL_SQL}), 1, 1) IN ('0','1','2')
                        THEN 'val' ELSE 'train' END AS split
            FROM documents
        """,
        "token_stats": f"""
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct,
                   len(list_filter(string_split(text, ' '),
                                   w -> w IN ({_STOPLIST_SQL}))) AS stop_count,
                   length(text) AS n_chars
            FROM documents
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS fp_md5 FROM documents
        """,
        "dedup_exact_docs": """
            SELECT d.* FROM documents d
            JOIN (SELECT text, MIN(doc_id) AS keep FROM documents GROUP BY text) k
              ON d.doc_id = k.keep
        """,
        # analytics.dedup_fuzzy_exact: the perturbed union replayed
        # verbatim, then exact dedup on the NORMALIZED text (lower ->
        # strip non-[a-z0-9 ] -> collapse space runs -> trim). Grouping
        # is by normalized STRING while the pipeline keys on its 63-bit
        # hash — value-hash equality proves collision freedom.
        # incremental.dedup_incremental: snapshot = doc_id % 3 == 0, the
        # rest are the indexed history; survive iff the text never
        # occurred in history AND first-wins within the snapshot. The Ray
        # side keys on the 63-bit text hash (persisted index rows); the
        # string-exact oracle is the collision-freedom proof.
        "dedup_incremental": """
            WITH newdocs AS (SELECT doc_id, text FROM documents
                             WHERE doc_id % 3 = 0),
            hist AS (SELECT DISTINCT text FROM documents
                     WHERE doc_id % 3 <> 0),
            surv AS (SELECT text, MIN(doc_id) AS doc_id
                     FROM newdocs GROUP BY text)
            SELECT n.doc_id, n.text
            FROM newdocs n
            JOIN surv s ON s.doc_id = n.doc_id
            LEFT JOIN hist h ON h.text = n.text
            WHERE h.text IS NULL
            ORDER BY n.doc_id
        """,
        "dedup_fuzzy_exact": """
            WITH all_docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              -- variant ids set bit 40 (1099511627776 = 1<<40), outside any
              -- real id range — mirrors analytics.VARIANT_ID_BIT exactly
              SELECT doc_id | 1099511627776, upper(text) || '  !!' FROM documents
            ),
            norm AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(
                       lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nt
              FROM all_docs
            )
            SELECT MIN(doc_id)::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_variants
            FROM norm GROUP BY nt ORDER BY 1
        """,
        "knn_brute": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                       WHERE vec_id < 10),
                 s AS (SELECT q.qid, e.vec_id AS nid,
                              list_cosine_similarity(q.qe, e.embedding) AS sim
                       FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid)
            SELECT qid, nid, CAST(rnk AS BIGINT) AS rank
            FROM (SELECT qid, nid,
                         row_number() OVER (PARTITION BY qid
                                            ORDER BY sim DESC, nid) AS rnk
                  FROM s)
            WHERE rnk <= 5
        """,
        "embedding_dup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """,
        # neighbors.dedup_semantic: the pair CTE is embedding_dup_pairs'
        # oracle verbatim; components via the minhash-oracle reach CTE;
        # survivors = one row per component min with its size.
        "dedup_semantic": """
            WITH RECURSIVE
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a JOIN embeddings b
                ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35),
            sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
            reach AS (
              SELECT a AS node, b AS r FROM sym
              UNION
              SELECT r.node, e.b AS r FROM reach r JOIN sym e ON r.r = e.a),
            labels AS (SELECT node, LEAST(MIN(r), node) AS label
                       FROM reach GROUP BY node),
            lab_all AS (
              SELECT e.vec_id, COALESCE(l.label, e.vec_id) AS label
              FROM embeddings e LEFT JOIN labels l ON l.node = e.vec_id)
            SELECT label::BIGINT AS vec_id, COUNT(*)::BIGINT AS cluster_size
            FROM lab_all GROUP BY label ORDER BY 1
        """,
        "structural_stats": """
            SELECT doc_id, CAST(3 AS INT) AS n_pages, CAST(1 AS INT) AS n_errors
            FROM documents
        """,
        "media_frame_counts": """
            SELECT doc_id AS media_id,
                   CAST(ceil((10 + doc_id % 20) / 5.0) AS BIGINT) AS n_frames
            FROM documents WHERE doc_id % 3 = 2
        """,
        "media_audio_features": """
            WITH auds AS (
              SELECT doc_id AS media_id, 4000 + (doc_id % 10) * 800 AS n
              FROM documents WHERE doc_id % 3 = 1),
            samp AS (
              SELECT a.media_id, t.t,
                     ((t.t * 7 + a.media_id) % 200 - 100) / 100.0 AS v, a.n
              FROM auds a,
                   LATERAL (SELECT unnest(generate_series(0, a.n - 1)) AS t) t),
            frames AS (
              SELECT media_id, CAST(floor(t / 400) AS INT) AS f,
                     sqrt(avg(v * v)) AS frame_rms
              FROM samp GROUP BY media_id, f),
            rmst AS (SELECT media_id, avg(frame_rms) AS rms FROM frames
                     GROUP BY media_id),
            lagd AS (
              SELECT media_id, sign(v) AS s,
                     lag(sign(v)) OVER (PARTITION BY media_id ORDER BY t) AS ls
              FROM samp),
            zct AS (
              SELECT media_id,
                     CAST(SUM(CASE WHEN ls IS NOT NULL AND s <> ls
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                       / (COUNT(*) - 1) AS zcr
              FROM lagd GROUP BY media_id)
            SELECT a.media_id, r.rms, z.zcr, a.n / 16000.0 AS duration_s
            FROM auds a
            JOIN rmst r ON a.media_id = r.media_id
            JOIN zct z ON a.media_id = z.media_id
        """,
        "media_frame_index": """
            SELECT doc_id AS media_id,
                   CAST(unnest(generate_series(0, 10 + doc_id % 20 - 1, 5)) AS INT)
                       AS frame_idx
            FROM documents WHERE doc_id % 3 = 2
        """,
        "preview_trim_grid": _preview_trim_grid_sql(),
        "vlm_captions": """
            WITH imgs AS (
              SELECT doc_id AS media_id,
                     32 + (doc_id % 8) * 16 AS w,
                     24 + (doc_id % 5) * 12 AS h
              FROM documents WHERE doc_id % 3 = 0),
            px AS (
              SELECT i.media_id, ((x.x * 3 + y.y * 7 + i.media_id) % 256) AS b
              FROM imgs i,
                   LATERAL (SELECT unnest(generate_series(0, i.w - 1)) AS x) x,
                   LATERAL (SELECT unnest(generate_series(0, i.h - 1)) AS y) y),
            ch AS (
              SELECT media_id, CAST(b AS DOUBLE) AS v FROM px
              UNION ALL SELECT media_id, CAST((b * 2) % 256 AS DOUBLE) FROM px
              UNION ALL SELECT media_id, CAST((b * 5) % 256 AS DOUBLE) FROM px),
            m AS (SELECT media_id, avg(v) AS pix_mean FROM ch GROUP BY media_id)
            SELECT i.media_id,
                   'figure ' || i.w || 'x' || i.h || ': brightness '
                     || CAST(floor(m.pix_mean) AS BIGINT) AS caption
            FROM imgs i JOIN m ON i.media_id = m.media_id
        """,
        "media_image_features": """
            WITH imgs AS (
              SELECT doc_id AS media_id,
                     32 + (doc_id % 8) * 16 AS w,
                     24 + (doc_id % 5) * 12 AS h
              FROM documents WHERE doc_id % 3 = 0),
            px AS (
              SELECT i.media_id, ((x.x * 3 + y.y * 7 + i.media_id) % 256) AS b
              FROM imgs i,
                   LATERAL (SELECT unnest(generate_series(0, i.w - 1)) AS x) x,
                   LATERAL (SELECT unnest(generate_series(0, i.h - 1)) AS y) y),
            ch AS (
              SELECT media_id, CAST(b AS DOUBLE) AS v FROM px
              UNION ALL SELECT media_id, CAST((b * 2) % 256 AS DOUBLE) FROM px
              UNION ALL SELECT media_id, CAST((b * 5) % 256 AS DOUBLE) FROM px)
            SELECT media_id, avg(v) AS pix_mean, stddev_pop(v) AS pix_std
            FROM ch GROUP BY media_id
        """,
        "structural_xml": _STRUCTURAL_XML_SQL.replace(
            "__FIGURE_SRC__", "'fig_' || doc_id || '.png'"
        ),
        "structural_xml_embedded": _STRUCTURAL_XML_SQL.replace(
            "__FIGURE_SRC__", _EMBEDDED_FIGURE_SQL
        ),
        "heading_rules": """
            SELECT doc_id, CAST(2 AS INT) AS n_rules, CAST(2 AS INT) AS n_applied,
                   CAST(100 AS INT) AS match_rate_pct
            FROM documents
        """,
        "corpus_metrics": """
            SELECT COUNT(*) AS n_docs, COUNT(*) AS n_html,
                   CAST(0 AS BIGINT) AS n_pdf, CAST(0 AS BIGINT) AS n_errors,
                   2 * COUNT(*) AS total_lines
            FROM documents WHERE doc_id % 7 <> 3
        """,
        "heading_pattern_stats": """
            SELECT 'NUMBERED' AS category, 2 * COUNT(*) AS n FROM documents
            UNION ALL
            SELECT 'UNNUMBERED' AS category, COUNT(*) AS n FROM documents
            ORDER BY category
        """,
        "site_boilerplate": """
            WITH sites AS (SELECT DISTINCT 'site-' || (doc_id % 20) AS site
                           FROM documents)
            SELECT site, line
            FROM sites CROSS JOIN (VALUES ('Home'), ('About'), ('News'),
                                          ('Contact')) t(line)
            UNION ALL
            SELECT site, 'privacy terms (c) 2026 ' || site FROM sites
        """,
        # boilerplate.strip_boilerplate: closed form on the synth corpus —
        # every base html page loses exactly the 4 nav items + the footer
        # line; what survives is the 6 aside tags, the title and the body.
        "strip_boilerplate": """
            SELECT 'https://site-' || (doc_id % 20) || '.example/doc/' || doc_id
                     AS url,
                   'site-' || (doc_id % 20) AS site,
                   array_to_string(list_transform(range(0, 6),
                       i -> 'tag-' || ((doc_id + i) % 50)), chr(10))
                    || chr(10) || 'Document ' || format('{:,}', doc_id)
                    || chr(10) || text AS clean_text,
                   5::BIGINT AS n_stripped
            FROM documents
            WHERE doc_id % 7 <> 3
            ORDER BY url
        """,
    }
