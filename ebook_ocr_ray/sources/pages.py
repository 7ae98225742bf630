"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

The north-rule input table has the exact shape
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. No external data exists in this sandbox, so pages are
derived deterministically from the driver-provided ``documents`` table
(doc_id, text, lang): each document is wrapped in boilerplate-laden HTML —
or a synthetic char-box PDF payload for every 7th doc — such that the
reference-semantics extractor provably recovers
``"Document {doc_id}\\n{text}"`` byte-identically. That closed form is what
makes a DuckDB oracle possible for the whole extraction pipeline.

Generation is pure per-row (no RNG, no clock), so it can run inside
``map_batches`` at any parallelism with identical results.
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import json

import pyarrow as pa

PAGE_WIDTH = 1000.0
BODY_Y0 = 100.0
LINE_STEP = 40.0          # > CROSS_SOURCE_TOL so physical lines never merge
WORDS_PER_LINE = 10        # retained for docs; wrapping is width-budgeted
COLUMN_WIDTH = 380.0       # inner column width budget for line wrapping
CHAR_W = 8.0
WORD_GAP = 8.0
BODY_CHAR_H = 12.0
TITLE_CHAR_H = 24.0
LEFT_X0 = 60.0
RIGHT_X0 = 560.0

BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)
DUP_TS_OFFSET_S = 86400

N_SITES = 20
PDF_EVERY = 7          # doc_id % 7 == 3 -> PDF payload
DUP_EVERY = 10         # doc_id % 10 == 0 -> an exact-duplicate later crawl
VERSION_EVERY = 5      # doc_id % 5 == 0 -> a 3-version crawl chain
VERSION_SUFFIX = " updated revision content"
OVERSIZE_EVERY = 97    # doc_id % 97 == 96 -> oversized payload (skew row)
URL_VARIANT_EVERY = 6  # doc_id % 6 == 1 -> two messy-URL recrawls
URL_VARIANT_QUERY = "?utm_source=feed&ref=rss#frag"


def page_url(doc_id: int) -> str:
    return f"https://site-{doc_id % N_SITES}.example/doc/{doc_id}"


def page_site(doc_id: int) -> str:
    return f"site-{doc_id % N_SITES}"


def page_ts(doc_id: int, dup: bool = False) -> _dt.datetime:
    return BASE_TS + _dt.timedelta(seconds=doc_id + (DUP_TS_OFFSET_S if dup else 0))


def doc_title(doc_id: int) -> str:
    # >= 10 chars always (short-ASCII rule can't eat it) and digits are
    # comma-grouped so no >=5 char run exists for ANY doc_id (char-run
    # rule can't either) — both invariants required for the closed-form
    # oracle to hold at every amplification level
    return f"Document {doc_id:,}"


def expected_extraction(doc_id: int, text: str) -> str:
    """The closed-form golden output for a synthesized page; DuckDB oracle:
    'Document ' || doc_id || chr(10) || text"""
    return f"{doc_title(doc_id)}\n{text}"


def is_pdf_doc(doc_id: int) -> bool:
    return doc_id % PDF_EVERY == 3


def synth_html(doc_id: int, text: str) -> bytes:
    """Boilerplate-framed article: nav/aside link farms, chrome header and
    footer, one <main> with the title heading and the document body."""
    site = page_site(doc_id)
    tags = " ".join(f'<li><a href="/t/{i}">tag-{(doc_id + i) % 50}</a></li>' for i in range(6))
    page = (
        "<html><head><title>"
        f"{_html.escape(doc_title(doc_id))}"
        "</title></head><body>\n"
        '<header><nav><a href="/">Home</a> <a href="/about">About</a> '
        '<a href="/news">News</a> <a href="/contact">Contact</a></nav></header>\n'
        f"<aside><ul>{tags}</ul></aside>\n"
        "<main>\n"
        f"<h1>{_html.escape(doc_title(doc_id))}</h1>\n"
        f"<p>{_html.escape(text)}</p>\n"
        "</main>\n"
        f'<footer><p><a href="/privacy">privacy</a> <a href="/terms">terms</a> '
        f"(c) 2026 {site}</p></footer>\n"
        "</body></html>\n"
    )
    return page.encode("utf-8")


def synth_pdf(doc_id: int, text: str) -> bytes:
    """Two-column char-box layout: title row (tall chars), then body words
    wrapped WORDS_PER_LINE per line, lines filling the left column first.
    The layout extractor provably inverts this back to the original text
    (lines merge with single spaces via the continuation rule)."""
    words: list[list] = []
    x = LEFT_X0
    for w in doc_title(doc_id).split(" "):
        words.append([w, x, 30.0, CHAR_W * len(w), TITLE_CHAR_H])
        x += CHAR_W * len(w) + WORD_GAP

    # Width-budgeted wrap so line boxes stay inside their column (left
    # x2 <= 440 < gutter < right x1 = 560) — columns never overlap in x,
    # which keeps the engine's same-type overlap pruning a no-op here.
    lines: list[list[str]] = [[]]
    x = 0.0
    for w in text.split(" "):
        width = CHAR_W * len(w)
        if lines[-1] and x + width > COLUMN_WIDTH:
            lines.append([])
            x = 0.0
        lines[-1].append(w)
        x += width + WORD_GAP
    left_rows = (len(lines) + 1) // 2
    for line_idx, chunk in enumerate(lines):
        if line_idx < left_rows:
            x, y = LEFT_X0, BODY_Y0 + LINE_STEP * line_idx
        else:
            x, y = RIGHT_X0, BODY_Y0 + LINE_STEP * (line_idx - left_rows)
        for w in chunk:
            words.append([w, x, y, CHAR_W * len(w), BODY_CHAR_H])
            x += CHAR_W * len(w) + WORD_GAP

    layout = json.dumps({"w": PAGE_WIDTH, "words": words})
    return b"%PDF-1.4\n%EBOOKRAY-CHARBOX " + layout.encode("utf-8") + b"\n%%EOF\n"


def synth_spread_html(doc_id: int, text: str) -> bytes:
    """A 'spread' capture: ONE payload carrying TWO <article> documents
    (the analog of a two-page book spread in one frame). The split stage
    turns it into two logical pages; article 1 is the base text, article 2
    the revised variant."""
    t = _html.escape(doc_title(doc_id))
    a0 = f"<article>\n<h1>{t}</h1>\n<p>{_html.escape(text)}</p>\n</article>"
    a1 = (
        f"<article>\n<h1>{t}</h1>\n"
        f"<p>{_html.escape(text + VERSION_SUFFIX)}</p>\n</article>"
    )
    page = (
        "<html><head><title>spread</title></head><body>\n"
        '<header><nav><a href="/">Home</a> <a href="/about">About</a></nav></header>\n'
        f"{a0}\n{a1}\n"
        f'<footer><p><a href="/privacy">privacy</a> (c) {page_site(doc_id)}</p></footer>\n'
        "</body></html>\n"
    )
    return page.encode("utf-8")


def synth_payload(doc_id: int, text: str) -> bytes:
    return synth_pdf(doc_id, text) if is_pdf_doc(doc_id) else synth_html(doc_id, text)


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def oversize_repeats(text: str) -> int:
    """Paragraph repetitions needed to push the payload well past the
    oversize threshold (deterministic per text)."""
    from ebook_ocr_ray.config import OVERSIZE_BLOB_BYTES

    per_para = len(text.encode("utf-8")) + 9    # <p>...</p>\n
    return (OVERSIZE_BLOB_BYTES * 12 // 10) // max(1, per_para) + 1


def synth_oversized_html(doc_id: int, text: str) -> bytes:
    """A skew row: the article body repeated as separate paragraphs until
    the payload clears the oversize threshold — same extraction semantics
    (each <p> is its own voted line)."""
    site = page_site(doc_id)
    body = "\n".join(f"<p>{_html.escape(text)}</p>" for _ in range(oversize_repeats(text)))
    page = (
        "<html><head><title>big</title></head><body>\n"
        f"<main>\n<h1>{_html.escape(doc_title(doc_id))}</h1>\n{body}\n</main>\n"
        f"<footer><p><a href='/p'>privacy</a> (c) {site}</p></footer>\n"
        "</body></html>\n"
    )
    return page.encode("utf-8")


def pages_from_documents_batch(
    batch: pa.Table,
    with_duplicates: bool = False,
    with_versions: bool = False,
    with_oversized: bool = False,
    with_url_variants: bool = False,
) -> pa.Table:
    """map_batches(batch_format="pyarrow") body: documents rows -> pages
    rows (1->N flat map). ``with_duplicates`` adds an exact-duplicate
    recrawl one day later for every DUP_EVERY-th doc. ``with_versions``
    adds a 3-version chain for every VERSION_EVERY-th doc: an identical
    recrawl at +1 day (sequence-dedup must drop it) and a changed revision
    at +2 days (must survive). ``with_url_variants`` adds, for every
    URL_VARIANT_EVERY-th doc, two later recrawls of the SAME page under
    messy URLs (uppercase scheme/host + www. + trailing slash; tracking
    query + fragment) — the canonical-URL dedup fixture."""
    urls: list[str] = []
    tss: list[_dt.datetime] = []
    payloads: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []

    def emit(
        doc_id: int,
        text: str,
        lang: str,
        ts: _dt.datetime,
        payload: bytes,
        url_suffix: str = "",
        url_override: str | None = None,
    ) -> None:
        urls.append(url_override if url_override is not None else page_url(doc_id) + url_suffix)
        tss.append(ts)
        payloads.append(payload)
        texts.append(text)
        langs.append(lang)

    for doc_id, text, lang in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist(), batch["lang"].to_pylist()
    ):
        payload = synth_payload(doc_id, text)
        emit(doc_id, text, lang, page_ts(doc_id), payload)
        if with_duplicates and doc_id % DUP_EVERY == 0:
            emit(doc_id, text, lang, page_ts(doc_id, dup=True), payload)
        if with_oversized and doc_id % OVERSIZE_EVERY == OVERSIZE_EVERY - 1:
            emit(
                doc_id,
                text,
                lang,
                page_ts(doc_id, dup=True),
                synth_oversized_html(doc_id, text),
                url_suffix="/big",
            )
        if with_url_variants and doc_id % URL_VARIANT_EVERY == 1:
            base = page_url(doc_id)
            messy = "HTTP://WWW." + base[len("https://"):].upper() + "/"
            emit(
                doc_id, text, lang,
                page_ts(doc_id, dup=True), payload, url_override=messy,
            )
            emit(
                doc_id, text, lang,
                page_ts(doc_id) + _dt.timedelta(seconds=2 * DUP_TS_OFFSET_S),
                payload, url_override=base + URL_VARIANT_QUERY,
            )
        if with_versions and doc_id % VERSION_EVERY == 0:
            emit(doc_id, text, lang, page_ts(doc_id, dup=True), payload)
            v2 = text + VERSION_SUFFIX
            emit(
                doc_id,
                v2,
                lang,
                page_ts(doc_id) + _dt.timedelta(seconds=2 * DUP_TS_OFFSET_S),
                synth_payload(doc_id, v2),
            )
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(payloads, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


# --- crawl-snapshot synthesis (CDX-diff fixture) -----------------------------

SNAPSHOT_REMOVE_EVERY = 13   # doc_id % 13 == 5 -> page gone in snapshot B
SNAPSHOT_CHANGE_EVERY = 5    # doc_id % 5 == 0 -> revised content in B
SNAPSHOT_ADD_EVERY = 17      # doc_id % 17 == 2 -> publishes a NEW page in B
SNAPSHOT_ADD_OFFSET = 10**12   # beyond any amplified doc-id space


def snapshot_pages_batch(batch: pa.Table, which: str) -> pa.Table:
    """Two deterministic crawl snapshots of one corpus, for snapshot
    diffing. Snapshot "a": every doc at its base crawl. Snapshot "b"
    (one day later): pages of doc_id % 13 == 5 are GONE (removed),
    doc_id % 5 == 0 pages carry revised content (VERSION_SUFFIX appended
    — a distinct payload), and doc_id % 17 == 2 docs additionally publish
    a NEW page under doc_id + SNAPSHOT_ADD_OFFSET. Removal wins over
    revision (a removed page has no revised crawl)."""
    assert which in ("a", "b")
    urls: list[str] = []
    tss: list[_dt.datetime] = []
    payloads: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []

    def emit(doc_id: int, text: str, lang: str, ts: _dt.datetime) -> None:
        urls.append(page_url(doc_id))
        tss.append(ts)
        payloads.append(synth_payload(doc_id, text))
        texts.append(text)
        langs.append(lang)

    for doc_id, text, lang in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist(), batch["lang"].to_pylist()
    ):
        if which == "a":
            emit(doc_id, text, lang, page_ts(doc_id))
            continue
        ts_b = page_ts(doc_id, dup=True)
        if doc_id % SNAPSHOT_REMOVE_EVERY != 5:
            t = text + VERSION_SUFFIX if doc_id % SNAPSHOT_CHANGE_EVERY == 0 else text
            emit(doc_id, t, lang, ts_b)
        if doc_id % SNAPSHOT_ADD_EVERY == 2:
            emit(doc_id + SNAPSHOT_ADD_OFFSET, text, lang, ts_b)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(payloads, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )
