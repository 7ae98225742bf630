"""Ray stage: per-document markdown -> XML structural compile.

The document is the unit of work (marker stack is doc-scoped state), so
the whole compiler is one vectorized-over-rows map_batches fn — no
shuffles, no cross-row state. Also provides the deterministic book_md
synthesizer used by queries/bench: every document's text becomes a small
paged book with TOC, structure headings, a list, a figure and a skip
section, exercising every parser path.
"""

from __future__ import annotations

import pyarrow as pa

from ebook_ocr_ray.reads import read_parquet_clean
from ebook_ocr_ray.functions.bookparse import parse_document
from ebook_ocr_ray.functions.bookxml import build_book_xml


def synth_book_md(doc_id: int, text: str) -> str:
    """Deterministic paged markdown book from one document's text."""
    words = text.split(" ")
    third = max(1, len(words) // 3)
    p1, p2, p3 = (
        " ".join(words[:third]),
        " ".join(words[third:2 * third]),
        " ".join(words[2 * third:]),
    )
    return "\n".join(
        [
            "--- Page 1 (page_0001.png) ---",
            "<!-- toc -->",
            f"# Chapter 1 Opening ... 2",
            f"## Section 1.1 Detail ─── 3",
            "<!-- /toc -->",
            "<!-- content -->",
            "--- Page 2 (page_0002.png) ---",
            "# Chapter 1 Opening",
            f"{p1}.",
            "<!-- skip -->",
            f"boilerplate footer {doc_id}",
            "<!-- /skip -->",
            "--- Page 3 (page_0003.png) ---",
            "## Section 1.1 Detail",
            f"{p2}",
            f"{p3}.",
            "● first point",
            "● second point",
            f"<!-- FIGURE: fig_{doc_id}.png -->",
            "#### Deep note",
            "<!-- /content -->",
        ]
    )


def synth_denormalized_book_md(doc_id: int, text: str) -> str:
    """Same book, but body headings drift from the TOC: the chapter
    heading lost its number, the section heading uses a dash separator —
    exactly two repairable defects per document (closed-form oracle for
    the rule generator)."""
    md = synth_book_md(doc_id, text)
    # full-line replacement only — the TOC block's lines (which carry page
    # leaders) must keep their numbers
    md = md.replace("\n# Chapter 1 Opening\n", "\n# Opening\n")
    md = md.replace("\n## Section 1.1 Detail\n", "\n## 1-1 Detail\n")
    return md


def heading_repair_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> normalize-headings rule report per document."""
    from ebook_ocr_ray.functions.headrules import normalize_headings

    ids = batch["doc_id"].to_pylist()
    out = {"doc_id": ids, "n_rules": [], "n_applied": [], "match_rate_pct": []}
    for doc_id, text in zip(ids, batch["text"].to_pylist()):
        _new_md, report = normalize_headings(synth_denormalized_book_md(doc_id, text))
        out["n_rules"].append(report["n_rules"])
        out["n_applied"].append(report["n_applied"])
        out["match_rate_pct"].append(report["match_rate_pct"])
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_rules": pa.array(out["n_rules"], pa.int32()),
            "n_applied": pa.array(out["n_applied"], pa.int32()),
            "match_rate_pct": pa.array(out["match_rate_pct"], pa.int32()),
        }
    )


def heading_repair_pipeline(sf_dir: str):
    import ray.data

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(heading_repair_batch, batch_format="pyarrow")


def compile_books(batch: pa.Table) -> pa.Table:
    """(doc_id, book_md) -> (doc_id, book_xml, n_pages, n_errors)."""
    xmls, n_pages, n_errors = [], [], []
    for md in batch["book_md"].to_pylist():
        doc = parse_document(md)
        xmls.append(build_book_xml(doc))
        n_pages.append(len(doc.pages))
        n_errors.append(len(doc.errors))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "book_xml": pa.array(xmls, pa.large_string()),
            "n_pages": pa.array(n_pages, pa.int32()),
            "n_errors": pa.array(n_errors, pa.int32()),
        }
    )


def synth_books_batch(batch: pa.Table) -> pa.Table:
    mds = [
        synth_book_md(d, t)
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
    ]
    return pa.table({"doc_id": batch["doc_id"], "book_md": pa.array(mds, pa.large_string())})


def structural_pipeline(sf_dir: str):
    """documents -> synth book_md -> compile to XML."""
    import ray.data

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(synth_books_batch, batch_format="pyarrow").map_batches(
        compile_books, batch_format="pyarrow"
    )


def embedded_figures_pipeline(sf_dir: str):
    """M34 analog (reference b64 figure encode, src/utils.py:14-38 used by
    the figure-marker flow, utils.py:41+): replace each compiled book's
    figure file reference with a base64 data URI of the figure's media
    payload, joined from the media table by doc id.

    Shape: books (doc_id, book_xml) LEFT OUTER hash-join media images
    (payloads move only for docs that have one — a third of the corpus),
    then a vectorized per-batch splice. Books without an image keep their
    file reference untouched.
    """
    import base64

    import ray.data

    from ebook_ocr_ray.joins import safe_join
    from ebook_ocr_ray.stages.multimodal import media_dataset

    books = structural_pipeline(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "book_xml"]), batch_format="pyarrow"
    )
    imgs = media_dataset(sf_dir, kind="image").map_batches(
        lambda t: t.select(["media_id", "payload"]), batch_format="pyarrow"
    )
    joined = safe_join(
        books, imgs,
        on="doc_id", right_on="media_id",
        num_partitions=8, join_type="left_outer",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("book_xml", pa.large_string())]
        ),
        right_schema=pa.schema([("media_id", pa.int64()), ("payload", pa.binary())]),
    )

    def embed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        xmls = batch["book_xml"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out = []
        for i, xml, payload in zip(ids, xmls, payloads):
            if payload is not None:
                uri = "data:image/fake;base64," + base64.b64encode(payload).decode()
                xml = xml.replace(f'src="fig_{i}.png"', f'src="{uri}"')
            out.append(xml)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "book_xml": pa.array(out, pa.large_string()),
            }
        )

    return joined.map_batches(embed, batch_format="pyarrow")
