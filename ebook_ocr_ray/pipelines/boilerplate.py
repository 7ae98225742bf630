"""Corpus-level boilerplate mining: lines repeated across a site's pages.

The distributed analog of the reference's running-head detector
(src/book_converter/analyzer.py:102-151): there the unit is one book and
the fold is in-memory; here the unit is a SITE across the corpus, so the
aggregation becomes a keyed shuffle — the one reference operator whose
port genuinely requires a groupby over the whole dataset (SURVEY.md G3).

Flow: html pages -> per-doc distinct candidate lines (DOM block texts,
length-capped — boilerplate is short) -> partial (site, line) counts per
batch -> keyed aggregate -> threshold count >= max(ratio * site_docs, 2),
the reference's own threshold shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ebook_ocr_ray.functions.html_dom import parse_blocks

MAX_LINE_LEN = 200          # boilerplate lines are short; caps shuffle width
_DOC_SENTINEL = "\x00docs"  # per-site doc counter rides the same aggregate


def _candidate_lines(batch: pa.Table) -> pa.Table:
    sites_out, lines_out, counts_out = [], [], []
    partial: dict[tuple[str, str], int] = {}
    for site, kind, payload in zip(
        batch["site"].to_pylist(),
        batch["doc_kind"].to_pylist(),
        batch["html"].to_pylist(),
    ):
        if kind != "html" or not payload:
            continue
        partial[(site, _DOC_SENTINEL)] = partial.get((site, _DOC_SENTINEL), 0) + 1
        seen: set[str] = set()
        for block in parse_blocks(payload.decode("utf-8", errors="replace")):
            text = block.text.strip()
            if text and len(text) <= MAX_LINE_LEN and not block.in_head:
                seen.add(text)
        for text in seen:
            key = (site, text)
            partial[key] = partial.get(key, 0) + 1
    for (site, line), n in partial.items():
        sites_out.append(site)
        lines_out.append(line)
        counts_out.append(n)
    return pa.table(
        {
            "site": pa.array(sites_out, pa.string()),
            "line": pa.array(lines_out, pa.string()),
            "n": pa.array(counts_out, pa.int64()),
        }
    )


def _site_key_col(t: pa.Table, col: str = "site") -> pa.Array:
    """Deterministic int63 hash of the site string (md5 prefix — NEVER
    Python's process-salted str hash) for the keyed totals join.
    Collisions are tolerated: the post-join filter re-checks exact site
    equality."""
    import hashlib

    return pa.array(
        [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) for s in
         t[col].to_pylist()],
        pa.int64(),
    )


def site_boilerplate(
    prepared: ray.data.Dataset,
    min_ratio: float = 0.5,
    min_count: int = 2,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(site, line) pairs where the line occurs in >= max(min_ratio *
    site_doc_count, min_count) of the site's html documents.

    The per-site doc totals ride the same keyed aggregate as the line
    counts (the ``_DOC_SENTINEL`` rows) and are joined BACK onto the
    counts by a hashed-site keyed join — never a driver-side dict: sites
    at web scale are the corpus's host table (~10^8 rows), which no
    worker heap should hold. Only slim (site, line, n) rows shuffle."""
    from ebook_ocr_ray.joins import safe_join

    counts = (
        prepared.map_batches(_candidate_lines, batch_format="pyarrow")
        .groupby(["site", "line"])
        .aggregate(Sum("n", alias_name="n"))
    ).materialize()   # consumed twice (totals + threshold) — parse once

    def lines_side(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.not_equal(t["line"], _DOC_SENTINEL))
        return t.append_column("skey", _site_key_col(t))

    def totals_side(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t["line"], _DOC_SENTINEL))
        return pa.table(
            {
                "site_t": t["site"],
                "total": t["n"],
                "skey": _site_key_col(t),
            }
        )

    joined = safe_join(
        counts.map_batches(lines_side, batch_format="pyarrow"),
        counts.map_batches(totals_side, batch_format="pyarrow"),
        on="skey",
        right_on="skey",
        num_partitions=num_partitions,
        left_schema=pa.schema(
            [("site", pa.string()), ("line", pa.string()), ("n", pa.int64()),
             ("skey", pa.int64())]
        ),
        right_schema=pa.schema(
            [("site_t", pa.string()), ("total", pa.int64()), ("skey", pa.int64())]
        ),
    )

    def threshold(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        total = batch["total"].to_numpy(zero_copy_only=False)
        same_site = pa.compute.equal(batch["site"], batch["site_t"]).to_numpy(
            zero_copy_only=False
        )
        bar = np.maximum(min_ratio * total, min_count)
        return batch.filter(pa.array(same_site & (n >= bar))).select(["site", "line"])

    return joined.map_batches(threshold, batch_format="pyarrow")


def site_boilerplate_pages(sf_dir: str) -> ray.data.Dataset:
    """Boilerplate over the synthesized pages corpus: per site, the nav
    items + the site footer line (closed-form oracle)."""
    from ebook_ocr_ray.pipelines.extraction import pages_dataset, prepare_pages

    return site_boilerplate(prepare_pages(pages_dataset(sf_dir)))
