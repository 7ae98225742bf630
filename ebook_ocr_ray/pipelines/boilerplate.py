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
    """Deterministic int63 hash of the site string — THE canonical stable
    hash (textstats.stable_hash64) masked positive (NEVER Python's
    process-salted str hash) for the keyed totals join. Collisions are
    tolerated: the post-join filter re-checks exact site equality."""
    from ebook_ocr_ray.functions.textstats import stable_hash63, stable_hash64

    return pa.array(
        [stable_hash63(s) for s in t[col].to_pylist()],
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


# --------------------------------------------------------------------------
# Boilerplate APPLY (mine -> strip): remove each site's mined lines from
# its pages — the CCNet/C4 "drop repeated lines" cleaning step, closing
# the mine->apply loop the way heading_rules closes analyze->normalize.
# --------------------------------------------------------------------------

# Beyond this many mined (site, line) rows the set stops being broadcast
# and the apply becomes a keyed join of per-site line-hash blobs onto the
# pages (the spandedup escape-hatch shape).
BOILERPLATE_BROADCAST_MAX = 1_000_000


def _line_hashes_by_site(mined_df) -> dict[str, np.ndarray]:
    from ebook_ocr_ray.functions.textstats import stable_hash63, stable_hash64

    out: dict[str, np.ndarray] = {}
    for site, grp in mined_df.groupby("site", sort=False):
        hs = np.fromiter(
            (stable_hash63(ln) for ln in grp["line"]),
            dtype=np.int64,
            count=len(grp),
        )
        out[site] = np.sort(hs)
    return out


def _strip_blocks(
    payload: bytes, hot_sorted: np.ndarray
) -> tuple[str, int]:
    """Drop non-head DOM blocks whose text hash is in the site's mined
    set; surviving block texts join with newlines. Membership is by the
    canonical 63-bit hash (a cross-line collision is deterministic and
    ~n/2^63; the oracle's string-exact replay proves it never fires at
    oracle scale)."""
    from ebook_ocr_ray.functions.textstats import stable_hash63, stable_hash64

    kept, stripped = [], 0
    for block in parse_blocks(payload.decode("utf-8", errors="replace")):
        if block.in_head:
            continue
        text = block.text.strip()
        if not text:
            continue
        h = stable_hash63(text)
        if len(hot_sorted):
            i = np.searchsorted(hot_sorted, h)
            if i < len(hot_sorted) and hot_sorted[i] == h:
                stripped += 1
                continue
        kept.append(text)
    return "\n".join(kept), stripped


def strip_boilerplate(
    sf_dir: str,
    min_ratio: float = 0.5,
    min_count: int = 2,
    hot_strategy: str = "auto",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(url, site, clean_text, n_stripped) for every base html page:
    mine each site's boilerplate lines (site_boilerplate), then remove
    those lines from the site's pages and rejoin the surviving DOM block
    texts. Two passes over the page synthesis (the extract_e2e recompute
    trade; spool if payloads are expensive to produce).

    The mined set is broadcast while it fits (bounded by the corpus's
    boilerplate inventory) and flips to a keyed join of per-site
    line-hash record blobs onto the pages beyond
    BOILERPLATE_BROADCAST_MAX — ``hot_strategy`` forces either path."""
    from ebook_ocr_ray.pipelines.extraction import pages_dataset, prepare_pages

    if hot_strategy not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown hot_strategy {hot_strategy!r}")

    mined = site_boilerplate(
        prepare_pages(pages_dataset(sf_dir)),
        min_ratio=min_ratio,
        min_count=min_count,
        num_partitions=num_partitions,
    ).materialize()                       # slim (site, line) rows, used once
    n_mined = mined.count()

    pages = prepare_pages(pages_dataset(sf_dir, kind="html"))

    use_join = hot_strategy == "join" or (
        hot_strategy == "auto" and n_mined > BOILERPLATE_BROADCAST_MAX
    )
    if not use_join:
        by_site_ref = ray.put(_line_hashes_by_site(mined.to_pandas()))
        _empty = np.empty(0, dtype=np.int64)

        def strip(batch: pa.Table) -> pa.Table:
            by_site = ray.get(by_site_ref)
            urls, sites_o, texts, counts = [], [], [], []
            for url, site, payload in zip(
                batch["url"].to_pylist(),
                batch["site"].to_pylist(),
                batch["html"].to_pylist(),
            ):
                clean, n = _strip_blocks(payload or b"", by_site.get(site, _empty))
                urls.append(url)
                sites_o.append(site)
                texts.append(clean)
                counts.append(n)
            return pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "site": pa.array(sites_o, pa.string()),
                    "clean_text": pa.array(texts, pa.string()),
                    "n_stripped": pa.array(counts, pa.int64()),
                }
            )

        return pages.map_batches(strip, batch_format="pyarrow")

    return _strip_boilerplate_join(pages, mined, num_partitions)


def _strip_boilerplate_join(
    pages: ray.data.Dataset, mined: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Keyed path: per-site line-hash record blobs join onto the pages by
    hashed site; each page strips against its own blob. Pages move once
    (the _join_pair_texts discipline); no driver state."""
    from ebook_ocr_ray.functions.textstats import stable_hash63, stable_hash64
    from ebook_ocr_ray.joins import safe_join
    from ebook_ocr_ray.pipelines.neardup import _make_collect_records_agg

    def mined_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "skey": _site_key_col(t),
                "lhash": pa.array(
                    [
                        stable_hash63(ln)
                        for ln in t["line"].to_pylist()
                    ],
                    pa.int64(),
                ),
            }
        )

    blobs = (
        mined.map_batches(mined_rows, batch_format="pyarrow")
        .groupby("skey")
        .aggregate(_make_collect_records_agg(["lhash"], alias="lblob"))
    )

    def blob_cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "skey_b": t["skey"].cast(pa.int64()),
                "lblob": t["lblob"].cast(pa.large_binary()),
            }
        )

    def page_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "site": t["site"],
                "html": t["html"],
                "skey": _site_key_col(t),
            }
        )

    joined = safe_join(
        pages.map_batches(page_slim, batch_format="pyarrow"),
        blobs.map_batches(blob_cast, batch_format="pyarrow"),
        on="skey",
        right_on="skey_b",
        num_partitions=num_partitions,
        join_type="left_outer",
        left_schema=pa.schema(
            [("url", pa.string()), ("site", pa.string()),
             ("html", pa.binary()), ("skey", pa.int64())]
        ),
        right_schema=pa.schema(
            [("skey_b", pa.int64()), ("lblob", pa.large_binary())]
        ),
    )

    def strip(batch: pa.Table) -> pa.Table:
        urls, sites_o, texts, counts = [], [], [], []
        for url, site, payload, blob in zip(
            batch["url"].to_pylist(),
            batch["site"].to_pylist(),
            batch["html"].to_pylist(),
            batch["lblob"].to_pylist(),
        ):
            hot = (
                np.sort(np.frombuffer(blob, dtype="<u8").astype(np.int64))
                if blob
                else np.empty(0, dtype=np.int64)
            )
            clean, n = _strip_blocks(payload or b"", hot)
            urls.append(url)
            sites_o.append(site)
            texts.append(clean)
            counts.append(n)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "site": pa.array(sites_o, pa.string()),
                "clean_text": pa.array(texts, pa.string()),
                "n_stripped": pa.array(counts, pa.int64()),
            }
        )

    return joined.map_batches(strip, batch_format="pyarrow")
