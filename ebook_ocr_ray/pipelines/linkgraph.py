"""Link-graph analytics over the extracted outlink table: PageRank in
EXACT integer arithmetic — the web-corpus quality prior (domain/page
authority feeds crawl frontiers and quality-weighted sampling).

Frozen semantics (mirrored op-for-op by the SQL oracle):

  * nodes  = distinct src urls UNION distinct resolved dst urls,
  * edges  = DISTINCT (src, dst); dst resolves a root-relative href
    against the src's scheme+host (the synthetic corpus emits only
    root-relative hrefs; absolute hrefs pass through),
  * outdeg = distinct outlinks per src,
  * R_0(v) = SCALE (1e6 integer units),
  * R_{k+1}(v) = (15 * SCALE) // 100
                 + sum over in-edges (u, v) of (85 * R_k(u)) // (100 * outdeg(u))
  * K iterations (default 3), output (url, rank = R_K) as int64.

Every operation is int64 floor arithmetic, so summation order can never
change a value — the Ray result and the DuckDB replay are equal by
construction, not within-epsilon. Dangling nodes (no outlinks) simply
contribute nothing; their mass is not redistributed (documented
deviation from the textbook formulation — it keeps every step local to
an edge join).

Scale shape: an iteration is one hash join (ranks onto edges by src)
plus one keyed sum (contributions by dst) — the propagate_labels round
shape. While the EDGE table fits the driver (<= PR_DRIVER_MAX edges,
the propagate_labels/honesty contract) the whole loop runs vectorized
in numpy after one distributed edge collection; beyond it every
iteration stays keyed and nothing lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SCALE = 1_000_000
# EDGE-count bound for the driver fast path: the fast path collects the
# (src, dst, keys) edge rows themselves, so the contract is on edges,
# not nodes — a dense 1M-edge graph over few nodes still ships ~1M url
# pairs to the driver. Beyond it every iteration stays keyed.
PR_DRIVER_MAX = 1_000_000
_MASK63 = (1 << 63) - 1

# Ranks above this would wrap int64 in the 85*r contribution product —
# reachable only for a hub with ~1e11+ distinct in-links. Fail LOUDLY:
# numpy wraps silently to a negative contribution otherwise, and the
# keyed path's exactness claim rests on the integer arithmetic never
# overflowing.
_RANK_OVERFLOW_MAX = (2**63 - 1) // 100


def _check_rank_overflow(r: np.ndarray) -> None:
    if len(r) and int(r.max()) > _RANK_OVERFLOW_MAX:
        raise OverflowError(
            f"pagerank rank {int(r.max())} exceeds the int64-safe bound "
            f"{_RANK_OVERFLOW_MAX} (a ~1e11-in-link hub); rescale SCALE "
            "down or shard the hub before ranking"
        )


def _resolve(src: str, href: str) -> str:
    """Absolute link target for an outlink row. Hardened like
    anchor_text_stats' site derivation: a null/empty href resolves to
    the src itself (a self-edge — crawl noise, treated like any other
    edge), and a schemeless src falls back to urlsplit rather than
    crashing the whole edge-extraction task on one malformed row."""
    if not href:
        return src
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if src.startswith("http://") or src.startswith("https://"):
        # scheme://host prefix = everything before the path
        parts = src.split("/", 3)                # ['https:', '', host, rest]
        return f"{parts[0]}//{parts[2]}{href}"
    from urllib.parse import urlsplit

    u = urlsplit(src)
    host = u.netloc or u.path.split("/", 1)[0]
    return f"{u.scheme or 'https'}://{host}{href}"


def _edges_dataset(sf_dir: str) -> ray.data.Dataset:
    """DISTINCT (src, dst) edge rows with 63-bit url keys."""
    from ebook_ocr_ray.functions.textstats import stable_hash63
    from ebook_ocr_ray.pipelines.extraction import outlinks

    def to_edges(t: pa.Table) -> pa.Table:
        seen = set()
        srcs, dsts, sk, dk = [], [], [], []
        for src, href in zip(t["url"].to_pylist(), t["href"].to_pylist()):
            dst = _resolve(src, href)
            if (src, dst) in seen:
                continue
            seen.add((src, dst))
            srcs.append(src)
            dsts.append(dst)
            sk.append(stable_hash63(src))
            dk.append(stable_hash63(dst))
        return pa.table(
            {
                "src": pa.array(srcs, pa.string()),
                "dst": pa.array(dsts, pa.string()),
                "src_key": pa.array(sk, pa.int64()),
                "dst_key": pa.array(dk, pa.int64()),
            }
        )

    # per-batch dedup first; the cross-batch DISTINCT is one keyed pass
    raw = outlinks(sf_dir).map_batches(to_edges, batch_format="pyarrow")

    def uniq_partition(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["src_key", "dst_key"])[
            ["src", "dst", "src_key", "dst_key"]
        ]

    from ebook_ocr_ray.groups import map_partitions_typed

    return map_partitions_typed(
        raw,
        "src_key",
        uniq_partition,
        schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()),
             ("src_key", pa.int64()), ("dst_key", pa.int64())]
        ),
        # Arrow empty table (an empty object Series would infer type null)
        empty_fn=lambda: pa.schema(
            [("src", pa.string()), ("dst", pa.string()),
             ("src_key", pa.int64()), ("dst_key", pa.int64())]
        ).empty_table(),
        num_partitions=4,
    )


def _pagerank_driver(edges_df: pd.DataFrame, iters: int) -> pa.Table:
    """Vectorized integer PageRank on the driver (bounded input)."""
    nodes = pd.concat(
        [
            edges_df[["src", "src_key"]].rename(
                columns={"src": "url", "src_key": "key"}
            ),
            edges_df[["dst", "dst_key"]].rename(
                columns={"dst": "url", "dst_key": "key"}
            ),
        ]
    ).drop_duplicates("key").sort_values("url")
    keys = nodes["key"].to_numpy(dtype=np.int64)
    order = np.argsort(keys)
    keys_sorted = keys[order]
    n = len(keys_sorted)

    src_idx = np.searchsorted(keys_sorted, edges_df["src_key"].to_numpy(np.int64))
    dst_idx = np.searchsorted(keys_sorted, edges_df["dst_key"].to_numpy(np.int64))
    outdeg = np.bincount(src_idx, minlength=n).astype(np.int64)

    r = np.full(n, SCALE, dtype=np.int64)
    base = (15 * SCALE) // 100
    for _ in range(iters):
        _check_rank_overflow(r)
        contrib = (85 * r[src_idx]) // (100 * outdeg[src_idx])
        nxt = np.full(n, base, dtype=np.int64)
        np.add.at(nxt, dst_idx, contrib)
        r = nxt

    # vectorized rank lookup in the nodes frame's url order (a dict
    # rebuild + per-row list comprehension here cost millions of Python
    # hash/box ops on the driver near PR_DRIVER_MAX)
    node_rank = r[np.searchsorted(keys_sorted, nodes["key"].to_numpy(np.int64))]
    return pa.table(
        {
            "url": pa.array(nodes["url"].tolist(), pa.string()),
            "rank": pa.array(node_rank, pa.int64()),
        }
    )


def pagerank(
    sf_dir: str,
    iters: int = 3,
    strategy: str = "auto",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """(url, rank) after ``iters`` integer PageRank rounds over the
    extracted link graph — see module docstring."""
    if strategy not in ("auto", "driver", "keyed"):
        raise ValueError(f"unknown strategy {strategy!r}")

    edges = _edges_dataset(sf_dir).materialize()     # slim url/key rows
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({"url": pa.array([], pa.string()),
                      "rank": pa.array([], pa.int64())})
        )

    use_driver = strategy == "driver" or (
        strategy == "auto" and n_edges <= PR_DRIVER_MAX
    )
    if use_driver:
        return ray.data.from_arrow(_pagerank_driver(edges.to_pandas(), iters))
    return _pagerank_keyed(edges, iters, num_partitions)


def _pagerank_keyed(
    edges: ray.data.Dataset, iters: int, num_partitions: int
) -> ray.data.Dataset:
    """Fully keyed path: per iteration, ranks join onto edges by src key
    and contributions reduce by dst key — nothing on the driver."""
    from ebook_ocr_ray.groups import map_partitions_typed
    from ebook_ocr_ray.joins import safe_join

    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(
                    np.concatenate(
                        [
                            t["src_key"].to_numpy(zero_copy_only=False),
                            t["dst_key"].to_numpy(zero_copy_only=False),
                        ]
                    ),
                    pa.int64(),
                ),
                "url": pa.array(
                    t["src"].to_pylist() + t["dst"].to_pylist(), pa.string()
                ),
            }
        )

    def uniq_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("key")[["key", "url"]]

    nodes = map_partitions_typed(
        edges.map_batches(node_rows, batch_format="pyarrow"),
        "key",
        uniq_nodes,
        schema=pa.schema([("key", pa.int64()), ("url", pa.string())]),
        empty_fn=lambda: pa.schema(
            [("key", pa.int64()), ("url", pa.string())]
        ).empty_table(),
        num_partitions=num_partitions,
    ).materialize()

    # outdeg rides the edges via a keyed count, then joins back on once
    def deg_partial(t: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            t["src_key"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"key": pa.array(keys, pa.int64()),
             "n": pa.array(counts.astype(np.int64), pa.int64())}
        )

    def deg_reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("key", sort=False)["n"].sum().reset_index()
        return out.rename(columns={"key": "deg_key", "n": "outdeg"}).astype(
            {"deg_key": "int64", "outdeg": "int64"}
        )

    deg = map_partitions_typed(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        "key",
        deg_reduce,
        schema=pa.schema([("key", pa.int64()), ("n", pa.int64())]),
        empty_fn=lambda: pd.DataFrame(
            {"deg_key": pd.Series(dtype="int64"), "outdeg": pd.Series(dtype="int64")}
        ),
        num_partitions=num_partitions,
    )

    slim_edges = edges.map_batches(
        lambda t: t.select(["src_key", "dst_key"]), batch_format="pyarrow"
    )
    edges_deg = safe_join(
        slim_edges,
        deg,
        on="src_key",
        right_on="deg_key",
        num_partitions=num_partitions,
        left_schema=pa.schema([("src_key", pa.int64()), ("dst_key", pa.int64())]),
        right_schema=pa.schema([("deg_key", pa.int64()), ("outdeg", pa.int64())]),
    ).materialize()                                  # re-joined every round

    base = (15 * SCALE) // 100
    ranks = nodes.map_batches(
        lambda t: pa.table(
            {
                "rkey": t["key"].cast(pa.int64()),
                "rank": pa.array(np.full(len(t), SCALE, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        joined = safe_join(
            edges_deg,
            ranks,
            on="src_key",
            right_on="rkey",
            num_partitions=num_partitions,
            left_schema=pa.schema(
                [("src_key", pa.int64()), ("dst_key", pa.int64()),
                 ("outdeg", pa.int64())]
            ),
            right_schema=pa.schema([("rkey", pa.int64()), ("rank", pa.int64())]),
        )

        def contrib_partial(t: pa.Table) -> pa.Table:
            dst = t["dst_key"].to_numpy(zero_copy_only=False)
            r = t["rank"].to_numpy(zero_copy_only=False)
            d = t["outdeg"].to_numpy(zero_copy_only=False)
            _check_rank_overflow(r)
            c = (85 * r) // (100 * d)
            df = pd.DataFrame({"key": dst, "n": c})
            agg = df.groupby("key", sort=False)["n"].sum().reset_index()
            return pa.Table.from_pandas(
                agg, preserve_index=False
            ).replace_schema_metadata(None)

        def contrib_reduce(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("key", sort=False)["n"].sum().reset_index()
            return out.rename(columns={"key": "ckey", "n": "contrib"}).astype(
                {"ckey": "int64", "contrib": "int64"}
            )

        contribs = map_partitions_typed(
            joined.map_batches(contrib_partial, batch_format="pyarrow"),
            "key",
            contrib_reduce,
            schema=pa.schema([("key", pa.int64()), ("n", pa.int64())]),
            empty_fn=lambda: pd.DataFrame(
                {"ckey": pd.Series(dtype="int64"),
                 "contrib": pd.Series(dtype="int64")}
            ),
            num_partitions=num_partitions,
        )

        with_c = safe_join(
            nodes,
            contribs,
            on="key",
            right_on="ckey",
            num_partitions=num_partitions,
            join_type="left_outer",
            left_schema=pa.schema([("key", pa.int64()), ("url", pa.string())]),
            right_schema=pa.schema(
                [("ckey", pa.int64()), ("contrib", pa.int64())]
            ),
        )

        def next_rank(t: pa.Table) -> pa.Table:
            c = pa.compute.coalesce(
                t["contrib"].cast(pa.int64()), pa.scalar(0, pa.int64())
            ).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "rkey": t["key"].cast(pa.int64()),
                    "rank": pa.array(base + c, pa.int64()),
                }
            )

        ranks = with_c.map_batches(next_rank, batch_format="pyarrow").materialize()

    out = safe_join(
        nodes,
        ranks,
        on="key",
        right_on="rkey",
        num_partitions=num_partitions,
        left_schema=pa.schema([("key", pa.int64()), ("url", pa.string())]),
        right_schema=pa.schema([("rkey", pa.int64()), ("rank", pa.int64())]),
    )
    return out.map_batches(
        lambda t: t.select(["url", "rank"]), batch_format="pyarrow"
    )


# --- inlink anchor-text aggregation ------------------------------------------

def anchor_text_stats(sf_dir: str, num_partitions: int = 4) -> ray.data.Dataset:
    """Per link target: inlink count and distinct-anchor-text count —
    the anchor-text index step of a web corpus pipeline (inlink anchors
    are a classic relevance/label signal; aggregating them per target is
    the standard join-free way to attach them to documents).

        outlinks (url, href, anchor_text)            # slim columns only
          -> map_batches: (site, href, anchor_text, n)   per-batch combine
          -> hash-partition on target surrogate key
          -> per-partition: n_links = sum(n), n_anchor_texts = distinct

    Targets here are site-relative (every synthesized href is), so the
    target identity is (site, href). One slim-row shuffle, partials
    pre-combined map-side; distinct anchors per (site, href) are bounded
    by the site's template vocabulary, so per-partition frames stay small
    at any corpus size."""
    from ebook_ocr_ray.functions.textstats import stable_hash63
    from ebook_ocr_ray.groups import map_partitions_typed
    from ebook_ocr_ray.pipelines.extraction import outlinks
    from ebook_ocr_ray.stages.extract import site_of

    links = outlinks(sf_dir).select_columns(["url", "href", "anchor_text"])

    def partial(t: pa.Table) -> pa.Table:
        # site_of (urlsplit-based) rather than a path-slash regex: a
        # root url without a trailing slash must map to its site, not
        # crash the map task
        sites = [site_of(u) for u in t["url"].to_pylist()]
        df = pd.DataFrame(
            {
                "site": sites,
                "href": t["href"].to_pylist(),
                "anchor_text": t["anchor_text"].to_pylist(),
            }
        )
        # dropna=False: a null href/anchor_text keeps its group (SQL
        # GROUP BY semantics) instead of silently vanishing
        agg = (
            df.groupby(["site", "href", "anchor_text"], sort=False, dropna=False)
            .size()
            .rename("n")
            .reset_index()
        )
        skeys = [
            stable_hash63(f"{s}\x1f{h}")
            for s, h in zip(agg["site"], agg["href"])
        ]
        # explicit types (empty object columns infer null under from_pandas)
        return pa.table(
            {
                "site": pa.array(agg["site"], pa.string()),
                "href": pa.array(agg["href"], pa.string()),
                "anchor_text": pa.array(agg["anchor_text"], pa.string()),
                "n": pa.array(agg["n"].astype("int64"), pa.int64()),
                "skey": pa.array(skeys, pa.int64()),
            }
        )

    def reduce_fn(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["site", "href"], sort=False, dropna=False)
            .agg(
                n_links=("n", "sum"),
                n_anchor_texts=("anchor_text", "nunique"),
            )
            .reset_index()
        )
        for c in ("n_links", "n_anchor_texts"):
            out[c] = out[c].astype("int64")
        return out

    schema = pa.schema(
        [("site", pa.string()), ("href", pa.string()),
         ("anchor_text", pa.string()), ("n", pa.int64()),
         ("skey", pa.int64())]
    )
    return map_partitions_typed(
        links.map_batches(partial, batch_format="pyarrow"),
        "skey",
        reduce_fn,
        schema=schema,
        empty_fn=lambda: pa.schema(
            [("site", pa.string()), ("href", pa.string()),
             ("n_links", pa.int64()), ("n_anchor_texts", pa.int64())]
        ).empty_table(),
        num_partitions=num_partitions,
    )
