"""Relational / training-data analytics operators over the testdata tables.

Each public function takes ``sf_dir`` and returns a Dataset (or a small
pandas frame for tiny results). Matching DuckDB oracle SQL lives in
``__ray_entry__.oracle_sql``.

Design rules applied throughout (SURVEY.md §4.2):

- aggregates ship partials: vectorized combine inside ``map_batches``
  first, then a ``groupby().aggregate(Sum(...))`` over the (small)
  partials — the shuffle moves one row per (key, batch), not per record;
- small join sides are broadcast once with ``ray.put`` and looked up
  inside ``map_batches`` (no shuffle join);
- money columns are emitted as integer cents (``floor(x*100)``) so
  distributed summation order can never produce float drift vs the oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean
from ray.data.aggregate import Count, Max, Min, Sum

from ebook_ocr_ray.functions.textstats import (
    STOPWORDS,
    detect_language,
    md5_fingerprint,
    quality_score,
    rolling_fingerprint,
    stable_hash63,
    stable_hash64,
)

# --------------------------------------------------------------------------
# TPC-H-style pricing summary (groupby-aggregate with partial combine)
# --------------------------------------------------------------------------


def _cents(values: np.ndarray) -> np.ndarray:
    """The module's money invariant in ONE place: floor(x*100) as int64,
    exactly mirroring the oracles' CAST(floor(x*100) AS BIGINT)."""
    return np.floor(np.asarray(values, dtype=np.float64) * 100).astype(np.int64)


def q1_pricing(sf_dir: str) -> ray.data.Dataset:
    """Pricing summary per (returnflag, linestatus): quantities, base and
    discounted revenue in integer cents, row counts."""
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pylist(),
                "l_linestatus": batch["l_linestatus"].to_pylist(),
                "qty": batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64),
                "base_cents": _cents(price),
                "revenue_cents": _cents(price * (1 - disc)),
            }
        )
        agg = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("qty", "sum"),
                base_cents=("base_cents", "sum"),
                revenue_cents=("revenue_cents", "sum"),
                n=("qty", "size"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    from ebook_ocr_ray.groups import typed_keyed_sum

    # ~6 distinct groups: the typed hash reduce (sentinel-backed, never an
    # empty untyped bundle) replaces the sort aggregate; the result is
    # coalesced to one block so the final order-by is a local sort
    return (
        typed_keyed_sum(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus"],
            ["sum_qty", "base_cents", "revenue_cents", "n"],
            pa.schema(
                [
                    ("l_returnflag", pa.string()),
                    ("l_linestatus", pa.string()),
                    ("sum_qty", pa.int64()),
                    ("base_cents", pa.int64()),
                    ("revenue_cents", pa.int64()),
                    ("n", pa.int64()),
                ]
            ),
            num_partitions=2,
        )
        .repartition(1)
        .sort(["l_returnflag", "l_linestatus"])
    )


# --------------------------------------------------------------------------
# Tumbling-window aggregate over the events stream table
# --------------------------------------------------------------------------


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Per (user, hour) tumbling window: event count and value in integer
    cents. Windows are computed batch-locally (floor to hour) and combined
    by key — no ordering assumption, no watermark needed for tumbling."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # the window key travels through the shuffle as int64 microseconds:
        # Ray's sort-based aggregate downcasts timestamp keys to [s]
        # resolution, which would be a dtype (not value) mismatch against
        # the oracle's date_trunc output
        win = pc.floor_temporal(batch["ts"], unit="hour").cast(pa.timestamp("us"))
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "window_us": win.cast(pa.int64()).to_numpy(zero_copy_only=False),
                "value_cents": _cents(batch["value"].to_numpy(zero_copy_only=False)),
            }
        )
        agg = (
            df.groupby(["user_id", "window_us"], sort=False)
            .agg(n_events=("value_cents", "size"), value_cents=("value_cents", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    def to_timestamp(batch: pa.Table) -> pa.Table:
        win = batch["window_us"].cast(pa.timestamp("us"))
        return pa.table(
            {
                "user_id": batch["user_id"],
                "window_start": win,
                "n_events": batch["n_events"],
                "value_cents": batch["value_cents"],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_us"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
        .map_batches(to_timestamp, batch_format="pyarrow")
    )


# NOTE on the four per-user group-applies below (events_gaps, sessionize,
# purchase_attribution, clicks_before_purchase): they deliberately stay
# on the sort-based ``groupby("user_id").map_groups`` path. A round-5
# conversion to the sentinel-backed hash repartition
# (groups.map_groups_typed) was measured 2.5x SLOWER at sf0.1 (sessionize
# 1.45s -> 3.7s; saturates at ~3.8s even at 16 hash partitions — the
# hash-shuffle aggregator actors plus the single-task-per-partition group
# apply lose to the sort path's finer task fan-out) and was reverted. The
# cost: at SPARSE user cardinality the sort's unpopulated output
# partitions each emit one benign schema-less empty bundle (one executor
# schema-divergence warning per query run) — the documented residual
# class in groups.py; at real event volume the partitions are dense and
# the warning does not fire.
def events_gaps(sf_dir: str) -> ray.data.Dataset:
    """Per-event gap (microseconds) to the user's previous event — the
    lag/as-of pattern: groupby(user) co-locates each user's history, the
    gap computation is a vectorized sorted diff inside the group. First
    event per user gets -1."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def gaps(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="mergesort")
        # force microsecond resolution BEFORE the int cast — some
        # arrow->pandas paths deliver datetime64[ns], which would make
        # the diffs silently 1000x the oracle's microseconds
        gap = g.ts.astype("datetime64[us]").astype("int64").diff()
        return pd.DataFrame(
            {"event_id": g.event_id, "gap_us": gap.fillna(-1).astype("int64")}
        )

    return ds.groupby("user_id").map_groups(gaps, batch_format="pandas")


# --------------------------------------------------------------------------
# Broadcast join: orders -> customer -> nation -> region
# --------------------------------------------------------------------------


def orders_by_region(sf_dir: str) -> ray.data.Dataset:
    """Order counts/revenue per region. The dimension chain
    customer⋈nation⋈region is tiny vs orders, so it is resolved driver-side
    into one custkey->region mapping, broadcast via ray.put, and applied as
    a map-side lookup — the fact table never shuffles."""
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    dim = customer.merge(nation, left_on="c_nationkey", right_on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    lookup_ref = ray.put(dict(zip(dim.c_custkey, dim.r_name)))

    class RegionTag:
        def __init__(self, ref):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cust = batch["o_custkey"].to_numpy(zero_copy_only=False)
            regions = pd.Series(cust).map(self.lookup).to_numpy()
            cents = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
            df = pd.DataFrame({"region": regions, "total_cents": cents})
            agg = (
                df.groupby("region", sort=False)
                .agg(n_orders=("total_cents", "size"), total_cents=("total_cents", "sum"))
                .reset_index()
            )
            return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    from ebook_ocr_ray.groups import typed_keyed_sum

    # typed_keyed_sum, not groupby().aggregate(Sum): 5 regions over many
    # blocks guarantees empty sort partitions and their schema-less
    # RefBundle warnings (the heading_pattern_stats fix, same shape)
    return typed_keyed_sum(
        orders.map_batches(
            RegionTag, fn_constructor_args=(lookup_ref,), batch_format="pyarrow", concurrency=(1, 8)
        ),
        key_cols=["region"],
        sum_cols=["n_orders", "total_cents"],
        partials_schema=pa.schema(
            [("region", pa.string()), ("n_orders", pa.int64()),
             ("total_cents", pa.int64())]
        ),
        num_partitions=4,
    ).sort("region")


def priority_revenue(sf_dir: str) -> ray.data.Dataset:
    """Large x large: lineitem ⋈ orders via the built-in hash-partitioned
    Dataset.join (both sides shuffle on the order key — the case where a
    broadcast doesn't fit), then the usual partial-combine aggregate.
    Revenue is reduced to integer cents BEFORE the join so the fact rows
    shuffled are (key, int64) only."""
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def slim(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "revenue_cents": pa.array(_cents(price * (1 - disc)), pa.int64()),
            }
        )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    # partition count ~ HALF the cluster cpus, capped: each partition is a
    # join-aggregator actor that must coexist with the map tasks feeding
    # it; measured at 32 cpus/sf0.1: 8 parts 3.7s, 16 parts 3.8s,
    # 32 parts 18.9s (aggregators starve their own producers). Also
    # data-adaptive via free parquet metadata: ~300k fact rows per
    # aggregator (bench-scale corpora stop paying idle-actor spin-up;
    # at corpus scale the cpu ceiling governs as before).
    from ebook_ocr_ray.reads import parquet_num_rows

    # footer-only count that also handles a DIRECTORY of parquet files
    # (the spooled-table layout) — pq.ParquetFile(path) throws on dirs
    n_rows = parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    joined = li.map_batches(slim, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=max(4, min(16, cpus // 2, n_rows // 300_000 + 1)),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "priority": batch["o_orderpriority"].to_pylist(),
                "revenue_cents": batch["revenue_cents"].to_numpy(zero_copy_only=False),
            }
        )
        agg = (
            df.groupby("priority", sort=False)
            .agg(n_items=("revenue_cents", "size"), revenue_cents=("revenue_cents", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    from ebook_ocr_ray.groups import typed_keyed_sum

    return (
        typed_keyed_sum(
            joined.map_batches(partial, batch_format="pyarrow"),
            ["priority"],
            ["n_items", "revenue_cents"],
            pa.schema(
                [
                    ("priority", pa.string()),
                    ("n_items", pa.int64()),
                    ("revenue_cents", pa.int64()),
                ]
            ),
            num_partitions=2,
        )
        .repartition(1)
        .sort("priority")
    )


def purchase_attribution(sf_dir: str) -> ray.data.Dataset:
    """As-of join within the events stream: every purchase is attributed
    to the user's most recent click at or before it (merge_asof per user
    group — sort inside the group, never globally)."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def attribute(group: pd.DataFrame) -> pd.DataFrame:
        purchases = (
            group[group.event_type == "purchase"]
            .sort_values(["ts", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        clicks = (
            group[group.event_type == "click"]
            .sort_values(["ts", "event_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        if purchases.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"), "click_id": pd.Series(dtype="int64")}
            )
        if clicks.empty:
            return pd.DataFrame({"event_id": purchases.event_id, "click_id": -1})
        merged = pd.merge_asof(
            purchases[["ts", "event_id"]],
            clicks[["ts", "event_id"]].rename(columns={"event_id": "click_id"}),
            on="ts",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": merged.event_id,
                "click_id": merged.click_id.fillna(-1).astype("int64"),
            }
        )

    return ds.groupby("user_id").map_groups(attribute, batch_format="pandas")


# --------------------------------------------------------------------------
# Corpus term frequency (explode + partial combine + top-k)
# --------------------------------------------------------------------------


def top_terms(sf_dir: str, k: int = 50) -> ray.data.Dataset:
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            for w in text.split(" "):
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {"term": list(counts.keys()), "n": pa.array(list(counts.values()), pa.int64())}
        )

    from ebook_ocr_ray.groups import typed_keyed_sum

    # the synthetic vocabulary is tiny; a web-scale vocabulary would keep
    # the built-in sort aggregate (dense partitions) and a top-k combiner
    return (
        typed_keyed_sum(
            docs.map_batches(partial, batch_format="pyarrow"),
            ["term"],
            ["n"],
            pa.schema([("term", pa.string()), ("n", pa.int64())]),
            num_partitions=8,
        )
        .repartition(1)
        .sort(["n", "term"], descending=[True, False])
        .limit(k)
    )


# --------------------------------------------------------------------------
# Per-source corpus stats (plain grouped aggregate)
# --------------------------------------------------------------------------


def source_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-source count/sum/min/max: per-batch partials shrink each block
    to its distinct sources, then ONE single-partition sentinel-backed
    merge reduces AND sorts (replacing the sort aggregate + global Sort,
    both of which emit schema-less empty bundles at low source
    cardinality). One partition is right because the post-combine rows
    are bounded by distinct sources x blocks — a web-scale source
    cardinality would raise num_partitions and sort downstream."""
    from ebook_ocr_ray.groups import map_partitions_typed

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        agg = (
            df.groupby("source", sort=False)
            .agg(
                n_docs=("doc_id", "size"),
                total_chars=("n_chars", "sum"),
                first_doc=("doc_id", "min"),
                last_doc=("doc_id", "max"),
            )
            .reset_index()
        )
        agg["skey"] = [stable_hash63(s) for s in agg["source"]]
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("source", sort=False)
            .agg(
                n_docs=("n_docs", "sum"),
                total_chars=("total_chars", "sum"),
                first_doc=("first_doc", "min"),
                last_doc=("last_doc", "max"),
            )
            .reset_index()
            .sort_values("source", kind="mergesort")
        )
        return out[
            ["source", "n_docs", "total_chars", "first_doc", "last_doc"]
        ].astype(
            {"n_docs": "int64", "total_chars": "int64",
             "first_doc": "int64", "last_doc": "int64"}
        )

    return map_partitions_typed(
        docs.map_batches(partial, batch_format="pyarrow"),
        "skey",
        merge,
        schema=pa.schema(
            [
                ("source", pa.string()),
                ("n_docs", pa.int64()),
                ("total_chars", pa.int64()),
                ("first_doc", pa.int64()),
                ("last_doc", pa.int64()),
                ("skey", pa.int64()),
            ]
        ),
        empty_fn=lambda: pa.schema(
            [
                ("source", pa.string()),
                ("n_docs", pa.int64()),
                ("total_chars", pa.int64()),
                ("first_doc", pa.int64()),
                ("last_doc", pa.int64()),
            ]
        ).empty_table(),
        num_partitions=1,
    )


# --------------------------------------------------------------------------
# Per-document text analysis
# --------------------------------------------------------------------------


def token_table(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_distinct, stop_count, n_chars) — exactly
    mirrorable in SQL over string_split."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tok, n_dis, n_stop = [], [], []
        for t in texts:
            words = t.split(" ") if t else [""]
            n_tok.append(len(words))
            n_dis.append(len(set(words)))
            n_stop.append(sum(1 for w in words if w in STOPWORDS))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_distinct": pa.array(n_dis, pa.int64()),
                "stop_count": pa.array(n_stop, pa.int64()),
                "n_chars": pc.utf8_length(batch["text"]).cast(pa.int64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def fingerprint_table(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, fp_md5) — content fingerprint; md5 is mirrored by DuckDB's
    md5() so the whole column is oracle-checkable."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fp_md5": pa.array(
                    [md5_fingerprint(t) for t in batch["text"].to_pylist()], pa.string()
                ),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def text_profile(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, lang_pred, quality_milli, fp_roll) — language-ID heuristic,
    quality score (integer millis), rolling-hash fingerprint. Fully
    mirrored in SQL (__ray_entry__._text_profile_sql): trigram hits via
    replace-length arithmetic, the char-run penalty via a positional
    self-join (RE2 has no backreferences), the rolling hash via
    list_reduce in HUGEINT. fp_roll is int64 — the 2^61-1 modulus
    guarantees the value fits, and the oracle's BIGINT must agree on
    dtype."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def prof(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs, quals, rolls = [], [], []
        for t in texts:
            lang, _conf = detect_language(t)
            langs.append(lang)
            quals.append(int(round(quality_score(t) * 1000)))
            rolls.append(rolling_fingerprint(t))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(langs, pa.string()),
                "quality_milli": pa.array(quals, pa.int64()),
                "fp_roll": pa.array(rolls, pa.int64()),
            }
        )

    return docs.map_batches(prof, batch_format="pyarrow")


def train_val_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic corpus split by content-independent url hash: rows
    whose md5(url) starts with 0/1/2 go to 'val' (~3/16 = 18.75%), the
    rest to 'train'. Hash-based membership (never modulo on ids, never
    RNG) keeps the split stable under re-sharding, resumable runs, and
    corpus growth — the standard web-scale train/val discipline."""
    from ebook_ocr_ray.sources.pages import page_url

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        urls = [page_url(d) for d in batch["doc_id"].to_pylist()]
        splits = [
            "val" if hashlib.md5(u.encode()).hexdigest()[0] in "012" else "train"
            for u in urls
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": pa.array(urls, pa.string()),
                "split": pa.array(splits, pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Exact dedup over documents (hash-partition + per-group first)
# --------------------------------------------------------------------------


def dedup_exact_docs(sf_dir: str) -> ray.data.Dataset:
    """One surviving row (min doc_id) per distinct text — the same
    survivor-aggregate + broadcast-filter shape as the pages dedup
    (pipelines/extraction.dedup_exact): a slim (hash -> min doc_id) pass
    over a cheap re-read reduced by a KEYED aggregate (no per-unique-hash
    state ever reaches the driver), then groups are filtered to actual
    duplicates before the broadcast; full rows never shuffle and per-group
    Python never runs. Doc ids are unique, so unlike the pages dedup no
    byte-identical tie handling is needed."""
    slim = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sha_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "text_sha": [md5_fingerprint(t) for t in batch["text"].to_pylist()],
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            }
        )
        agg = (
            df.groupby("text_sha", sort=False)
            .agg(n=("doc_id", "size"), min_id=("doc_id", "min"))
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    dup_groups = (
        slim.map_batches(sha_counts, batch_format="pyarrow")
        .groupby("text_sha")
        .aggregate(Sum("n", alias_name="n"), Min("min_id", alias_name="min_id"))
        .map_batches(
            lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
        )
        .to_pandas()
    )
    dup_map = (
        dict(zip(dup_groups["text_sha"], dup_groups["min_id"]))
        if "text_sha" in dup_groups.columns              # empty frames lose columns
        else {}
    )
    dup_ref = ray.put(dup_map)

    def keep(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        if not dups:
            return batch
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        mask = [
            (s := md5_fingerprint(t)) not in dups or dups[s] == d
            for t, d in zip(texts, ids)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet")
    return docs.map_batches(keep, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Fuzzy-exact dedup (exact dedup on NORMALIZED text — the MassiveText /
# Gopher "fuzzy exact match" step: casing, punctuation and whitespace
# variants of the same document collapse to one survivor)
# --------------------------------------------------------------------------

import re as _fre

_FUZZY_STRIP_RE = _fre.compile(r"[^a-z0-9 ]")
_FUZZY_SPACE_RE = _fre.compile(r" +")


def fuzzy_normalize(text: str | None) -> str:
    """lower -> drop non-[a-z0-9 ] -> collapse space runs -> trim. Every
    step has an exact DuckDB twin (lower / regexp_replace 'g' / trim), so
    the oracle can replay it character-for-character on ASCII corpora."""
    t = _FUZZY_STRIP_RE.sub("", (text or "").lower())
    return _FUZZY_SPACE_RE.sub(" ", t).strip()


# Variant ids in the fuzzy-dedup demo wrapper set a bit OUTSIDE any real
# doc-id range (2^40 ~ 1.1e12 > a 10^12-page corpus's ids) instead of
# adding a fixed offset: `doc_id + 1_000_000` collided with genuine ids
# on corpora >= 1M docs, silently distorting min-id survivor selection
# and n_variants (the SQL oracle replayed the same rule, masking it).
# Mirrored verbatim in the oracle (doc_id | 1099511627776).
VARIANT_ID_BIT = 1 << 40


def dedup_fuzzy_exact_ds(
    docs: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """(doc_id, n_variants): one survivor row (min doc_id) per distinct
    NORMALIZED text over (doc_id, text) rows. Fully keyed — the survivor
    IS the aggregate's output (no broadcast, no join, no per-unique-hash
    driver state): per-batch partials (63-bit normalized-text hash, count,
    min id) -> one int64 hash shuffle -> vectorized per-partition reduce.
    The SQL oracle groups by the normalized STRING; the driver's
    value-hash equality is the collision-freedom proof (jaccard idiom)."""
    from ebook_ocr_ray.groups import map_partitions_typed

    def partials(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keys = np.fromiter(
            (
                stable_hash63(fuzzy_normalize(txt))
                for txt in t["text"].to_pylist()
            ),
            dtype=np.int64,
            count=len(ids),
        )
        df = pd.DataFrame({"key": keys, "doc_id": ids})
        agg = (
            df.groupby("key", sort=False)
            .agg(n=("doc_id", "size"), min_id=("doc_id", "min"))
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(
            None
        )

    def reduce_partition(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("key", sort=False)
            .agg(n_variants=("n", "sum"), doc_id=("min_id", "min"))
            .reset_index()[["doc_id", "n_variants"]]
        )
        return out.astype({"doc_id": "int64", "n_variants": "int64"})

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return map_partitions_typed(
        docs.map_batches(partials, batch_format="pyarrow"),
        "key",
        reduce_partition,
        schema=pa.schema(
            [("key", pa.int64()), ("n", pa.int64()), ("min_id", pa.int64())]
        ),
        empty_fn=lambda: pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "n_variants": pd.Series(dtype="int64"),
            }
        ),
        num_partitions=min(max(8, cpus), num_partitions * 2),
    )


def dedup_fuzzy_exact(sf_dir: str) -> ray.data.Dataset:
    """Query wrapper: the corpus has no casing/punctuation variants by
    construction, so the demonstration UNIONS a deterministic perturbed
    copy of every document (doc_id | VARIANT_ID_BIT, uppercased, doubled
    spaces + trailing '!!') — normalization must collapse each pair back
    to one survivor with n_variants == 2. The perturbation is replayed
    verbatim in the SQL oracle."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def with_variants(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        v_texts = [(txt or "").upper() + "  !!" for txt in texts]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([ids, ids | VARIANT_ID_BIT]), pa.int64()
                ),
                "text": pa.array(texts + v_texts, pa.string()),
            }
        )

    return dedup_fuzzy_exact_ds(
        docs.map_batches(with_variants, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# Sessionization (gap-based session windows over the event stream)
# --------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000          # 30-minute inactivity boundary


def sessionize(sf_dir: str, gap_us: int = SESSION_GAP_US) -> ray.data.Dataset:
    """Session-level aggregates per user: events are grouped into sessions
    split wherever the gap to the previous event exceeds ``gap_us``.

    Shape: ``groupby(user_id).map_groups`` co-locates each user's history
    (bounded per-user volume — the same partitioning argument as
    events_gaps); session assignment is a vectorized cumulative sum over
    the sorted diffs, and the per-session rollup happens inside the group,
    so one slim row per session leaves the shuffle."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = g.ts.astype("datetime64[us]").astype("int64")
        new_session = ts_us.diff().isna() | (ts_us.diff() > gap_us)
        g = g.assign(session_idx=new_session.cumsum().astype("int64"),
                     value_cents=_cents(g.value.to_numpy()))
        out = g.groupby("session_idx", sort=True).agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
            value_cents=("value_cents", "sum"),
        ).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_idx", "n_events", "start_ts", "end_ts",
                    "value_cents"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


# --------------------------------------------------------------------------
# Per-group top-k (partial top-k per batch, final top-k per group)
# --------------------------------------------------------------------------


def top_docs_per_source(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-``k`` documents per source by (n_chars DESC, doc_id ASC).

    Each batch first reduces to at most ``k`` candidate rows per source it
    contains (vectorized pandas head-per-group), so the shuffle moves
    O(k x sources x batches) slim rows — never the corpus — before the
    per-group final top-k."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                              kind="mergesort")
            .groupby("source", sort=False).head(k)
        )

    # final reduce via the sentinel-backed hash path on an int63 surrogate
    # of the source (string keys can't hash-repartition directly; a
    # surrogate collision just co-locates two sources, and the in-frame
    # groupby keeps them separate). The sort-based map_groups this
    # replaces warned one schema-less RefBundle per empty partition
    # (20 sources over 64+ blocks guarantees empties).
    from ebook_ocr_ray.functions.textstats import stable_hash63, stable_hash64
    from ebook_ocr_ray.groups import map_partitions_typed

    def add_skey(t: pa.Table) -> pa.Table:
        keys = [
            stable_hash63(s) for s in t["source"].to_pylist()
        ]
        return t.append_column("skey", pa.array(keys, pa.int64()))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                            kind="mergesort")
        g = df.groupby("source", sort=False).head(k).copy()
        g["rank"] = g.groupby("source", sort=False).cumcount() + 1
        return g[["source", "doc_id", "n_chars", "rank"]].astype(
            {"doc_id": "int64", "n_chars": "int64", "rank": "int64"}
        )

    keyed = docs.map_batches(partial_topk, batch_format="pandas").map_batches(
        add_skey, batch_format="pyarrow"
    )
    return map_partitions_typed(
        keyed,
        "skey",
        finalize,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("source", pa.string()),
             ("n_chars", pa.int64()), ("skey", pa.int64())]
        ),
        empty_fn=lambda: pa.schema(
            [("source", pa.string()), ("doc_id", pa.int64()),
             ("n_chars", pa.int64()), ("rank", pa.int64())]
        ).empty_table(),
        num_partitions=4,
    )


# --------------------------------------------------------------------------
# Per-group exact quantiles via value histogram (no per-group value list)
# --------------------------------------------------------------------------


def token_quantiles_per_source(sf_dir: str) -> ray.data.Dataset:
    """Exact p50/p90 of per-document token counts per source, computed
    from a (source, n_tokens) count histogram: the group's raw values
    NEVER co-locate — batches ship partial counts, a keyed Sum merges
    them, and the quantile is read off the sorted cumulative histogram
    (bounded by the number of DISTINCT token counts, not document count).
    Quantile rule mirrors DuckDB quantile_disc: sorted[ceil(q*n) - 1]."""
    import math

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        for src, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            key = (src, len(t.split(" ")) if t else 1)
            counts[key] = counts.get(key, 0) + 1
        return pa.table(
            {
                "source": pa.array([s for s, _ in counts], pa.string()),
                "n_tokens": pa.array([v for _, v in counts], pa.int64()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    # ONE hash shuffle on a 63-bit source surrogate replaces the previous
    # two all-to-alls (sort-based groupby(source, n_tokens).Sum + a second
    # sort-based map_groups on source): the per-batch partials already
    # shrink each block to its distinct (source, n_tokens) histogram, so
    # co-locating by SOURCE alone merges the partials AND reads the
    # quantiles in one vectorized per-partition kernel — and the
    # sentinel-backed repartition never emits the sort path's schema-less
    # empty bundles. Shuffle volume per source is bounded by
    # blocks x distinct token counts, not document count.
    from ebook_ocr_ray.groups import map_partitions_typed

    def add_gkey(t: pa.Table) -> pa.Table:
        keys = [stable_hash63(s) for s in t["source"].to_pylist()]
        return t.append_column("gkey", pa.array(keys, pa.int64()))

    def quantiles(df: pd.DataFrame) -> pd.DataFrame:
        hist = (
            df.groupby(["source", "n_tokens"], sort=False)["n"].sum().reset_index()
        )
        rows = []
        for src, g in hist.groupby("source", sort=False):
            g = g.sort_values("n_tokens", kind="mergesort")
            vals = g.n_tokens.to_numpy()
            cum = g.n.to_numpy().cumsum()
            total = int(cum[-1])

            def q(p: float) -> int:
                rank = math.ceil(p * total)              # quantile_disc rule
                return int(vals[np.searchsorted(cum, rank)])

            rows.append((src, total, q(0.5), q(0.9)))
        out = pd.DataFrame(
            rows, columns=["source", "n_docs", "p50_tokens", "p90_tokens"]
        )
        return out.astype(
            {"n_docs": "int64", "p50_tokens": "int64", "p90_tokens": "int64"}
        )

    return map_partitions_typed(
        docs.map_batches(partial, batch_format="pyarrow").map_batches(
            add_gkey, batch_format="pyarrow"
        ),
        "gkey",
        quantiles,
        schema=pa.schema(
            [("source", pa.string()), ("n_tokens", pa.int64()),
             ("n", pa.int64()), ("gkey", pa.int64())]
        ),
        empty_fn=lambda: pa.schema(
            [("source", pa.string()), ("n_docs", pa.int64()),
             ("p50_tokens", pa.int64()), ("p90_tokens", pa.int64())]
        ).empty_table(),
        num_partitions=4,
    )


# --------------------------------------------------------------------------
# PII redaction (regex scrub over a deterministically-contaminated corpus)
# --------------------------------------------------------------------------

import re as _re

# RE2-compatible (the DuckDB oracle runs the same patterns) and anchored to
# simple character classes so Python re and RE2 agree byte for byte.
EMAIL_RE = _re.compile(r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+")
PHONE_RE = _re.compile(r"555-[0-9]+")


def pii_suffix(doc_id: int) -> str:
    """Deterministic contamination appended to every document so the
    redaction path is exercised (and closed-form checkable) even on a
    clean synthetic corpus."""
    return f" Contact user{doc_id}@example.com or call 555-{1000 + doc_id % 9000}."


def redact_pii(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, clean_text, n_emails, n_phones): email/phone patterns are
    replaced with typed placeholders; counts are per-document match
    totals. Pure per-batch map — no shuffle; patterns are compiled once
    at module import, not per batch."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        clean, n_em, n_ph = [], [], []
        for doc_id, t in zip(ids, batch["text"].to_pylist()):
            s = (t or "") + pii_suffix(doc_id)
            n_em.append(len(EMAIL_RE.findall(s)))
            s = EMAIL_RE.sub("<EMAIL>", s)
            n_ph.append(len(PHONE_RE.findall(s)))
            clean.append(PHONE_RE.sub("<PHONE>", s))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": pa.array(clean, pa.string()),
                "n_emails": pa.array(n_em, pa.int64()),
                "n_phones": pa.array(n_ph, pa.int64()),
            }
        )

    return docs.map_batches(scrub, batch_format="pyarrow")


# --------------------------------------------------------------------------
# TF-IDF top terms per source (two keyed aggregates + broadcast df lookup)
# --------------------------------------------------------------------------


# Above this many distinct terms the df side stops being broadcast and
# joins by term-hash key instead (a web-scale vocabulary outgrows any
# single worker's heap long before the corpus does).
TFIDF_BROADCAST_MAX_TERMS = 1_000_000


def _term_hash64(terms: list[str]) -> np.ndarray:
    """Deterministic 63-bit int key for string terms (md5 prefix masked
    positive): Ray's hash join needs an integer key whose placement is
    process-stable, which Python string hashing is not. Collisions are
    handled by the caller (post-join term-equality filter), not assumed
    away."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
            & ((1 << 63) - 1)
            for w in terms
        ],
        dtype=np.int64,
    )


def tfidf_top_terms(
    sf_dir: str, k: int = 5, df_strategy: str = "auto", num_partitions: int = 8
) -> ray.data.Dataset:
    """Top-``k`` terms per source by tf-idf (tf x ln(N/df), ties broken by
    term). Term frequencies and document frequencies ship as per-batch
    partial counts into two keyed Sums. The df side (one row per DISTINCT
    term) is broadcast via ray.put while the vocabulary is small, and
    flips to a hash-partitioned join on a 63-bit term hash (with a
    post-join term-equality filter so hash collisions cannot mis-score)
    beyond TFIDF_BROADCAST_MAX_TERMS — ``df_strategy`` forces
    'broadcast' or 'join' explicitly; both paths are tested equal."""
    import math

    if df_strategy not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown df_strategy {df_strategy!r}")
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def tf_partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        for src, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            for w in (t.split(" ") if t else [""]):
                counts[(src, w)] = counts.get((src, w), 0) + 1
        return pa.table(
            {
                "source": pa.array([s for s, _ in counts], pa.string()),
                "term": pa.array([w for _, w in counts], pa.string()),
                "tf": pa.array(list(counts.values()), pa.int64()),
            }
        )

    def df_partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for w in set(t.split(" ") if t else [""]):
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(counts.keys()), pa.string()),
                "df": pa.array(list(counts.values()), pa.int64()),
            }
        )

    from ebook_ocr_ray.groups import map_partitions_typed

    def add_tkey(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "tkey", pa.array(_term_hash64(t[col].to_pylist()), pa.int64())
            )

        return fn

    n_docs = docs.count()
    # keyed Sums over the term surrogate hash instead of sort aggregates
    # (which warn one schema-less RefBundle per empty sort partition); a
    # surrogate collision only co-locates two terms — the in-partition
    # pandas groupby over the TRUE string key keeps them separate
    df_ds = map_partitions_typed(
        docs.map_batches(df_partial, batch_format="pyarrow").map_batches(
            add_tkey("term"), batch_format="pyarrow"
        ),
        "tkey",
        lambda d: d.groupby("term", sort=False)["df"]
        .sum()
        .reset_index()
        .astype({"df": "int64"}),
        schema=pa.schema(
            [("term", pa.string()), ("df", pa.int64()), ("tkey", pa.int64())]
        ),
        empty_fn=lambda: pa.schema(
            [("term", pa.string()), ("df", pa.int64())]
        ).empty_table(),
        num_partitions=num_partitions,
    ).materialize()
    n_terms = df_ds.count()
    if n_terms == 0:                              # empty corpus: the empty
        return ray.data.from_arrow(               # aggregate frame loses its
            pa.table(                             # columns entirely
                {
                    "source": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "tfidf": pa.array([], pa.float64()),
                }
            )
        )

    def add_stkey(t: pa.Table) -> pa.Table:
        pairs = [
            f"{s}\x1f{w}"
            for s, w in zip(t["source"].to_pylist(), t["term"].to_pylist())
        ]
        return t.append_column(
            "tkey", pa.array(_term_hash64(pairs), pa.int64())
        )

    tf_tbl = map_partitions_typed(
        docs.map_batches(tf_partial, batch_format="pyarrow").map_batches(
            add_stkey, batch_format="pyarrow"
        ),
        "tkey",
        lambda d: d.groupby(["source", "term"], sort=False)["tf"]
        .sum()
        .reset_index()
        .astype({"tf": "int64"}),
        schema=pa.schema(
            [("source", pa.string()), ("term", pa.string()),
             ("tf", pa.int64()), ("tkey", pa.int64())]
        ),
        empty_fn=lambda: pa.schema(
            [("source", pa.string()), ("term", pa.string()), ("tf", pa.int64())]
        ).empty_table(),
        num_partitions=num_partitions,
    )

    use_join = df_strategy == "join" or (
        df_strategy == "auto" and n_terms > TFIDF_BROADCAST_MAX_TERMS
    )
    if use_join:
        from ebook_ocr_ray.joins import safe_join

        def add_key(col: str):
            def fn(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "term_key", pa.array(_term_hash64(t[col].to_pylist()), pa.int64())
                )
            return fn

        str_t = pa.string()
        joined = safe_join(
            tf_tbl.map_batches(add_key("term"), batch_format="pyarrow"),
            df_ds.map_batches(add_key("term"), batch_format="pyarrow").map_batches(
                lambda t: t.rename_columns(["term_df", "df", "term_key"]),
                batch_format="pyarrow",
            ),
            on="term_key",
            right_on="term_key",
            num_partitions=num_partitions,
            left_schema=pa.schema(
                [("source", str_t), ("term", str_t), ("tf", pa.int64()),
                 ("term_key", pa.int64())]
            ),
            right_schema=pa.schema(
                [("term_df", str_t), ("df", pa.int64()), ("term_key", pa.int64())]
            ),
        )

        def score_joined(batch: pa.Table) -> pa.Table:
            # a 63-bit hash collision joins a tf row to a FOREIGN term's
            # df row too; keeping only the term-equal row restores
            # exactness (the true term's df row is always present)
            eq = pa.compute.equal(batch["term"], batch["term_df"])
            t = batch.filter(eq)
            tfs = t["tf"].to_numpy(zero_copy_only=False)
            dfs = t["df"].to_numpy(zero_copy_only=False)
            tfidf = np.array(
                [tf * math.log(n_docs / d) for tf, d in zip(tfs, dfs)],
                dtype=np.float64,
            )
            return pa.table(
                {
                    "source": t["source"],
                    "term": t["term"],
                    "tf": t["tf"],
                    "tfidf": pa.array(tfidf, pa.float64()),
                }
            )

        scored = joined.map_batches(score_joined, batch_format="pyarrow")
    else:
        df_tbl = df_ds.to_pandas()
        df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"])))

        def score(batch: pa.Table) -> pa.Table:
            dfs = ray.get(df_ref)
            terms = batch["term"].to_pylist()
            tfs = batch["tf"].to_numpy(zero_copy_only=False)
            tfidf = np.array(
                [tf * math.log(n_docs / dfs[w]) for w, tf in zip(terms, tfs)],
                dtype=np.float64,
            )
            return batch.append_column("tfidf", pa.array(tfidf, pa.float64()))

        scored = tf_tbl.map_batches(score, batch_format="pyarrow")

    def final_topk_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["tfidf", "term"], ascending=[False, True],
                            kind="mergesort")
        g = df.groupby("source", sort=False).head(k)
        return g[["source", "term", "tf", "tfidf"]].astype(
            {"tf": "int64", "tfidf": "float64"}
        )

    return map_partitions_typed(
        scored.map_batches(add_tkey("source"), batch_format="pyarrow"),
        "tkey",
        final_topk_partition,
        schema=pa.schema(
            [("source", pa.string()), ("term", pa.string()),
             ("tf", pa.int64()), ("tfidf", pa.float64()),
             ("tkey", pa.int64())]
        ),
        empty_fn=lambda: pa.schema(
            [("source", pa.string()), ("term", pa.string()),
             ("tf", pa.int64()), ("tfidf", pa.float64())]
        ).empty_table(),
        num_partitions=4,
    )


# --------------------------------------------------------------------------
# Stratified deterministic sampling (per-group hash-threshold membership)
# --------------------------------------------------------------------------

# Per-source sampling rates in 1/256ths of the corpus (a hash-byte
# threshold): the up/down-sampling mix a training-data curation pass
# applies per domain/quality tier. Deterministic (md5 of the url with a
# salt, never RNG) so the sample is stable under re-sharding and resume,
# and independent of the train/val hash (different salt).
SAMPLE_SALT = "sample-v1:"
SAMPLE_RATES_256: dict[str, int] = {"src0": 256, "src1": 128, "src2": 64, "src3": 32}
SAMPLE_DEFAULT_256 = 16


def stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Keep a document iff the first byte of md5(salt + url) falls under
    its source's threshold — an exact per-group Bernoulli(rate) sample
    with zero coordination: pure per-batch map, no shuffle, no RNG state,
    reproducible at any parallelism. Rates ride along as a broadcast
    constant (the per-source table is config-sized)."""
    from ebook_ocr_ray.sources.pages import page_url

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        mask = []
        for d, s in zip(ids, srcs):
            b = hashlib.md5((SAMPLE_SALT + page_url(d)).encode()).digest()[0]
            mask.append(b < SAMPLE_RATES_256.get(s, SAMPLE_DEFAULT_256))
        return batch.filter(pa.array(mask, pa.bool_()))

    return docs.map_batches(keep, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Language-cap mixture rebalancing (multilingual corpus sampling: cap the
# dominant language's share so tail languages are not drowned — the
# downsampling half of the XLM-R-style temperature mix, expressed as an
# exact deterministic rule instead of an RNG draw)
# --------------------------------------------------------------------------

REBALANCE_SALT = "rebalance:"
_REBALANCE_NULL = "\x00group-null"   # count-table key for null group values


def rebalance_langs_ds(
    docs: ray.data.Dataset, cap: int, group_col: str = "lang"
) -> ray.data.Dataset:
    """Keep every row of groups at or under ``cap``; downsample larger
    groups to ~cap in expectation with the exact integer rule

        keep  iff  hash_u64(salt + doc_id) * c_group < cap * 2**64

    (Bernoulli(cap / c_group) with zero float arithmetic — no rounding
    boundary can ever disagree with the SQL oracle's HUGEINT replay).
    Hash-based membership keeps the sample stable under re-sharding and
    corpus append, the train_val_split discipline. Two passes: a keyed
    group count (bounded by the language inventory, broadcast via
    ``ray.put``) then a pure per-batch filter — no shuffle touches the
    payload rows."""
    from ebook_ocr_ray.groups import typed_keyed_sum

    def count_partial(t: pa.Table) -> pa.Table:
        # null group values count under a private sentinel so the cap
        # applies to them too (a dominant null-lang slice must not be
        # exempt; pandas groupby would silently drop it)
        df = pd.DataFrame(
            {
                group_col: [
                    _REBALANCE_NULL if v is None else v
                    for v in t[group_col].to_pylist()
                ]
            }
        )
        agg = df.groupby(group_col, sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(
            None
        )

    counts_df = typed_keyed_sum(
        docs.map_batches(count_partial, batch_format="pyarrow"),
        key_cols=[group_col],
        sum_cols=["n"],
        partials_schema=pa.schema([(group_col, pa.string()), ("n", pa.int64())]),
        num_partitions=2,
    ).to_pandas()
    counts_ref = ray.put(dict(zip(counts_df[group_col], counts_df["n"])))
    bound = cap << 64

    def keep(batch: pa.Table) -> pa.Table:
        counts = ray.get(counts_ref)
        ids = batch["doc_id"].to_pylist()
        groups = batch[group_col].to_pylist()
        mask = []
        for d, g in zip(ids, groups):
            c = int(counts.get(_REBALANCE_NULL if g is None else g, 0))
            if c <= cap:
                mask.append(True)
                continue
            h = stable_hash64(f"{REBALANCE_SALT}{d}")     # full 64 bits
            mask.append(h * c < bound)
        return batch.filter(pa.array(mask, pa.bool_()))

    return docs.map_batches(keep, batch_format="pyarrow")


def rebalance_langs(sf_dir: str, cap: int = 100) -> ray.data.Dataset:
    """(doc_id, lang) rows surviving the language cap — see
    rebalance_langs_ds."""
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return rebalance_langs_ds(docs, cap)


# --------------------------------------------------------------------------
# Range join within the event stream (bounded-window count per probe row)
# --------------------------------------------------------------------------

RANGE_WINDOW_US = 60 * 60 * 1_000_000            # 1-hour lookback


def clicks_before_purchase(sf_dir: str, window_us: int = RANGE_WINDOW_US) -> ray.data.Dataset:
    """Range join: for every purchase, the number of the same user's
    clicks in the half-open window [ts - window, ts).

    The equality key (user_id) co-locates each user's history via ONE
    groupby — the range predicate then resolves inside the group as two
    vectorized searchsorted probes on the sorted click timeline, O((P+C)
    log C) per user with no per-pair materialization. This is the
    canonical distributed range-join decomposition: hash-partition on the
    equality key, sort-probe on the range key; at extreme per-user volume
    the group fn swaps to time-bucketed sub-joins without changing the
    dataflow."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def count_in_window(group: pd.DataFrame) -> pd.DataFrame:
        purchases = group[group.event_type == "purchase"]
        if purchases.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "n_clicks": pd.Series(dtype="int64")}
            )
        click_us = np.sort(
            group[group.event_type == "click"].ts
            .astype("datetime64[us]").astype("int64").to_numpy()
        )
        p_us = purchases.ts.astype("datetime64[us]").astype("int64").to_numpy()
        lo = np.searchsorted(click_us, p_us - window_us, side="left")
        hi = np.searchsorted(click_us, p_us, side="left")     # exclusive end
        return pd.DataFrame(
            {"event_id": purchases.event_id.to_numpy(),
             "n_clicks": (hi - lo).astype("int64")}
        )

    return ds.groupby("user_id").map_groups(count_in_window, batch_format="pandas")


# --------------------------------------------------------------------------
# Document chunking (fixed-token windows with overlap, 1->N flat map)
# --------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def chunk_documents(
    sf_dir: str, chunk_tokens: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
) -> ray.data.Dataset:
    """(doc_id, chunk_idx, chunk_text, n_tokens): sliding token windows of
    ``chunk_tokens`` words advancing by ``chunk_tokens - overlap`` — the
    context-window chunking step of an LLM training-data pipeline. Pure
    per-batch 1->N flat map (chunk boundaries depend only on the row), so
    it streams at any parallelism with no shuffle; chunk_idx is stable
    because it derives from word offsets, not arrival order."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        ids, idxs, texts, ntoks = [], [], [], []
        for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            words = (t or "").split(" ")
            n = len(words)
            # a window starting inside the previous window's overlap adds
            # no new tokens — stop before emitting fully-redundant tails
            n_chunks = max(1, (n - overlap + stride - 1) // stride)
            for i in range(n_chunks):
                piece = words[i * stride: i * stride + chunk_tokens]
                ids.append(doc_id)
                idxs.append(i)
                texts.append(" ".join(piece))
                ntoks.append(len(piece))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "chunk_text": pa.array(texts, pa.string()),
                "n_tokens": pa.array(ntoks, pa.int64()),
            }
        )

    return docs.map_batches(chunks, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Sequence packing (greedy bin-fill of chunks into fixed token budgets)
# --------------------------------------------------------------------------

PACK_BUDGET_TOKENS = 128
PACK_BUCKETS = 16


def pack_sequences(
    sf_dir: str,
    budget_tokens: int = PACK_BUDGET_TOKENS,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> ray.data.Dataset:
    """Assign every chunk to a fixed-token training sequence: greedy
    first-fit in (doc_id, chunk_idx) order within a stable hash bucket
    (doc_id % PACK_BUCKETS). Output (bucket, seq_idx, doc_id, chunk_idx,
    n_tokens) — the packing plan a writer would consume.

    Packing is inherently sequential, so the parallel unit is the bucket:
    ONE groupby co-locates each bucket's slim (ids + token count) rows,
    the greedy fold runs inside the group, and determinism follows from
    the stable bucket key + total order — independent of arrival order
    or partitioning. Chunks larger than the budget get a sequence of
    their own (first-fit never splits a chunk)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def chunk_counts(batch: pa.Table) -> pa.Table:
        # the packing plan needs only token COUNTS per window —
        # len(words[i*stride : i*stride+chunk]) == min(chunk, n - i*stride)
        # — so the chunk text is never built (chunk_documents would
        # re-materialize ~1.33x the corpus as strings just to drop them)
        ids, idxs, toks, buckets = [], [], [], []
        for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            n = len((t or "").split(" "))
            n_chunks = max(1, (n - overlap + stride - 1) // stride)
            for i in range(n_chunks):
                ids.append(doc_id)
                idxs.append(i)
                toks.append(min(chunk_tokens, n - i * stride))
                buckets.append(doc_id % PACK_BUCKETS)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
            }
        )

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["doc_id", "chunk_idx"], kind="mergesort")
        toks = g.n_tokens.to_numpy()
        seq = np.empty(len(g), dtype=np.int64)
        cur, filled = 0, 0
        for i, t in enumerate(toks):
            if filled and filled + t > budget_tokens:
                cur += 1
                filled = 0
            seq[i] = cur
            filled += t
        return pd.DataFrame(
            {
                "bucket": g.bucket.to_numpy(),
                "seq_idx": seq,
                "doc_id": g.doc_id.to_numpy(),
                "chunk_idx": g.chunk_idx.to_numpy(),
                "n_tokens": toks,
            }
        )

    from ebook_ocr_ray.groups import map_groups_typed

    # low-cardinality key (PACK_BUCKETS distinct values): the hash-
    # partitioned group apply sizes the shuffle to the key space and emits
    # only schema-typed blocks (a sort-based map_groups here produces one
    # schema-less empty block per surplus sort partition)
    return map_groups_typed(
        docs.map_batches(chunk_counts, batch_format="pyarrow"),
        "bucket",
        pack,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
             ("n_tokens", pa.int64()), ("bucket", pa.int64())]
        ),
        empty_fn=lambda: pd.DataFrame(
            {c: pd.Series(dtype="int64")
             for c in ("bucket", "seq_idx", "doc_id", "chunk_idx", "n_tokens")}
        ),
        num_partitions=PACK_BUCKETS,
    )


# --------------------------------------------------------------------------
# Repetition profile (repeated n-gram detection, the C4-style rep filter)
# --------------------------------------------------------------------------

REP_NGRAM = 4


def repetition_profile(sf_dir: str, n: int = REP_NGRAM) -> ray.data.Dataset:
    """(doc_id, n_grams, max_gram_count, rep_milli): how repetitive is each
    document at the word ``n``-gram level. ``rep_milli`` is the fraction
    of n-gram occurrences belonging to duplicated n-grams, in integer
    thousandths (floor) — the standard boilerplate/repetition quality
    signal a curation pass thresholds on. Pure per-batch map; the n-gram
    multiset never leaves the worker."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def profile(batch: pa.Table) -> pa.Table:
        ids, totals, maxes, reps = [], [], [], []
        for doc_id, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            words = (t or "").split(" ")
            grams = (
                [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
                if len(words) >= n else [" ".join(words)]
            )
            counts: dict[str, int] = {}
            for g in grams:
                counts[g] = counts.get(g, 0) + 1
            total = len(grams)
            dup_occurrences = sum(c for c in counts.values() if c > 1)
            ids.append(doc_id)
            totals.append(total)
            maxes.append(max(counts.values()))
            reps.append(dup_occurrences * 1000 // total)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(totals, pa.int64()),
                "max_gram_count": pa.array(maxes, pa.int64()),
                "rep_milli": pa.array(reps, pa.int64()),
            }
        )

    return docs.map_batches(profile, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Distinct-count sketch (HyperLogLog, mergeable by keyed Max)
# --------------------------------------------------------------------------


def distinct_terms_hll(sf_dir: str) -> pd.DataFrame:
    """One-row (n_exact, hll_estimate) over the corpus vocabulary.

    The canonical mergeable-sketch shape: every batch reduces to at most
    HLL_M slim (bucket, rank) rows, a keyed Max merges them (register
    merge == elementwise max, so partial sketches compose exactly), and
    the driver touches only the fixed 4,096-row register table —
    NEVER the vocabulary. The exact count runs alongside as a keyed
    distinct so the estimate's error is measurable in the same result.
    The estimate is bit-deterministic (integer harmonic sum, single
    float division) and mirrored exactly by the SQL oracle."""
    from ebook_ocr_ray.functions.sketches import HLL_M, hll_estimate, hll_partial

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def batch_terms(batch: pa.Table) -> set[str]:
        terms: set[str] = set()
        for t in batch["text"].to_pylist():
            terms.update(t.split(" ") if t else [""])
        return terms

    def reg_partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(list(batch_terms(batch)))
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64), pa.int64()),
                "rank": pa.array(regs[nz].astype(np.int64), pa.int64()),
            }
        )

    # both reduces ride the sentinel-backed hash repartition
    # (map_partitions_typed), not the sort-based aggregate whose
    # unpopulated output partitions emit schema-less empty bundles —
    # the same conversion as the other low-cardinality reduces
    from ebook_ocr_ray.groups import map_partitions_typed

    merged = map_partitions_typed(
        docs.map_batches(reg_partial, batch_format="pyarrow"),
        "bucket",
        lambda df: df.groupby("bucket", sort=False)["rank"]
        .max()
        .reset_index()
        .astype({"bucket": "int64", "rank": "int64"}),
        schema=pa.schema([("bucket", pa.int64()), ("rank", pa.int64())]),
        empty_fn=lambda: pa.schema(
            [("bucket", pa.int64()), ("rank", pa.int64())]
        ).empty_table(),
        num_partitions=4,
    ).to_pandas()                                 # bounded: <= HLL_M rows
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if len(merged):
        regs[merged["bucket"].to_numpy()] = merged["rank"].to_numpy()
    est = hll_estimate(regs)

    def term_partial(batch: pa.Table) -> pa.Table:
        # batch-local DISTINCT terms only (the combiner), routed by their
        # 63-bit surrogate: equal terms always co-locate, so the global
        # distinct count is exactly the sum of per-partition nunique over
        # the TRUE strings (a surrogate collision merely co-locates two
        # terms; nunique still counts both)
        terms = list(batch_terms(batch))   # no sort: routing and nunique
        return pa.table(                   # are both order-independent
            {
                "tkey": pa.array([stable_hash63(t) for t in terms], pa.int64()),
                "term": pa.array(terms, pa.string()),
            }
        )

    n_exact = int(
        map_partitions_typed(
            docs.map_batches(term_partial, batch_format="pyarrow"),
            "tkey",
            lambda df: pd.DataFrame({"n": pd.array([df["term"].nunique()], dtype="int64")}),
            schema=pa.schema([("tkey", pa.int64()), ("term", pa.string())]),
            empty_fn=lambda: pa.schema([("n", pa.int64())]).empty_table(),
            num_partitions=4,
        )
        .to_pandas()["n"]
        .sum()
    )
    return pd.DataFrame(
        {
            "n_exact": pd.array([n_exact], dtype="int64"),
            "hll_estimate": pd.array([est], dtype="int64"),
        }
    )
