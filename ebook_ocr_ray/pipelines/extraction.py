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

import logging
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean
from ray.data.aggregate import Sum

from ebook_ocr_ray.config import DEFAULT_NUM_PARTITIONS, ExtractionConfig
from ebook_ocr_ray.sources.pages import pages_from_documents_batch
from ebook_ocr_ray.stages.extract import DocumentExtractor, prepare_batch

logger = logging.getLogger(__name__)

# Task granularity: None = one task per block. Measured fastest here —
# block counts are already sized to ~4 per core by the upstream
# repartition, and explicit batch_size re-slicing cost ~50% extra wall
# time (33s vs 21s at 32 cpus on the amplified corpus).
EXTRACT_BATCH_SIZE = None


def _extract_pool_size() -> int:
    """Fixed actor-pool size: cluster CPUs minus headroom for the upstream
    read/synthesis task stages. Measured on this box: a FIXED pool reaches
    steady state ~2.5x faster than autoscaling concurrency=(2, N) —
    autoscaler ramp-up dominates short runs and never helps a saturated
    pipeline."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus - max(2, cpus // 8))


def load_documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    cols = columns or ["doc_id", "text", "lang"]
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=cols)


def pages_dataset(
    sf_dir: str,
    with_duplicates: bool = False,
    with_versions: bool = False,
    with_oversized: bool = False,
    with_url_variants: bool = False,
    kind: str | None = None,
    repeat: int = 1,
) -> ray.data.Dataset:
    """Synthesize the north-rule pages table from the documents table.
    ``kind`` filters to 'html' / 'pdf' rows (decided by doc_id, so the
    filter prunes before payload synthesis). ``repeat`` > 1 amplifies the
    corpus deterministically (FIXTURES.md §6 scaling-bench input): copy r
    gets doc_id + r*10_000_000, hence distinct urls and payloads."""
    docs = load_documents(sf_dir)
    if repeat > 1:

        def amplify(t: pa.Table) -> pa.Table:
            tables = []
            for r in range(repeat):
                ids = pa.compute.add(t["doc_id"], r * 10_000_000)
                tables.append(t.set_column(t.schema.get_field_index("doc_id"), "doc_id", ids))
            return pa.concat_tables(tables)

        docs = docs.map_batches(amplify, batch_format="pyarrow")
        # re-split so downstream heavy stages see ~4 blocks per core —
        # block count, not batch_size, is what bounds their parallelism
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        docs = docs.repartition(max(64, cpus * 4))
    if kind in ("pdf", "html"):
        want_pdf = kind == "pdf"

        def keep_kind(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 7 == 3) if want_pdf else (ids % 7 != 3)
            return t.filter(pa.array(mask))

        docs = docs.map_batches(keep_kind, batch_format="pyarrow")
    return docs.map_batches(
        pages_from_documents_batch,
        batch_format="pyarrow",
        fn_kwargs={"with_duplicates": with_duplicates, "with_versions": with_versions,
                   "with_oversized": with_oversized,
                   "with_url_variants": with_url_variants},
    )


def prepare_pages(
    pages: ray.data.Dataset, num_partitions: int = DEFAULT_NUM_PARTITIONS
) -> ray.data.Dataset:
    return pages.map_batches(
        prepare_batch, batch_format="pyarrow", fn_kwargs={"num_partitions": num_partitions}
    )


# Bias added to the int64 warc_ts before zero-padded formatting so the
# composite survivor key sorts lexicographically == numerically for the
# FULL int64 range: an unbiased negative (pre-1970) timestamp renders as
# '-0000…', which sorts before every positive key AND orders two
# negative values by reversed magnitude. t + 2^63 maps int64 onto
# [0, 2^64), always exactly 20 digits.
_TS_BIAS = 1 << 63

# Stand-in for a NULL url inside the composite key: f-string interpolation
# of None would embed the literal string "None", which dedup_url's unpack
# then emits as a REAL url for the null-url group. "\x00" cannot be a
# crawled url, sorts before every printable url (null urls win ties at
# equal warc_ts — deterministic, documented), and decodes back to null.
_NULL_URL_KEY = "\x00"


def _survivor_key(ts_us: np.ndarray, urls: list[str]) -> list[str]:
    """Total order for picking the surviving crawl of a duplicate group:
    earliest warc_ts, then lexicographic url (null urls first)."""
    return [
        f"{int(t) + _TS_BIAS:020d}|{u if u is not None else _NULL_URL_KEY}"
        for t, u in zip(ts_us, urls)
    ]


def _make_survivor_agg():
    """Keyed survivor aggregate over dedup partials: per content_sha it
    tracks BOTH the global minimum survivor key and the number of input
    rows carrying exactly that key (the byte-identical tie count the
    per-row filter cannot resolve). One custom AggregateFnV2 does what a
    conditional Sum cannot express with built-ins: the condition
    (min_key == global min) is only known once the Min itself is global.

    The accumulator is encoded as ``"<n_at_min>:<min_key>"`` so partial
    results store in Arrow blocks between the map-side combine and the
    reduce. Survivor keys always start with a zero-padded digit, so the
    ``"0:~"`` zero-sentinel (``~`` > every key byte) loses to any real
    accumulator."""
    from ray.data.aggregate import AggregateFnV2

    class SurvivorAgg(AggregateFnV2):
        def __init__(self, alias_name: str = "surv"):
            super().__init__(
                alias_name, on=None, ignore_nulls=True, zero_factory=lambda: "0:~"
            )

        def aggregate_block(self, block) -> str:
            t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            keys = t["min_key"].to_pylist()
            n_min = t["n_min"].to_pylist()
            km = min(keys)
            na = sum(n for k, n in zip(keys, n_min) if k == km)
            return f"{na}:{km}"

        def combine(self, a: str, b: str) -> str:
            na_a, k_a = a.split(":", 1)
            na_b, k_b = b.split(":", 1)
            if k_a < k_b:
                return a
            if k_b < k_a:
                return b
            return f"{int(na_a) + int(na_b)}:{k_a}"

    return SurvivorAgg()


def _sha_partial(batch: pa.Table) -> pa.Table:
    """Vectorized dedup partial: one ~60-byte row per distinct content_sha
    in the batch — (sha, n, batch-min survivor key, rows at that key).
    Extra columns in ``batch`` are ignored."""
    ts_us = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    keys = _survivor_key(ts_us, batch["url"].to_pylist())
    df = pd.DataFrame({"content_sha": batch["content_sha"].to_pylist(), "key": keys})
    agg = (
        df.groupby("content_sha", sort=False)
        .agg(n=("key", "size"), min_key=("key", "min"))
        .reset_index()
    )
    # rows in this batch carrying the batch-local min key — combined
    # by the survivor aggregate into the GLOBAL-min tie count, which
    # detects BYTE-IDENTICAL records (same url+ts+payload)
    at_min = (
        df.merge(agg[["content_sha", "min_key"]], on="content_sha")
        .query("key == min_key")
        .groupby("content_sha", sort=False)
        .size()
        .rename("n_min")
        .reset_index()
    )
    agg = agg.merge(at_min, on="content_sha")
    # strip the pandas schema metadata: Ray's concat dedups block schemas
    # by hashing them, and the metadata dict makes that fail (warning per
    # reduce task)
    return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)


def dedup_survivor_state(slim: ray.data.Dataset) -> tuple[object, object]:
    """Pass A of exact dedup: the slim survivor aggregate, fully keyed.

    Per batch ``_sha_partial`` emits slim rows; the partials flow through
    ONE keyed aggregate — Sum(n) plus the custom survivor aggregate — so
    no per-unique-hash state ever reaches the driver. Groups are then
    filtered to actual duplicates (n > 1) BEFORE collection; only the
    multi-crawl shas (a small fraction of any real corpus) are broadcast
    via ray.put. At extreme dup fractions use ``dedup_exact_bloom`` —
    fixed-size Bloom membership broadcast plus a keyed first-wins pass
    over the hit slice; same aggregate shape.

    Returns (survivors_ref, ties_ref): ObjectRefs to the {sha -> min
    survivor key} dict and the byte-identical tie-group sha set.
    """
    return survivor_state_from_partials(
        slim.map_batches(_sha_partial, batch_format="pyarrow")
    )


def _dup_groups_ds(partials: ray.data.Dataset) -> ray.data.Dataset:
    """Reduce side of pass A: keyed aggregate over ``_sha_partial`` rows,
    filtered to actual duplicate groups (n > 1). Rows: (content_sha,
    min_key, n_at_min)."""
    agg = partials.groupby("content_sha").aggregate(
        Sum("n", alias_name="n"), _make_survivor_agg()
    )

    def dup_groups_only(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.greater(t["n"], 1))
        surv = t["surv"].to_pylist()
        n_at, keys = [], []
        for s in surv:
            na, k = s.split(":", 1)
            n_at.append(int(na))
            keys.append(k)
        return pa.table(
            {
                "content_sha": t["content_sha"],
                "min_key": pa.array(keys, pa.string()),
                "n_at_min": pa.array(n_at, pa.int64()),
            }
        )

    return agg.map_batches(dup_groups_only, batch_format="pyarrow")


def _broadcast_dup_groups(dup_groups: pd.DataFrame) -> tuple[object, object]:
    if "content_sha" in dup_groups.columns:              # empty frames lose columns
        survivors = dict(zip(dup_groups["content_sha"], dup_groups["min_key"]))
        tie_shas = set(dup_groups.loc[dup_groups["n_at_min"].gt(1), "content_sha"])
    else:
        survivors, tie_shas = {}, set()
    return ray.put(survivors), ray.put(tie_shas)


def survivor_state_from_partials(partials: ray.data.Dataset) -> tuple[object, object]:
    """Broadcast form of pass A's result: collect the duplicate groups
    and ``ray.put`` them. Callers that may face mirror-heavy corpora
    should go through ``dedup_exact``, which counts the groups first and
    flips to the Bloom strategy past ``SURVIVORS_BROADCAST_MAX``."""
    return _broadcast_dup_groups(_dup_groups_ds(partials).to_pandas())


# Per-worker-process cache of the survivor broadcast state, keyed on the
# ObjectRef: ray.get of the dict is already plasma-cached per node, but
# the pa.array value-set built from it was O(|dup-group map|) PER BATCH
# — millions of entries x thousands of batches on a mirror-heavy crawl.
# Bounded at a handful of entries (a worker only ever sees one or two
# dedup states at a time).
_SURVIVOR_CACHE: dict = {}


def _cached_survivor_state(survivors_ref: object, ties_ref: object):
    key = survivors_ref.hex()
    hit = _SURVIVOR_CACHE.get(key)
    if hit is None:
        survivors = ray.get(survivors_ref)
        hit = (
            survivors,
            ray.get(ties_ref),
            pa.array(list(survivors), pa.string()),
        )
        if len(_SURVIVOR_CACHE) >= 4:
            _SURVIVOR_CACHE.clear()
        _SURVIVOR_CACHE[key] = hit
    return hit


def dedup_apply(
    prepared: ray.data.Dataset, survivors_ref: object, ties_ref: object
) -> ray.data.Dataset:
    """Pass B of exact dedup: the broadcast survivor filter (+ tie-group
    resolution) applied to the payload-bearing rows. Safe to apply to any
    SUBSET of the corpus the state was computed over (checkpoint waves):
    the survivor map is global, and a tie group's byte-identical rows
    share a url, hence a part_id, hence a wave."""

    def keep_survivors(batch: pa.Table) -> pa.Table:
        survivors, ties, value_set = _cached_survivor_state(
            survivors_ref, ties_ref
        )
        if not survivors:
            return batch
        # vectorized: only rows whose sha is in a duplicate group need the
        # survivor-key comparison; everything else streams through untouched
        in_dup = pa.compute.is_in(
            batch["content_sha"], value_set=value_set
        ).to_numpy(zero_copy_only=False)
        if not in_dup.any():
            return batch
        mask = np.ones(len(in_dup), dtype=bool)
        idx = np.nonzero(in_dup)[0]
        ts_us = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        urls = batch["url"].take(pa.array(idx)).to_pylist()
        shas = batch["content_sha"].take(pa.array(idx)).to_pylist()
        for i, u, s in zip(idx, urls, shas):
            # tie groups are excluded here and resolved by the keyed pass;
            # the key expression must match _survivor_key exactly (incl.
            # the null-url stand-in)
            if u is None:
                u = _NULL_URL_KEY
            mask[i] = (
                s not in ties
                and survivors[s] == f"{int(ts_us[i]) + _TS_BIAS:020d}|{u}"
            )
        return batch.filter(pa.array(mask, pa.bool_()))

    out = prepared.map_batches(keep_survivors, batch_format="pyarrow")
    if ray.get(ties_ref):
        # byte-identical records are indistinguishable row-by-row; a tiny
        # keyed first-wins pass (only the tie groups shuffle) picks one

        def only_ties(batch: pa.Table) -> pa.Table:
            ties = ray.get(ties_ref)
            mask = [s in ties for s in batch["content_sha"].to_pylist()]
            return batch.filter(pa.array(mask, pa.bool_()))

        resolved = (
            prepared.map_batches(only_ties, batch_format="pyarrow")
            .groupby("content_sha")
            .map_groups(_first_row_arrow, batch_format="pandas")
        )
        out = out.union(resolved)
    return out


# Auto-flip bound for the exact-dedup survivor broadcast: above this many
# duplicate GROUPS the {sha -> survivor key} dict stops being a sane
# broadcast (5M groups x ~110 bytes ~ 0.5 GB per worker heap) and
# ``dedup_exact`` switches to the fixed-size Bloom strategy. Far-side
# equality test forces the bound to 0 (test_pipeline_e2e).
SURVIVORS_BROADCAST_MAX = 5_000_000


def _first_row_arrow(group: "pd.DataFrame") -> pa.Table:
    """First-wins pick for a tie/bloom-candidate group, emitted as an
    ARROW block in the exact prepared-page schema. Both dedup resolvers
    union this stream back into an Arrow passthrough branch; a pandas
    return would give the union a PandasBlockSchema bundle alongside the
    Arrow ones (one executor schema-divergence warning per run) and
    from_pandas inference alone could type an all-null html group as
    `null`, so the cast goes through PREPARED_PAGE_SCHEMA explicitly."""
    from ebook_ocr_ray.stages.extract import PREPARED_PAGE_SCHEMA

    head = group.sort_values(["warc_ts", "url"], kind="mergesort").head(1)
    return pa.Table.from_pandas(
        head, schema=PREPARED_PAGE_SCHEMA, preserve_index=False
    )


def dedup_exact(
    prepared: ray.data.Dataset,
    slim: ray.data.Dataset | None = None,
    broadcast_max: int = SURVIVORS_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Keep one row per payload hash — the earliest crawl (warc_ts, url as
    the deterministic tiebreak). Exact-hash analog of the reference's
    sequential frame dedup (src/preprocessing/deduplicate.py:9-66).

    Scale design: duplicate rows are NEVER shuffled, and no per-unique-
    hash state touches the driver. Pass A runs the keyed survivor
    aggregate over a slim projection and materializes ONLY the duplicate
    groups (a small fraction of any real corpus, distributed in the
    object store); pass B filters each payload row locally against the
    broadcast duplicate-group map, with byte-identical tie groups routed
    through a tiny keyed first-wins pass. Past ``broadcast_max``
    duplicate groups the broadcast dict would itself be corpus-sized
    (mirror-heavy crawls), so the apply flips to the Bloom strategy
    (``dedup_exact_bloom``'s split + keyed first-wins, reusing pass A's
    materialized groups for the filter build) — same survivors, only the
    worker-memory / shuffle-volume trade moves.

    ``slim`` optionally supplies a second instance of the prepared dataset
    for the counting pass (each Dataset executes once; re-reading slim
    columns is cheaper than shuffling payloads). Only (content_sha,
    warc_ts, url) are read from it.
    """
    src = slim if slim is not None else prepared
    partials = src.select_columns(["content_sha", "warc_ts", "url"]).map_batches(
        _sha_partial, batch_format="pyarrow"
    )
    dup_groups = _dup_groups_ds(partials).materialize()
    n_groups = dup_groups.count()
    if n_groups <= broadcast_max:
        return dedup_apply(
            prepared, *_broadcast_dup_groups(dup_groups.to_pandas())
        )
    logger.info(
        "dedup_exact: %d duplicate groups > SURVIVORS_BROADCAST_MAX=%d, "
        "flipping to the Bloom strategy",
        n_groups,
        broadcast_max,
    )
    bloom_ref = ray.put(
        _bloom_from_shas(dup_groups.select_columns(["content_sha"]), n_groups)
    )
    return _bloom_split_apply(prepared, bloom_ref)


def dedup_exact_bloom(
    prepared: ray.data.Dataset,
    slim: ray.data.Dataset | None = None,
    fp_rate: float = 0.01,
) -> ray.data.Dataset:
    """Exact dedup for EXTREME duplicate fractions (mirror-heavy crawls),
    where even the duplicate-group dict is too large to broadcast: the
    bounded-memory variant the broadcast path's docstrings promise.

    Pass A runs the same keyed survivor aggregate, but the duplicate-
    group stream is folded into a fixed-size Bloom filter on the driver
    (memory = the bitset, regardless of how many duplicate groups exist)
    instead of a dict. Pass B: rows failing the Bloom membership test —
    the vast unique majority — stream through untouched; rows hitting it
    (every duplicate plus ~fp_rate of uniques) shuffle through ONE keyed
    first-wins groupby that restores exactness: false positives arrive
    as singleton groups and survive unchanged, real duplicate groups
    (byte-identical ties included) keep their earliest (warc_ts, url)
    row. Semantics are identical to ``dedup_exact``; only the worker
    memory / shuffle-volume trade moves.
    """
    src = slim if slim is not None else prepared

    def sha_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"content_sha": batch["content_sha"].to_pylist()})
        agg = df.groupby("content_sha", sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    dup_shas = (
        src.select_columns(["content_sha"])
        .map_batches(sha_counts, batch_format="pyarrow")
        .groupby("content_sha")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.filter(pa.compute.greater(t["n"], 1)).select(["content_sha"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    bloom_ref = ray.put(
        _bloom_from_shas(dup_shas, dup_shas.count(), fp_rate=fp_rate)
    )
    return _bloom_split_apply(prepared, bloom_ref)


def _bloom_from_shas(
    shas: ray.data.Dataset, n_items: int, fp_rate: float = 0.01
):
    """Distributed Bloom build: per-block partial bitsets OR-reduced in a
    task tree. Raw Ray tasks on purpose — the Dataset API has no ndarray
    fold, and the single-threaded driver loop this replaces was the last
    serial step of the bloom path. Peak memory anywhere = one bitset x
    fan-in; blocks are consumed from the already-materialized dup-sha
    dataset without re-executing it."""
    from ebook_ocr_ray.functions.bloom import BloomFilter

    proto = BloomFilter.sized(max(1, n_items), fp_rate)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes

    @ray.remote
    def build_partial(*blocks) -> np.ndarray:
        b = BloomFilter(n_bits, n_hashes)
        for t in blocks:
            tt = t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
            b.add_hex(tt["content_sha"].to_pylist())
        return b.bits

    @ray.remote
    def or_reduce(*bitsets: np.ndarray) -> np.ndarray:
        out = bitsets[0].copy()
        for b in bitsets[1:]:
            out |= b
        return out

    refs = shas.to_arrow_refs()
    fan = 8
    if not refs:
        return proto
    parts = [
        build_partial.remote(*refs[i : i + fan]) for i in range(0, len(refs), fan)
    ]
    while len(parts) > 1:
        parts = [
            or_reduce.remote(*parts[i : i + fan]) for i in range(0, len(parts), fan)
        ]
    bloom = BloomFilter(n_bits, n_hashes)
    bloom.bits = ray.get(parts[0])
    return bloom


def _bloom_split_apply(
    prepared: ray.data.Dataset, bloom_ref: object
) -> ray.data.Dataset:
    """Apply side of the Bloom strategy: misses stream through untouched;
    hits (every duplicate + ~fp_rate of uniques) go through ONE keyed
    first-wins groupby that restores exactness."""

    def split(keep_candidates: bool):
        def fn(batch: pa.Table) -> pa.Table:
            b = ray.get(bloom_ref)
            hits = b.might_contain_hex(batch["content_sha"].to_pylist())
            mask = hits if keep_candidates else ~hits
            return batch.filter(pa.array(mask, pa.bool_()))

        return fn

    passthrough = prepared.map_batches(split(False), batch_format="pyarrow")
    resolved = (
        prepared.map_batches(split(True), batch_format="pyarrow")
        .groupby("content_sha")
        .map_groups(_first_row_arrow, batch_format="pandas")
    )
    return passthrough.union(resolved)


def verify_against_golden(
    extracted: ray.data.Dataset, golden_path: str, num_partitions: int = 8
) -> pd.DataFrame:
    """Golden-fixture verification join (SURVEY.md J7): FULL-OUTER
    hash-join the extracted corpus to a golden parquet on url and return
    the mismatch rows (url, extracted_text, golden_text). Rows present on
    only one side surface with a null partner — a document silently
    dropped by the pipeline (or an unexpected extra) is a mismatch, not a
    silent pass. Empty frame = byte-identity holds corpus-wide. The join
    shuffles slim (url, text) rows only."""
    golden = read_parquet_clean(golden_path).map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "golden_text": t["extracted_text"].cast(pa.large_string()),
            }
        ),
        batch_format="pyarrow",
    )
    slim = extracted.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "extracted_text": t["extracted_text"].cast(pa.large_string()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = slim.join(
        golden, join_type="full_outer", num_partitions=num_partitions, on=("url",)
    )

    def keep_mismatches(t: pa.Table) -> pa.Table:
        # null-side rows (url only in one table) are mismatches too:
        # pa.compute.equal yields null there, so keep everything that is
        # not POSITIVELY equal
        eq = pa.compute.equal(t["extracted_text"], t["golden_text"])
        return t.filter(pa.compute.invert(pa.compute.fill_null(eq, False)))

    return joined.map_batches(keep_mismatches, batch_format="pyarrow").to_pandas()


def sequence_dedup(
    prepared: ray.data.Dataset, hamming_threshold: int = 0
) -> ray.data.Dataset:
    """Ordered near-dup scan WITHIN each url's crawl history: versions are
    visited in warc_ts order and a version is dropped when its distance to
    the previous KEPT version is within threshold — the direct analog of
    the reference's sequential frame dedup against the last-kept phash
    (src/preprocessing/deduplicate.py:49-62).

    threshold 0 = exact (content hash equality); > 0 = simhash hamming
    over the text column. The scan never crosses a url, so at scale it
    piggybacks on the url-hash partitioning — the groupby shuffle
    co-locates each url's (few) versions, and the fold is group-local.
    """
    from ebook_ocr_ray.functions.sketches import hamming64, simhash64

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["warc_ts", "content_sha"], kind="mergesort")
        keep: list[bool] = []
        last_sha: str | None = None
        last_print: int | None = None
        for sha, text in zip(g["content_sha"], g["text"]):
            if hamming_threshold == 0:
                is_dup = sha == last_sha
            else:
                ph = simhash64(text or "")
                is_dup = last_print is not None and hamming64(ph, last_print) <= hamming_threshold
            keep.append(not is_dup)
            if not is_dup:
                last_sha = sha
                if hamming_threshold > 0:
                    last_print = ph
        return g[pd.Series(keep, index=g.index)]

    return prepared.groupby("url").map_groups(scan, batch_format="pandas")


def extract_skew_split(
    pages: ray.data.Dataset,
    cfg: ExtractionConfig | None = None,
) -> ray.data.Dataset:
    """Skew-aware extraction (north-rule oversized-blob clause): rows whose
    payload exceeds OVERSIZE_BLOB_BYTES run through their OWN extraction
    stage with batch_size=1 — one giant document per task, so a multi-MB
    page can never stall a task full of ordinary rows. Documents are never
    split; only the task layout changes (SURVEY.md §7.4).

    ``pages`` should be materialized (or a re-readable source): both
    branches consume it.
    """
    from ebook_ocr_ray.config import OVERSIZE_BLOB_BYTES

    def _size_filter(keep_big: bool):
        def fn(t: pa.Table) -> pa.Table:
            sizes = t["payload_bytes"].to_numpy(zero_copy_only=False)
            mask = sizes > OVERSIZE_BLOB_BYTES if keep_big else sizes <= OVERSIZE_BLOB_BYTES
            return t.filter(pa.array(mask))

        return fn

    fn = DocumentExtractor(cfg or ExtractionConfig())
    normal = pages.map_batches(_size_filter(False), batch_format="pyarrow").map_batches(
        fn, batch_format="pyarrow", batch_size=EXTRACT_BATCH_SIZE
    )
    big = pages.map_batches(_size_filter(True), batch_format="pyarrow").map_batches(
        fn, batch_format="pyarrow", batch_size=1
    )
    return normal.union(big)


def extract(
    pages: ray.data.Dataset,
    cfg: ExtractionConfig | None = None,
    use_actors: bool = False,
) -> ray.data.Dataset:
    """The ensemble extraction stage.

    Default is a stateless task pool shipping ONE DocumentExtractor
    instance through the object store: this engine's extractor state is a
    compiled ruleset (regexes + config), cheap to broadcast, and measured
    ~2x faster end-to-end than an actor pool here because actor processes
    pay a per-execution spawn+import cost that tasks (reusing warm
    workers) do not. ``use_actors=True`` switches to a fixed-size actor
    pool — the right mode when __init__ loads genuinely heavy state (an ML
    model, a large index): fixed size, not autoscaling, which was measured
    ~2.5x slower to reach steady state."""
    if use_actors:
        return pages.map_batches(
            DocumentExtractor,
            fn_constructor_kwargs={"cfg": cfg or ExtractionConfig()},
            batch_format="pyarrow",
            batch_size=EXTRACT_BATCH_SIZE,
            concurrency=_extract_pool_size(),
            num_cpus=1,
        )
    return pages.map_batches(
        DocumentExtractor(cfg or ExtractionConfig()),
        batch_format="pyarrow",
        batch_size=EXTRACT_BATCH_SIZE,
    )


def corpus_metrics(extracted: ray.data.Dataset) -> pd.DataFrame:
    """Global pipeline metrics in one row (the reference's per-run console
    stats — ensemble.py:283-285, cli.py:269-272 — as a table): doc/kind/
    error counts, total voted lines. Partial counts per batch, then one
    tiny global aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        kinds = batch["doc_kind"].to_pylist()
        errors = batch["error"].to_pylist()
        n_lines = batch["n_lines"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_docs": pa.array([len(kinds)], pa.int64()),
                "n_html": pa.array([sum(k == "html" for k in kinds)], pa.int64()),
                "n_pdf": pa.array([sum(k == "pdf" for k in kinds)], pa.int64()),
                "n_errors": pa.array([sum(e is not None for e in errors)], pa.int64()),
                "total_lines": pa.array([int(n_lines.sum())], pa.int64()),
            }
        )

    partials = extracted.map_batches(partial, batch_format="pyarrow")
    totals = partials.aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_html", alias_name="n_html"),
        Sum("n_pdf", alias_name="n_pdf"),
        Sum("n_errors", alias_name="n_errors"),
        Sum("total_lines", alias_name="total_lines"),
    )
    return pd.DataFrame([totals]).astype("int64")


def lineage(extracted: ray.data.Dataset, key: str = "site") -> ray.data.Dataset:
    """Per-site lineage/metrics: doc & byte & char counts. Partial
    aggregation inside map_batches first, so the shuffle moves one row per
    (site, batch) instead of one per document (the combiner pattern —
    SURVEY.md G6)."""

    def partial(batch: pa.Table) -> pa.Table:
        tdf = pd.DataFrame(
            {
                # str() so the partial schema is static across key choices
                # (site is a string; part_id arrives as int64 or, read back
                # from a hive layout, as string — checkpoint casts after)
                "k": [str(v) for v in batch[key].to_pylist()],
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
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    from ebook_ocr_ray.groups import typed_keyed_sum

    partials = extracted.map_batches(partial, batch_format="pyarrow")
    # sites-per-corpus is low at bench scale — the typed hash reduce never
    # emits the untyped empty bundles the sort aggregate would; at web
    # scale (~1e8 sites) raise num_partitions with the site count
    return typed_keyed_sum(
        partials,
        [key],
        ["doc_count", "byte_count", "char_count"],
        pa.schema(
            [
                (key, pa.string()),
                ("doc_count", pa.int64()),
                ("byte_count", pa.int64()),
                ("char_count", pa.int64()),
            ]
        ),
        num_partitions=4,
    )


def consolidate_books(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document consolidation (reference step 5, src/consolidate.py:
    53-91): every url's article parts (the ``#aK`` derived keys produced
    by the 1->N spread split) concatenate IN ORDER into one book artifact,
    with a ``--- {part} ---`` page marker before each part:

    - ``book_txt``: plain ordered concat with markers;
    - ``book_md``: same, but any line byte-equal to one of the part's
      extracted headings is wrapped as ``\\n## {heading}\\n`` (the
      headings.json membership check, ROVEROutput.get_all_headings).

    Scale shape: groupby on the base url co-locates each document's few
    parts; the fold is group-local and ordered, exactly like
    ``sequence_dedup`` — no global sort, no driver state."""

    part_num = re.compile(r"^a(\d+)$")

    def add_base(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        bases, parts, ords = [], [], []
        for u in urls:
            base, _, frag = u.partition("#")
            bases.append(base)
            parts.append(frag or base)
            # numeric part index: '#a10' must follow '#a2', so ordering
            # cannot be the lexicographic url sort (10+-part documents)
            m = part_num.match(frag)
            ords.append(int(m.group(1)) if m else 0)
        return pa.table(
            {
                "base_url": pa.array(bases, pa.string()),
                "part": pa.array(parts, pa.string()),
                "part_ord": pa.array(ords, pa.int64()),
                "url": batch["url"],
                "extracted_text": batch["extracted_text"],
                "headings": batch["headings"],
            }
        )

    def build(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["part_ord", "url"], kind="mergesort")
        txt_parts: list[str] = []
        md_parts: list[str] = []
        for part, text, headings in zip(g["part"], g["extracted_text"], g["headings"]):
            marker = f"\n--- {part} ---\n\n"
            txt_parts.append(marker + text + "\n\n")
            heads = set(headings) if headings is not None else set()
            if heads:
                lines = [
                    f"\n## {ln.strip()}\n" if ln.strip() in heads else ln
                    for ln in text.split("\n")
                ]
                text = "\n".join(lines)
            md_parts.append(marker + text + "\n\n")
        return pd.DataFrame(
            {
                "url": [g["base_url"].iloc[0]],
                "book_txt": ["".join(txt_parts)],
                "book_md": ["".join(md_parts)],
                "n_pages": pd.array([len(g)], dtype="int64"),
            }
        )

    slim = extracted.map_batches(add_base, batch_format="pyarrow")
    return slim.groupby("base_url").map_groups(build, batch_format="pandas")


def extraction_pipeline(
    sf_dir: str,
    with_duplicates: bool = False,
    dedup: bool = True,
    cfg: ExtractionConfig | None = None,
    repeat: int = 1,
    kind: str | None = None,
    spool_dir: str | None = None,
) -> ray.data.Dataset:
    """documents -> pages -> prepare -> (dedup) -> extract.

    Dedup needs two passes over the prepared pages (slim survivor
    aggregate, then the filtered main pass). Two modes:

    - ``spool_dir=None`` (re-read): each pass is its OWN lazy dataset
      from the re-readable source — nothing is materialized, the
      payload-bearing corpus never sits in the object store whole, and
      input IO simply happens twice. Right when the input is cheap
      columnar storage and scratch space is scarce.
    - ``spool_dir=<scratch path>`` (spool): synthesis + prepare runs
      ONCE and the prepared corpus streams into a scratch parquet (the
      checkpoint-wave layout's economy — work persisted, not recomputed;
      reference analog src/layout/detector.py:168-205). Pass A is then a
      COLUMN-PRUNED read of just (content_sha, warc_ts, url) — on a
      columnar layout that touches a few % of the bytes — and pass B
      reads the full rows. Right when producing the prepared rows is
      expensive (WARC decompression, payload sniffing/hashing over
      remote IO): at 100 TB the spool costs one full local-scratch
      write but saves an entire decode pass. The caller owns the
      scratch directory's lifetime (the returned Dataset reads from it
      lazily — delete only after consumption).

    Either way extraction happens once, on survivors only — the part
    that dominates at any scale.
    """

    def prepared_factory() -> ray.data.Dataset:
        return prepare_pages(
            pages_dataset(
                sf_dir, with_duplicates=with_duplicates, repeat=repeat, kind=kind
            )
        )

    if dedup and spool_dir is not None:
        # one shared guard (state/spool.py): refuses dirty dirs AND
        # arbitrates concurrent claimers atomically — write_parquet
        # appends (Ray 2.49 SaveMode.APPEND), so either would silently
        # double the corpus and make every page a byte-identical dup
        from ebook_ocr_ray.state.spool import claim_spool_target, release_spool_claim

        claim_spool_target(spool_dir)
        prepared_factory().write_parquet(spool_dir)
        release_spool_claim(spool_dir)
        slim = read_parquet_clean(
            spool_dir, columns=["content_sha", "warc_ts", "url"]
        )
        full = read_parquet_clean(spool_dir)
        return extract(dedup_exact(full, slim=slim), cfg)

    prepared = prepared_factory()
    if dedup:
        prepared = dedup_exact(prepared, slim=prepared_factory())
    return extract(prepared, cfg)


def outlinks(sf_dir: str) -> ray.data.Dataset:
    """(url, link_idx, href, anchor_text) for every html page — the
    link-graph extraction step of a web corpus pipeline (outlink tables
    feed template dedup, site graphs, and frontier logic). 1->N per-batch
    flat map over the synthesized pages; the ``kind`` filter prunes PDF
    rows before their payloads are even synthesized."""
    pages = pages_dataset(sf_dir, kind="html")

    def links_batch(batch: pa.Table) -> pa.Table:
        from ebook_ocr_ray.functions.links import extract_links

        urls, idxs, hrefs, texts = [], [], [], []
        for url, payload in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            for i, (href, text) in enumerate(
                extract_links(payload.decode("utf-8", errors="replace"))
            ):
                urls.append(url)
                idxs.append(i)
                hrefs.append(href)
                texts.append(text)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "link_idx": pa.array(idxs, pa.int64()),
                "href": pa.array(hrefs, pa.string()),
                "anchor_text": pa.array(texts, pa.string()),
            }
        )

    return pages.map_batches(links_batch, batch_format="pyarrow")


# --- canonical-URL dedup ----------------------------------------------------

# The normalization rewrites, applied in order. Shared verbatim (as
# regex/replacement strings) with the SQL oracle so Python and DuckDB can
# never drift: lowercase first, then ONE greedy strip of any interleaved
# scheme/www. prefix chain, then query + fragment, then trailing slashes.
# The combined `(https?://|www\.)+` prefix pattern (not two separate
# anchored strips) is what makes the form IDEMPOTENT — two sequential
# strips would leave 'https://x' behind on inputs like
# 'https://www.https://x', and 'www.www.host' would change keys when
# re-normalized (property-tested in test_property.py).
URL_NORM_REWRITES: tuple[tuple[str, str], ...] = (
    (r"^(https?://|www\.)+", ""),
    ("[?#].*$", ""),
    ("/+$", ""),
)


def normalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Vectorized canonical form of a crawl URL column (lowercase, no
    scheme, no leading www., no query/fragment, no trailing slash) —
    pyarrow.compute kernels only, no per-row Python."""
    import pyarrow.compute as pc

    u = pc.utf8_lower(urls)
    for pat, rep in URL_NORM_REWRITES:
        u = pc.replace_substring_regex(u, pattern=pat, replacement=rep)
    return u


def dedup_url(
    pages: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """Canonical-URL dedup over the pages table: crawls whose URLs
    normalize to the same canonical form (scheme/case/www./tracking-query/
    trailing-slash variants of one page) collapse to their earliest crawl.
    The Common-Crawl-side complement of content dedup — a page recrawled
    under `?utm_source=...` has a distinct payload timestamp but is the
    same document, and URL canonicalization catches it without hashing
    the payload at all.

        pages (url, warc_ts)                 # column-pruned: payload never read
          -> map_batches(normalize + batch combine)   # slim partial rows
          -> hash-partition on surrogate key -> per-partition min/count
          -> (url_norm, url, warc_ts, n_crawls)       # survivor = earliest crawl

    Scale shape: the shuffle carries one ~80-byte row per distinct
    url_norm per input block (pre-combined inside map_batches), never the
    payload; the reduce is map_partitions_typed (sentinel-backed, typed
    empties, no sort). Survivor order is total: (warc_ts, url) lexicographic
    on a zero-padded composite key, the same rule as exact content dedup
    (_survivor_key). url_norm cardinality is ~corpus-sized, so size
    ``num_partitions`` to the cluster at scale (the default suits the
    bench corpora; each partition holds its slice's url_norms in one
    pandas frame)."""
    from ebook_ocr_ray.functions.textstats import stable_hash63, stable_hash64
    from ebook_ocr_ray.groups import map_partitions_typed

    slim = pages.select_columns(["url", "warc_ts"])

    def norm_partial(t: pa.Table) -> pa.Table:
        norm = normalize_urls(t["url"])
        ts_us = t["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = _survivor_key(ts_us, t["url"].to_pylist())
        df = pd.DataFrame(
            {"url_norm": norm.to_pandas(), "key": keys}
        )
        # dropna=False: a null url (hence null url_norm) must form a
        # group like SQL GROUP BY does, not silently vanish
        agg = (
            df.groupby("url_norm", sort=False, dropna=False)
            .agg(n_crawls=("key", "size"), min_key=("key", "min"))
            .reset_index()
        )
        skeys = [
            stable_hash63(u if isinstance(u, str) else "\x00url-norm-null")
            for u in agg["url_norm"]
        ]
        # explicit types: from_pandas infers `null` for empty object
        # columns, which re-creates the schema-mismatch bundles that
        # groups.py exists to eliminate
        return pa.table(
            {
                "url_norm": pa.array(agg["url_norm"], pa.string()),
                "n_crawls": pa.array(agg["n_crawls"].astype("int64"), pa.int64()),
                "min_key": pa.array(agg["min_key"], pa.string()),
                "skey": pa.array(skeys, pa.int64()),
            }
        )

    partial_schema = pa.schema(
        [
            ("url_norm", pa.string()),
            ("n_crawls", pa.int64()),
            ("min_key", pa.string()),
            ("skey", pa.int64()),
        ]
    )

    def reduce_fn(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("url_norm", sort=False, dropna=False)
            .agg(n_crawls=("n_crawls", "sum"), min_key=("min_key", "min"))
            .reset_index()
        )
        out["n_crawls"] = out["n_crawls"].astype("int64")
        return out

    def empty_fn() -> pa.Table:
        return pa.schema(
            [
                ("url_norm", pa.string()),
                ("n_crawls", pa.int64()),
                ("min_key", pa.string()),
            ]
        ).empty_table()

    reduced = map_partitions_typed(
        slim.map_batches(norm_partial, batch_format="pyarrow"),
        "skey",
        reduce_fn,
        schema=partial_schema,
        empty_fn=empty_fn,
        num_partitions=num_partitions,
    )

    def unpack(t: pa.Table) -> pa.Table:
        keys = t["min_key"].to_pylist()
        ts = [int(k.split("|", 1)[0]) - _TS_BIAS for k in keys]
        urls = [
            None if (tail := k.split("|", 1)[1]) == _NULL_URL_KEY else tail
            for k in keys
        ]
        return pa.table(
            {
                "url_norm": t["url_norm"],
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "n_crawls": t["n_crawls"],
            }
        )

    return reduced.map_batches(unpack, batch_format="pyarrow")


# --- crawl-snapshot diff ------------------------------------------------------

def snapshot_pages(sf_dir: str, which: str) -> ray.data.Dataset:
    """One of the two deterministic crawl snapshots (sources/pages.py
    snapshot_pages_batch) as a pages Dataset."""
    from ebook_ocr_ray.sources.pages import snapshot_pages_batch

    return load_documents(sf_dir).map_batches(
        snapshot_pages_batch, batch_format="pyarrow", fn_kwargs={"which": which}
    )


def crawl_delta(
    pages_a: ray.data.Dataset,
    pages_b: ray.data.Dataset,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-url status across two crawl snapshots — added / removed /
    changed / same — the CDX-style snapshot diff that drives incremental
    recrawl pipelines (extract only what changed, retire what vanished).

        each snapshot -> map_batches: (url, md5(payload))   # slim, map-side
          -> ONE full-outer hash join on url
          -> status from hash null-ness / equality          # vectorized

    The payload is hashed where it is read and never enters the shuffle;
    the join moves two ~70-byte rows per url. Content equality is exactly
    payload-byte equality (payload_sha — the same function exact dedup
    keys on)."""
    from ebook_ocr_ray.stages.extract import payload_sha

    def slim(tag: str):
        def fn(t: pa.Table) -> pa.Table:
            shas = payload_sha(t["html"].to_pylist())
            return pa.table(
                {"url": t["url"], f"sha_{tag}": pa.array(shas, pa.string())}
            )

        return fn

    a = pages_a.map_batches(slim("a"), batch_format="pyarrow")
    b = pages_b.map_batches(slim("b"), batch_format="pyarrow")
    joined = a.join(
        b, join_type="full_outer", num_partitions=num_partitions, on=("url",)
    )

    def status(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sa, sb = t["sha_a"], t["sha_b"]
        eq = pc.fill_null(pc.equal(sa, sb), False)
        out = pc.if_else(
            pc.is_null(sa),
            pa.scalar("added"),
            pc.if_else(
                pc.is_null(sb),
                pa.scalar("removed"),
                pc.if_else(eq, pa.scalar("same"), pa.scalar("changed")),
            ),
        )
        return pa.table({"url": t["url"], "status": out})

    return joined.map_batches(status, batch_format="pyarrow")


def crawl_history(
    pages: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """Per-url crawl index (the CDX index-build step): how many crawls a
    url has, how many DISTINCT payloads they carried, and the first/last
    crawl timestamps — the table a recrawl scheduler and an incremental
    extractor both key on.

        pages (url, warc_ts, html)
          -> map_batches: (url, sha, n, min_ts, max_ts)   # payload hashed
             map-side (payload_sha, the exact-dedup key), combined per
             (url, sha) inside the batch
          -> hash-partition on url surrogate key
          -> per-partition: n_crawls = sum, n_payloads = distinct sha,
             first_ts/last_ts = min/max

    The shuffle carries one slim row per distinct (url, payload) per
    input block — bounded by the url's revision count, never the payload
    bytes."""
    from ebook_ocr_ray.functions.textstats import stable_hash63, stable_hash64
    from ebook_ocr_ray.groups import map_partitions_typed
    from ebook_ocr_ray.stages.extract import payload_sha

    def partial(t: pa.Table) -> pa.Table:
        shas = payload_sha(t["html"].to_pylist())
        ts_us = t["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"url": t["url"].to_pylist(), "sha": shas, "ts": ts_us}
        )
        # dropna=False: null-url rows keep their group (SQL GROUP BY
        # semantics) instead of silently vanishing from the index
        agg = (
            df.groupby(["url", "sha"], sort=False, dropna=False)
            .agg(n=("ts", "size"), min_ts=("ts", "min"), max_ts=("ts", "max"))
            .reset_index()
        )
        skeys = [
            stable_hash63(u if isinstance(u, str) else "\x00url-null")
            for u in agg["url"]
        ]
        return pa.table(
            {
                "url": pa.array(agg["url"], pa.string()),
                "sha": pa.array(agg["sha"], pa.string()),
                "n": pa.array(agg["n"].astype("int64"), pa.int64()),
                "min_ts": pa.array(agg["min_ts"].astype("int64"), pa.int64()),
                "max_ts": pa.array(agg["max_ts"].astype("int64"), pa.int64()),
                "skey": pa.array(skeys, pa.int64()),
            }
        )

    def reduce_fn(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("url", sort=False, dropna=False)
            .agg(
                n_crawls=("n", "sum"),
                n_payloads=("sha", "nunique"),
                first_ts=("min_ts", "min"),
                last_ts=("max_ts", "max"),
            )
            .reset_index()
        )
        for c in ("n_crawls", "n_payloads", "first_ts", "last_ts"):
            out[c] = out[c].astype("int64")
        return out

    schema = pa.schema(
        [("url", pa.string()), ("sha", pa.string()), ("n", pa.int64()),
         ("min_ts", pa.int64()), ("max_ts", pa.int64()), ("skey", pa.int64())]
    )
    reduced = map_partitions_typed(
        pages.select_columns(["url", "warc_ts", "html"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "skey",
        reduce_fn,
        schema=schema,
        empty_fn=lambda: pa.schema(
            [("url", pa.string()), ("n_crawls", pa.int64()),
             ("n_payloads", pa.int64()), ("first_ts", pa.int64()),
             ("last_ts", pa.int64())]
        ).empty_table(),
        num_partitions=num_partitions,
    )

    def cast_ts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "n_crawls": t["n_crawls"],
                "n_payloads": t["n_payloads"],
                "first_ts": t["first_ts"].cast(pa.timestamp("us")),
                "last_ts": t["last_ts"].cast(pa.timestamp("us")),
            }
        )

    return reduced.map_batches(cast_ts, batch_format="pyarrow")
