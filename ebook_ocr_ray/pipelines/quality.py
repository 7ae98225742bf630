"""CCNet-style corpus quality bucketing (Wenzek et al. 2020): train a
per-language character LM on the corpus itself, score every document by
cross-entropy under its language's model, and split each language into
head / middle / tail perplexity buckets at the 1/3 and 2/3 quantiles —
the standard web-corpus quality-tiering step (the real CCNet uses a
5-gram KenLM trained on Wikipedia; this engine's analog is a char-bigram
add-one model trained in-corpus, which keeps the whole operator
closed-form and oracle-checkable while exercising the identical
two-pass broadcast-model shape).

Frozen semantics (mirrored exactly by the SQL oracle):

  * model: for each (lang, bigram) with occurrence count c, language
    total T and GLOBAL distinct-bigram vocabulary V,
        lp(lang, g) = int_half_even(-ln((c + 1) / (T + V)) * 1e6)
    — integer micro-nats. This quantization is the ONLY floating-point
    step in the operator: everything downstream is exact int64
    arithmetic, so Python/DuckDB float-summation order can never flip a
    bucket (the one residual risk is a single model entry's -ln landing
    within one ulp of a .5 micro-nat boundary — measure-zero per entry,
    and the model carries at most QUALITY_LM_VOCAB_CAP x langs entries,
    not one per document),
  * vocabulary cap: per lang only the QUALITY_LM_VOCAB_CAP most frequent
    bigrams (rank: count DESC, bigram ASC) become model entries; a
    bigram past the cap scores at the language's add-one default
    lp(lang, unseen) = int_half_even(-ln(1 / (T + V)) * 1e6). T and V
    are computed over the FULL pre-cap counts, so kept entries'
    probabilities are unchanged by the cap — the cap only moves the
    long tail onto the default slot (SQL mirror: QUALIFY row_number()
    OVER (PARTITION BY lang ORDER BY c DESC, g) <= cap, LEFT JOIN +
    coalesce(lp, default)),
  * document score: ce_micro = sum(lp over the doc's bigram
    OCCURRENCES) // n_bigrams (integer floor; 0 when the text is
    shorter than 2 chars),
  * thresholds: per lang, over ce_milli = ce_micro // 1000,
        t1 = quantile_disc(1/3),  t2 = quantile_disc(2/3)
    (sorted[ceil(q*n)-1], the codebase's token_quantiles convention);
    milli-nat resolution bounds the threshold histogram at ~20k rows
    per language REGARDLESS of corpus size,
  * bucket: ce_milli <= t1 -> 'head', <= t2 -> 'middle', else 'tail'.

Scale shape (the point of the operator):

    pass 1  per-batch bigram partial counts -> keyed sum
            -> top-cap-per-lang model selection (on the driver while the
               count table is small, keyed/distributed past
               MODEL_DRIVER_MAX rows — same results, far-side tested)
            -> model table bounded by cap x langs, corpus-size- AND
               charset-size-INDEPENDENT -> ray.put broadcast
    pass 2  score every doc against the broadcast model (slim int rows,
            materialized once — the neardup slim-row trade)
    pass 3  (lang, ce_milli) histogram -> keyed sum -> thresholds on
            the driver (bounded by langs x milli-nat range) -> broadcast
    pass 4  bucket attach, streaming
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean

CE_QUANT = 1_000_000  # micro-nats
_NULL_LANG = "\x00lang-null"   # threshold-table key for null-lang rows

# Per-language cap on broadcast model entries. Latin-charset web text
# (~10k observed bigrams per lang) never reaches it; CJK-scale charsets
# (20k+ code points -> millions of observed bigrams) would otherwise
# materialize a whole-corpus vocabulary on the driver and ship it to
# every worker. Past the cap a bigram scores at the language's add-one
# default lp; kept entries are unchanged (T, V stay pre-cap). Mirrored
# exactly by the SQL oracle (QUALIFY row_number <= cap) and covered by
# the wide-charset far-side test with the cap forced small.
QUALITY_LM_VOCAB_CAP = 65_536

# Driver-collect flip: while the keyed (lang, g, n) count table has at
# most this many rows, the top-cap selection / lang totals / global
# vocab run as one driver pandas pass (one collection of slim rows);
# past it they run as keyed distributed stages with per-block local
# top-cap pruning, so the driver only ever sees <= cap x langs rows.
# Same results by construction; the far-side test forces the flip to 0.
MODEL_DRIVER_MAX = 2_000_000

_PAIR_SHIFT = 21                     # max code point 0x10FFFF < 2**21
_PAIR_MASK = (1 << _PAIR_SHIFT) - 1


def _quantize_lp(p_num: int, p_den: int) -> int:
    """int64 micro-nats of -ln(p_num / p_den); int(round()) is
    round-half-even, the exact twin of DuckDB CAST(x AS BIGINT)."""
    return int(round(-math.log(p_num / p_den) * CE_QUANT))


def _g_code(g: str) -> int:
    """Pack a 2-char bigram into one int64 pair code."""
    return (ord(g[0]) << _PAIR_SHIFT) | ord(g[1])


def _g_str(code: int) -> str:
    """Unpack an int64 pair code back to the 2-char bigram."""
    return chr(code >> _PAIR_SHIFT) + chr(code & _PAIR_MASK)


def _pair_code_arrays(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bigram extraction for a list of texts: ONE utf-32
    encode of the concatenation, pair codes formed by a shifted add over
    the code-point array, boundary-spanning pairs masked out. Returns
    (concatenated per-text pair codes in order, per-text pair counts)."""
    lens = np.fromiter((len(t) for t in texts), np.int64, count=len(texts))
    n_pairs = np.maximum(lens - 1, 0)
    total = int(lens.sum())
    if total < 2:
        return np.empty(0, np.int64), n_pairs
    # surrogatepass: Python str permits lone surrogates (e.g. a raw
    # \ud800 escape survives JSON decoding), and a strict utf-32 encode
    # raises UnicodeEncodeError inside the map task, killing the whole
    # job for one malformed document. surrogatepass keeps each surrogate
    # as its own code point — it participates in bigram counts like any
    # other rare character.
    codes = np.frombuffer(
        "".join(texts).encode("utf-32-le", "surrogatepass"), dtype="<u4"
    ).astype(np.int64)
    pairs = (codes[:-1] << _PAIR_SHIFT) | codes[1:]
    # a pair starting at a text's last char spans into the next text
    bad = np.cumsum(lens)[:-1] - 1
    mask = np.ones(len(pairs), dtype=bool)
    mask[bad[(bad >= 0) & (bad < len(pairs))]] = False
    return pairs[mask], n_pairs


def _rows_by_lang(langs: list) -> dict:
    out: dict = {}
    for i, lang in enumerate(langs):
        out.setdefault(lang, []).append(i)
    return out


_COUNTS_SCHEMA = pa.schema(
    [("lang", pa.string()), ("g", pa.string()), ("n", pa.int64())]
)


def _count_partial(t: pa.Table) -> pa.Table:
    """Per-batch (lang, g, n) bigram counts, one np.unique per lang."""
    texts = t["text"].to_pylist()
    out_lang: list = []
    out_g: list[str] = []
    out_n: list[int] = []
    for lang, rows in _rows_by_lang(t["lang"].to_pylist()).items():
        pairs, _ = _pair_code_arrays([texts[i] or "" for i in rows])
        if pairs.size == 0:
            continue
        uniq, cnt = np.unique(pairs, return_counts=True)
        out_lang.extend([lang] * len(uniq))
        out_g.extend(_g_str(int(p)) for p in uniq)
        out_n.extend(int(c) for c in cnt)
    return pa.table(
        {
            "lang": pa.array(out_lang, pa.string()),
            "g": pa.array(out_g, pa.string()),
            "n": pa.array(out_n, pa.int64()),
        }
    )


def _top_cap(df: pd.DataFrame, vocab_cap: int) -> pd.DataFrame:
    """Per-lang top-cap rows under the frozen rank (n DESC, g ASC)."""
    return (
        df.sort_values(["n", "g"], ascending=[False, True], kind="mergesort")
        .groupby("lang", sort=False)
        .head(vocab_cap)
    )


def _assemble_model(
    kept: pd.DataFrame, totals: dict, vocab: int
) -> dict[str, dict]:
    model: dict[str, dict] = {}
    for lang, grp in kept.groupby("lang", sort=False):
        den = totals[lang] + vocab
        lp = {
            g: _quantize_lp(int(c) + 1, den)
            for g, c in zip(grp["g"], grp["n"])
        }
        model[lang] = {"lp": lp, "default": _quantize_lp(1, den)}
    # a lang whose EVERY bigram fell past the cap (or that only has
    # sub-2-char docs) still needs its default slot
    for lang, total in totals.items():
        model.setdefault(
            lang, {"lp": {}, "default": _quantize_lp(1, total + vocab)}
        )
    return model


def train_bigram_model(
    docs: ray.data.Dataset, vocab_cap: int = QUALITY_LM_VOCAB_CAP
) -> dict[str, dict]:
    """Per-language add-one char-bigram model from (lang, text) rows,
    capped at ``vocab_cap`` entries per language (rank: count DESC,
    bigram ASC; see module docstring). Returns
    {lang: {"lp": {g: micro_nats}, "default": micro_nats}}; the default
    covers bigrams unseen OR capped out in that language. Null-lang rows
    contribute to the global vocabulary V but never become a model
    (language-ID failures score 0, same as the SQL oracle)."""
    from ebook_ocr_ray.groups import typed_keyed_sum

    counts = typed_keyed_sum(
        docs.map_batches(_count_partial, batch_format="pyarrow"),
        key_cols=["lang", "g"],
        sum_cols=["n"],
        partials_schema=_COUNTS_SCHEMA,
        num_partitions=4,
    ).materialize()

    if counts.count() <= MODEL_DRIVER_MAX:
        model_df = counts.to_pandas()
        vocab = int(model_df["g"].nunique())  # GLOBAL vocabulary, all langs
        nn = model_df[model_df["lang"].notna()]
        totals = {
            lang: int(n) for lang, n in nn.groupby("lang", sort=False)["n"].sum().items()
        }
        return _assemble_model(_top_cap(nn, vocab_cap), totals, vocab)
    return _train_model_distributed(counts, vocab_cap)


def _train_model_distributed(
    counts: ray.data.Dataset, vocab_cap: int
) -> dict[str, dict]:
    """Scale path of the model build: the driver never holds the full
    count table. Each input row here is a FINAL (lang, g, n) count (the
    keyed sum already ran), so the global per-lang top-cap set is
    contained in the union of per-block top-cap sets — blocks prune
    locally, then one keyed group-apply per lang picks the global cap.
    Totals and the global distinct-bigram vocabulary reduce keyed."""
    from ebook_ocr_ray.functions.textstats import stable_hash63
    from ebook_ocr_ray.groups import map_groups_typed, typed_keyed_sum

    # global vocabulary V: every input row is a distinct (lang, g), so
    # distinct g = group count of a keyed groupby (bounded by charset^2)
    vocab = int(counts.select_columns(["g"]).groupby("g").count().count())

    def totals_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_valid(t["lang"]))
        df = pd.DataFrame(
            {"lang": t["lang"].to_pylist(),
             "n": t["n"].to_numpy(zero_copy_only=False)}
        )
        agg = df.groupby("lang", sort=False)["n"].sum().reset_index()
        return pa.table(
            {"lang": pa.array(agg["lang"], pa.string()),
             "n": pa.array(agg["n"], pa.int64())}
        )

    totals_df = typed_keyed_sum(
        counts.map_batches(totals_partial, batch_format="pyarrow"),
        key_cols=["lang"],
        sum_cols=["n"],
        partials_schema=pa.schema([("lang", pa.string()), ("n", pa.int64())]),
        num_partitions=4,
    ).to_pandas()
    totals = {lang: int(n) for lang, n in zip(totals_df["lang"], totals_df["n"])}

    local_schema = pa.schema(
        [("skey", pa.int64()), ("lang", pa.string()),
         ("g", pa.string()), ("n", pa.int64())]
    )

    def local_topcap(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_valid(t["lang"]))
        kept = _top_cap(t.to_pandas(), vocab_cap)
        return pa.table(
            {
                "skey": pa.array(
                    [stable_hash63(lang) for lang in kept["lang"]], pa.int64()
                ),
                "lang": pa.array(kept["lang"], pa.string()),
                "g": pa.array(kept["g"], pa.string()),
                "n": pa.array(kept["n"], pa.int64()),
            }
        )

    def global_topcap(df: pd.DataFrame) -> pd.DataFrame:
        # in-group pandas groupby over the TRUE lang resolves any
        # surrogate-hash collision between distinct langs
        return _top_cap(df, vocab_cap)[["lang", "g", "n"]]

    kept = map_groups_typed(
        counts.map_batches(local_topcap, batch_format="pyarrow"),
        "skey",
        global_topcap,
        schema=local_schema,
        empty_fn=lambda: pd.DataFrame(
            {"lang": pd.Series([], dtype=object),
             "g": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        ),
        num_partitions=8,
    ).to_pandas()
    return _assemble_model(kept, totals, vocab)


def _scoring_model(model: dict[str, dict]) -> dict:
    """Numpy form of the broadcast model: per lang a SORTED int64
    pair-code array + parallel lp array (searchsorted lookup)."""
    out: dict = {}
    for lang, m in model.items():
        items = sorted((_g_code(g), lp) for g, lp in m["lp"].items())
        out[lang] = {
            "codes": np.fromiter((c for c, _ in items), np.int64, len(items)),
            "lps": np.fromiter((v for _, v in items), np.int64, len(items)),
            "default": m["default"],
        }
    return out


def _score_batch(t: pa.Table, smodel: dict) -> pa.Table:
    """Vectorized scoring: per (batch, lang) one pair-code extraction,
    one searchsorted model lookup, per-doc sums via np.add.reduceat.
    All int64 — c * lp sums stay exact."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    langs = t["lang"].to_pylist()
    texts = t["text"].to_pylist()
    ces = np.zeros(len(ids), dtype=np.int64)
    for lang, rows in _rows_by_lang(langs).items():
        m = smodel.get(lang)
        if m is None:
            continue  # null lang / unseen lang scores 0 (oracle parity)
        pairs, n_pairs = _pair_code_arrays([texts[i] or "" for i in rows])
        if pairs.size == 0:
            continue
        mcodes, mlps = m["codes"], m["lps"]
        if mcodes.size:
            pos = np.searchsorted(mcodes, pairs)
            pos_c = np.minimum(pos, mcodes.size - 1)
            hit = mcodes[pos_c] == pairs
            lp = np.where(hit, mlps[pos_c], m["default"])
        else:
            lp = np.full(pairs.size, m["default"], np.int64)
        nz = n_pairs > 0
        offsets = np.zeros(int(nz.sum()), dtype=np.int64)
        offsets[1:] = np.cumsum(n_pairs[nz])[:-1]
        sums = np.add.reduceat(lp, offsets)
        ces[np.asarray(rows, dtype=np.int64)[nz]] = sums // n_pairs[nz]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "ce_micro": pa.array(ces, pa.int64()),
        }
    )


def _disc_quantile(sorted_vals: np.ndarray, counts: np.ndarray, q: float) -> int:
    """quantile_disc over a (value, count) histogram:
    sorted[ceil(q*n)-1], computed from cumulative counts."""
    n = int(counts.sum())
    idx = max(0, math.ceil(q * n) - 1)
    cum = np.cumsum(counts)
    return int(sorted_vals[np.searchsorted(cum, idx, side="right")])


def quality_thresholds(scored: ray.data.Dataset) -> dict[str, tuple[int, int]]:
    """{lang: (t1, t2)} — per-language 1/3 and 2/3 discrete quantiles of
    ce_milli, from a keyed (lang, ce_milli) count histogram (bounded by
    langs x milli-nat range, never by document count)."""
    from ebook_ocr_ray.groups import typed_keyed_sum

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "ce_milli": t["ce_micro"].to_numpy(zero_copy_only=False) // 1000,
            }
        )
        # null-lang rows (language-ID failure in a real corpus) must reach
        # the threshold table or the bucket pass would KeyError; a private
        # sentinel sidesteps pandas' null-group-key semantics entirely
        df["lang"] = df["lang"].map(lambda x: _NULL_LANG if x is None else x)
        agg = (
            df.groupby(["lang", "ce_milli"], sort=False)
            .size().rename("n").reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(
            None
        )

    hist = typed_keyed_sum(
        scored.map_batches(hist_partial, batch_format="pyarrow"),
        key_cols=["lang", "ce_milli"],
        sum_cols=["n"],
        partials_schema=pa.schema(
            [("lang", pa.string()), ("ce_milli", pa.int64()), ("n", pa.int64())]
        ),
        num_partitions=4,
    ).to_pandas()

    out: dict[str, tuple[int, int]] = {}
    for lang, grp in hist.groupby("lang", sort=False):
        grp = grp.sort_values("ce_milli")
        vals = grp["ce_milli"].to_numpy(dtype=np.int64)
        cnts = grp["n"].to_numpy(dtype=np.int64)
        out[lang] = (
            _disc_quantile(vals, cnts, 1.0 / 3),
            _disc_quantile(vals, cnts, 2.0 / 3),
        )
    return out


def quality_buckets_ds(
    docs: ray.data.Dataset,
    spool_dir: str | None = None,
    vocab_cap: int = QUALITY_LM_VOCAB_CAP,
) -> ray.data.Dataset:
    """(doc_id, lang, ce_micro, bucket) over (doc_id, lang, text) rows —
    see module docstring for the frozen semantics.

    The scored rows are consumed twice (threshold histogram + bucket
    attach). ``spool_dir=None`` materializes them (object-store residency
    — O(corpus) slim rows, spillable); a scratch path spools them to
    parquet instead, so the histogram pass re-reads only (lang, ce_micro)
    column-pruned and the object store never holds the corpus whole (the
    extraction_pipeline spool contract; caller owns the dir lifetime)."""
    from ebook_ocr_ray.state.spool import pin_reusable

    model_ref = ray.put(_scoring_model(train_bigram_model(docs, vocab_cap)))

    def score(t: pa.Table) -> pa.Table:
        return _score_batch(t, ray.get(model_ref))

    scored = pin_reusable(
        docs.map_batches(score, batch_format="pyarrow"),
        spool_dir,
        "scored_rows",
        schema=pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()), ("ce_micro", pa.int64())]
        ),
    )
    th_ref = ray.put(
        quality_thresholds(scored.read(columns=["lang", "ce_micro"]))
    )

    def bucket(t: pa.Table) -> pa.Table:
        th = ray.get(th_ref)
        ce_milli = t["ce_micro"].to_numpy(zero_copy_only=False) // 1000
        t1 = np.empty(len(ce_milli), dtype=np.int64)
        t2 = np.empty(len(ce_milli), dtype=np.int64)
        for lang, rows in _rows_by_lang(t["lang"].to_pylist()).items():
            lo, hi = th[_NULL_LANG if lang is None else lang]
            t1[rows], t2[rows] = lo, hi
        buckets = np.where(
            ce_milli <= t1, "head", np.where(ce_milli <= t2, "middle", "tail")
        )
        return t.append_column("bucket", pa.array(buckets.tolist(), pa.string()))

    return scored.read().map_batches(bucket, batch_format="pyarrow")


def quality_buckets(
    sf_dir: str,
    spool_dir: str | None = None,
    vocab_cap: int = QUALITY_LM_VOCAB_CAP,
) -> ray.data.Dataset:
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    return quality_buckets_ds(docs, spool_dir=spool_dir, vocab_cap=vocab_cap)


# --- Gopher-style rule filter ------------------------------------------------

# Integer thresholds (Rae et al. 2021, "Scaling Language Models" §A1.1
# adapted to this corpus's scale): word-count floor, mean-word-length
# band expressed as cross-multiplied integers (3 <= sum_wlen/n_words <= 10
# compared as 3*n <= sum <= 10*n — no float boundary), a stopword floor,
# and a top-word concentration cap (most frequent word <= 20% of tokens,
# compared as 5*top_n <= n_words).
GOPHER_MIN_WORDS = 40
GOPHER_MEAN_WLEN_MIN = 3      # lower bound numerator (x1)
GOPHER_MEAN_WLEN_MAX = 10     # upper bound numerator (x1)
GOPHER_MIN_STOPWORDS = 2
GOPHER_TOP_WORD_DEN = 5       # top word must be <= 1/5 of all tokens


def _gopher_stats(keys: np.ndarray, texts: pd.Series) -> pd.DataFrame:
    """Per-key Gopher-rule metrics + keep verdict over (key, text) rows,
    fully vectorized (one pandas explode, C-level split/groupby). ``keys``
    may be doc ids or batch positions — each distinct key is one doc.
    Returns columns (k, n_words, sum_wlen, n_stop, top_n, keep)."""
    from ebook_ocr_ray.functions.textstats import STOPWORDS

    stop = sorted(STOPWORDS)
    df = pd.DataFrame({"k": keys, "text": texts.fillna("")})
    words = df.set_index("k")["text"].str.split(" ").explode()
    wc = (
        words.groupby([words.index, words.rename("w")], sort=False)
        .size()
        .rename("c")
        .reset_index()
    )
    wc["wlen"] = wc["w"].str.len() * wc["c"]
    wc["is_stop"] = wc["w"].isin(stop)
    per = (
        wc.groupby("k", sort=False)
        .agg(
            n_words=("c", "sum"),
            sum_wlen=("wlen", "sum"),
            top_n=("c", "max"),
        )
        .reset_index()
    )
    stops = (
        wc.loc[wc["is_stop"]]
        .groupby("k", sort=False)["c"]
        .sum()
        .rename("n_stop")
    )
    per = per.merge(stops, on="k", how="left")
    per["n_stop"] = per["n_stop"].fillna(0).astype("int64")
    for c in ("n_words", "sum_wlen", "top_n"):
        per[c] = per[c].astype("int64")
    keep = (
        (per.n_words >= GOPHER_MIN_WORDS)
        & (GOPHER_MEAN_WLEN_MIN * per.n_words <= per.sum_wlen)
        & (per.sum_wlen <= GOPHER_MEAN_WLEN_MAX * per.n_words)
        & (per.n_stop >= GOPHER_MIN_STOPWORDS)
        & (GOPHER_TOP_WORD_DEN * per.top_n <= per.n_words)
    )
    per["keep"] = keep.astype("int64")
    return per


def gopher_keep_mask(texts: list) -> np.ndarray:
    """Positional boolean keep mask for a batch of texts — the map-side
    filter form of the Gopher rules (training_data_job consumes this so
    filtering never needs a join back on doc ids)."""
    if not texts:
        return np.empty(0, dtype=bool)
    per = _gopher_stats(
        np.arange(len(texts), dtype=np.int64), pd.Series(texts, dtype=object)
    ).sort_values("k")
    return per["keep"].to_numpy(dtype=np.int64).astype(bool)


def gopher_rule_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc Gopher-rule metrics + the keep verdict, fully vectorized:
    one pandas explode per batch (C-level split/explode/groupby), no
    per-row Python. Purely map-side — embarrassingly parallel, no
    shuffle at any corpus size. Output: (doc_id, n_words, sum_wlen,
    n_stop, top_n, keep) with keep as int64 0/1 so the value hash is
    dtype-stable against the SQL oracle."""
    out_schema = pa.schema(
        [(c, pa.int64())
         for c in ("doc_id", "n_words", "sum_wlen", "n_stop", "top_n", "keep")]
    )

    def rules(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        per = _gopher_stats(
            t["doc_id"].to_numpy(zero_copy_only=False), t["text"].to_pandas()
        ).rename(columns={"k": "doc_id"})
        # explicit types: an empty batch must still emit the declared
        # int64 schema (from_pandas would infer nulls)
        return pa.table(
            {
                c: pa.array(per[c], pa.int64())
                for c in ("doc_id", "n_words", "sum_wlen", "n_stop", "top_n", "keep")
            }
        )

    return docs.map_batches(rules, batch_format="pyarrow")


def gopher_quality(sf_dir: str) -> ray.data.Dataset:
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return gopher_rule_stats(docs)
