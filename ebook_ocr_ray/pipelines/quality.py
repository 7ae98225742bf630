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
    and the model has at most charset^2 x langs entries, not one per
    document),
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
            -> model table on the driver (bounded by charset^2 x langs,
               corpus-size-INDEPENDENT) -> ray.put broadcast
    pass 2  score every doc against the broadcast model (slim int rows,
            materialized once — the neardup slim-row trade)
    pass 3  (lang, ce_milli) histogram -> keyed sum -> thresholds on
            the driver (bounded by langs x milli-nat range) -> broadcast
    pass 4  bucket attach, streaming
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ebook_ocr_ray.reads import read_parquet_clean

CE_QUANT = 1_000_000  # micro-nats
_NULL_LANG = "\x00lang-null"   # threshold-table key for null-lang rows


def _quantize_lp(p_num: int, p_den: int) -> int:
    """int64 micro-nats of -ln(p_num / p_den); int(round()) is
    round-half-even, the exact twin of DuckDB CAST(x AS BIGINT)."""
    return int(round(-math.log(p_num / p_den) * CE_QUANT))


def _bigrams(text: str | None) -> list[str]:
    t = text or ""
    return [t[i : i + 2] for i in range(len(t) - 1)]


def train_bigram_model(docs: ray.data.Dataset) -> dict[str, dict]:
    """Per-language add-one char-bigram model from (lang, text) rows.
    Returns {lang: {"lp": {g: micro_nats}, "default": micro_nats}}; the
    default covers bigrams unseen in that language (never exercised when
    scoring the training corpus itself, which is what the oracle does)."""
    from ebook_ocr_ray.groups import typed_keyed_sum

    def partial(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for g in _bigrams(txt):
                counts[(lang, g)] += 1
        langs = [k[0] for k in counts]
        grams = [k[1] for k in counts]
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "g": pa.array(grams, pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    model_df = typed_keyed_sum(
        docs.map_batches(partial, batch_format="pyarrow"),
        key_cols=["lang", "g"],
        sum_cols=["n"],
        partials_schema=pa.schema(
            [("lang", pa.string()), ("g", pa.string()), ("n", pa.int64())]
        ),
        num_partitions=4,
    ).to_pandas()

    vocab = int(model_df["g"].nunique())  # GLOBAL vocabulary (all langs)
    model: dict[str, dict] = {}
    for lang, grp in model_df.groupby("lang", sort=False):
        total = int(grp["n"].sum())
        den = total + vocab
        lp = {
            g: _quantize_lp(int(c) + 1, den)
            for g, c in zip(grp["g"], grp["n"])
        }
        model[lang] = {"lp": lp, "default": _quantize_lp(1, den)}
    return model


def _score_batch(t: pa.Table, model: dict[str, dict]) -> pa.Table:
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    langs = t["lang"].to_pylist()
    ces = np.zeros(len(ids), dtype=np.int64)
    for i, (lang, txt) in enumerate(zip(langs, t["text"].to_pylist())):
        bgs = _bigrams(txt)
        if not bgs:
            continue
        m = model.get(lang)
        if m is None:
            continue
        lp, default = m["lp"], m["default"]
        # integer sum over occurrences: Counter collapses repeats so the
        # inner loop runs per DISTINCT bigram; c * lp is exact int64
        s = 0
        for g, c in Counter(bgs).items():
            s += c * lp.get(g, default)
        ces[i] = s // len(bgs)
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
    docs: ray.data.Dataset, spool_dir: str | None = None
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

    model_ref = ray.put(train_bigram_model(docs))

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
        langs = t["lang"].to_pylist()
        ce = t["ce_micro"].to_numpy(zero_copy_only=False)
        buckets = []
        for lang, c in zip(langs, ce // 1000):
            t1, t2 = th[_NULL_LANG if lang is None else lang]
            buckets.append("head" if c <= t1 else "middle" if c <= t2 else "tail")
        return t.append_column("bucket", pa.array(buckets, pa.string()))

    return scored.read().map_batches(bucket, batch_format="pyarrow")


def quality_buckets(sf_dir: str, spool_dir: str | None = None) -> ray.data.Dataset:
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    return quality_buckets_ds(docs, spool_dir=spool_dir)


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


def gopher_rule_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc Gopher-rule metrics + the keep verdict, fully vectorized:
    one pandas explode per batch (C-level split/explode/groupby), no
    per-row Python. Purely map-side — embarrassingly parallel, no
    shuffle at any corpus size. Output: (doc_id, n_words, sum_wlen,
    n_stop, top_n, keep) with keep as int64 0/1 so the value hash is
    dtype-stable against the SQL oracle."""
    from ebook_ocr_ray.functions.textstats import STOPWORDS

    stop = sorted(STOPWORDS)

    out_schema = pa.schema(
        [(c, pa.int64())
         for c in ("doc_id", "n_words", "sum_wlen", "n_stop", "top_n", "keep")]
    )

    def rules(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        df = pd.DataFrame(
            {"doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
             "text": t["text"].to_pandas().fillna("")}
        )
        words = df.set_index("doc_id")["text"].str.split(" ").explode()
        wc = (
            words.groupby([words.index, words.rename("w")], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        wc["wlen"] = wc["w"].str.len() * wc["c"]
        wc["is_stop"] = wc["w"].isin(stop)
        per = (
            wc.groupby("doc_id", sort=False)
            .agg(
                n_words=("c", "sum"),
                sum_wlen=("wlen", "sum"),
                top_n=("c", "max"),
            )
            .reset_index()
        )
        stops = (
            wc.loc[wc["is_stop"]]
            .groupby("doc_id", sort=False)["c"]
            .sum()
            .rename("n_stop")
        )
        per = per.merge(stops, on="doc_id", how="left")
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
