"""Round-4 stress probes: spool-mode runs of the four pin_reusable
pipelines on a 320k-doc corpus, plus the fuzzy-cascade mirror-farm
probes. Deterministic corpora built under /tmp; results print as one
JSON line each so BASELINE.md entries are reproducible.

Usage:
  python scripts/stress_spool.py build       # write the corpora
  python scripts/stress_spool.py spool       # 4 pipelines, spool mode
  python scripts/stress_spool.py materialize # same, materialize mode
  python scripts/stress_spool.py fuzzy       # mirror-farm cascade probes
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CORPUS = "/tmp/stress_spool_corpus"
FARM = "/tmp/stress_fuzzy_farm"
SUFFIX = "/tmp/stress_suffix_farm"
TRAIN = "/tmp/stress_train_corpus"

N_DOCS = 320_000
DUP_GROUPS = 1_600           # x4 one-word-apart variants = 2% dup fraction
WORDS = 55
LANGS = ["en", "de", "fr"]


def build_corpus() -> None:
    """320k docs, per-doc-unique vocab except 1,600 groups of 4
    one-word-apart variants (the round-3 realistic-2% recipe)."""
    os.makedirs(CORPUS, exist_ok=True)
    out = os.path.join(CORPUS, "documents.parquet")
    if os.path.exists(out):
        print("corpus exists:", out)
        return
    ids, texts, langs = [], [], []
    doc_id = 0
    for g in range(DUP_GROUPS):
        base = [f"g{g}w{j}" for j in range(WORDS)]
        for v in range(4):
            w = list(base)
            w[10 + v] = f"g{g}v{v}"          # one word apart per variant
            ids.append(doc_id)
            texts.append(" ".join(w))
            langs.append(LANGS[doc_id % 3])
            doc_id += 1
    while doc_id < N_DOCS:
        ids.append(doc_id)
        texts.append(" ".join(f"u{doc_id}w{j}" for j in range(WORDS)))
        langs.append(LANGS[doc_id % 3])
        doc_id += 1
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        out,
    )
    print("built", out, N_DOCS, "docs")


def build_farms() -> None:
    """Two 64k-doc mirror farms, 500 farms x 128 mirrors each:
    - FARM: case-perturbed mirrors (copy r uppercases word r%20) —
      normalization-equal, the fuzzy cascade's target;
    - SUFFIX: one-word-APPENDED variants (copy r appends ' xr{r}') —
      NOT normalization-equal, the documented fuzzy-can't-help case."""
    for path, perturb in ((FARM, "case"), (SUFFIX, "suffix")):
        os.makedirs(path, exist_ok=True)
        out = os.path.join(path, "documents.parquet")
        if os.path.exists(out):
            print("corpus exists:", out)
            continue
        ids, texts = [], []
        for f in range(500):
            words = [f"f{f}tok{j}" for j in range(20)]
            for r in range(128):
                if perturb == "case":
                    w = list(words)
                    w[r % 20] = w[r % 20].upper()
                    t = " ".join(w)
                else:
                    t = " ".join(words) + f" xr{r}"
                ids.append(r * 1000 + f)
                texts.append(t)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            out,
        )
        print("built", out, len(ids), "docs")


def build_train_corpus() -> None:
    """320k Gopher-PASSING docs for the composed training job: the
    spool-corpus recipe (1,600 groups x 4 one-word-apart variants +
    uniques) with six stopwords woven in per doc, so every text clears
    all five Gopher rules (61 words, mean wlen ~5, 6 stopwords, top
    word 1/61) and the job's filter stage is non-vacuous."""
    os.makedirs(TRAIN, exist_ok=True)
    out = os.path.join(TRAIN, "documents.parquet")
    if os.path.exists(out):
        print("corpus exists:", out)
        return
    stops = ["the", "and", "of", "to", "in", "is"]

    def weave(words: list[str]) -> str:
        woven = []
        for j, w in enumerate(words):
            if j % 10 == 0 and j // 10 < len(stops):
                woven.append(stops[j // 10])
            woven.append(w)
        return " ".join(woven)

    ids, texts, langs = [], [], []
    doc_id = 0
    for g in range(DUP_GROUPS):
        base = [f"g{g}w{j}" for j in range(WORDS)]
        for v in range(4):
            w = list(base)
            w[10 + v] = f"g{g}v{v}"
            ids.append(doc_id)
            texts.append(weave(w))
            langs.append(LANGS[doc_id % 3])
            doc_id += 1
    while doc_id < N_DOCS:
        ids.append(doc_id)
        texts.append(weave([f"u{doc_id}w{j}" for j in range(WORDS)]))
        langs.append(LANGS[doc_id % 3])
        doc_id += 1
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        out,
    )
    print("built", out, N_DOCS, "docs")


def run_trainjob() -> None:
    """Composed training-data job over the 320k Gopher-passing corpus,
    spool waves on /tmp — the single-submission stress record."""
    _init_ray()
    import tempfile

    from ebook_ocr_ray.pipelines.trainjob import training_data_job

    scratch = tempfile.mkdtemp(prefix="trainjob_stress_")
    t0 = time.time()
    out = training_data_job(TRAIN, scratch)
    n_docs = out["docs"].count()
    n_pack = out["pack"].count()
    dt = round(time.time() - t0, 1)
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({
        "probe": "training_data_job_320k", "sec": dt,
        "n_docs_in": N_DOCS, "n_docs_out": n_docs, "n_pack_rows": n_pack,
        "docs_per_sec": round(N_DOCS / dt, 1),
    }))


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def run_pipelines(mode: str) -> None:
    _init_ray()
    from ebook_ocr_ray.pipelines import neardup, quality

    results = {}
    for name, fn in (
        ("minhash_clusters", lambda sd: neardup.minhash_clusters(CORPUS, spool_dir=sd)),
        ("simhash_pairs", lambda sd: neardup.simhash_pairs(CORPUS, spool_dir=sd)),
        ("jaccard_dup_pairs", lambda sd: neardup.jaccard_dup_pairs(CORPUS, spool_dir=sd)),
        ("quality_buckets", lambda sd: quality.quality_buckets(CORPUS, spool_dir=sd)),
    ):
        sd = tempfile.mkdtemp(prefix=f"spool_{name}_") if mode == "spool" else None
        t0 = time.time()
        n = fn(sd).count()
        dt = round(time.time() - t0, 1)
        if sd:
            shutil.rmtree(sd, ignore_errors=True)
        results[name] = {"sec": dt, "rows": n,
                         "docs_per_sec": round(N_DOCS / dt, 1)}
        print(json.dumps({"mode": mode, "query": name, **results[name]}))
    print(json.dumps({"mode": mode, "n_docs": N_DOCS, "results": results}))


def run_fuzzy() -> None:
    _init_ray()
    from ebook_ocr_ray.pipelines import neardup

    out = {}
    for label, sf, fuzzy in (
        ("case_farm_fuzzy", FARM, True),
        ("case_farm_plain", FARM, False),
        ("suffix_farm_fuzzy", SUFFIX, True),
    ):
        t0 = time.time()
        df = neardup.minhash_clusters_cascade(sf, fuzzy=fuzzy).to_pandas()
        dt = round(time.time() - t0, 1)
        # farm f's expected cluster = min doc_id holding farm f = f
        correct = int((df.cluster_id == df.doc_id % 1000).sum())
        out[label] = {"sec": dt, "rows": len(df),
                      "cluster_recall": round(correct / len(df), 4)}
        print(json.dumps({"probe": label, **out[label]}))
    print(json.dumps(out))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "build"
    if cmd == "build":
        build_corpus()
        build_farms()
        build_train_corpus()
    elif cmd in ("spool", "materialize"):
        run_pipelines(cmd)
    elif cmd == "fuzzy":
        run_fuzzy()
    elif cmd == "trainjob":
        build_train_corpus()
        run_trainjob()
    else:
        raise SystemExit(f"unknown command {cmd!r}")
