"""Benchmark harness.

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:
  {"metric": ..., "value": secs, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "docs_per_sec": ...,
   "probes": {...},   # boot fingerprint: within-boot ratios are sound,
                      # cross-boot absolutes are not (BASELINE.md protocol)
   "scaling": {...}}  # one fresh-session 4 -> 16 cpu pair on an amplified
                      # corpus + the efficiency ratio, so every round's
                      # >=0.8 evidence regenerates on the boot the driver
                      # actually used. Skip with GRAFT_BENCH_NO_SCALING=1.

--scaling: the full battery — two N -> 4N pairs (4/16 and 8/32) in fresh
processes on a 64x-amplified corpus (the sandbox stand-in for the N vs 4N
node cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

try:
    # ambient load BEFORE the suite runs — the post-suite reading is
    # self-inflicted (our own workers dominate the 1-min average)
    LOADAVG_AT_START = round(os.getloadavg()[0], 2)
except OSError:
    LOADAVG_AT_START = None


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    for t in ("documents", "lineitem", "events", "embeddings", "orders"):
        with open(f"{SF_DIR}/{t}.parquet", "rb") as f:
            while f.read(1 << 22):
                pass

    from ebook_ocr_ray.pipelines import analytics, neardup, neighbors
    from ebook_ocr_ray.pipelines.extraction import extraction_pipeline, lineage

    # untimed warmup: spin up worker processes / imports / one actor pool so
    # the timed section measures steady-state throughput, not process spawn
    extraction_pipeline("/root/testdata/sf0.001", dedup=False).count()

    timings: dict[str, float] = {}
    n_docs = 0

    def timed(name, fn):
        nonlocal n_docs
        # drain the previous query BEFORE timing starts: drop its Dataset
        # refs (gc), then run a trivial no-op execution, which blocks until
        # the executor has the cluster back — otherwise the predecessor's
        # actor-pool teardown and block eviction land inside the NEXT
        # query's measured wall (reproducibly +4-5s after extract_e2e)
        import gc

        import ray.data as _rd

        gc.collect()
        _rd.range(64, override_num_blocks=32).map_batches(lambda b: b).materialize()
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # headline: full extraction pipeline (pages synth -> dedup -> ensemble
    # extraction -> lineage), consumed by the lineage aggregate so the whole
    # stream executes without driver materialization. Spool mode: the
    # prepared corpus is synthesized ONCE into a scratch parquet; dedup
    # pass A is a column-pruned read of it (see extraction_pipeline).
    factor = int(os.environ.get("GRAFT_BENCH_FACTOR", "8"))

    def headline():
        import shutil
        import tempfile

        spool = tempfile.mkdtemp(prefix="extract_spool_", dir="/tmp")
        try:
            lin = lineage(
                extraction_pipeline(
                    SF_DIR, with_duplicates=True, dedup=True, repeat=factor,
                    spool_dir=spool,
                )
            ).to_pandas()
            return int(lin.doc_count.sum())
        finally:
            shutil.rmtree(spool, ignore_errors=True)

    n_docs = timed("extract_e2e", headline)
    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        total = round(sum(timings.values()), 3)
        ray.shutdown()
        return {
            "metric": "suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "docs_per_sec": round(n_docs / timings["extract_e2e"], 1),
            "extract_docs": n_docs,
        }
    from ebook_ocr_ray.stages.structural import structural_pipeline

    timed("q1_pricing", lambda: analytics.q1_pricing(SF_DIR).to_pandas())
    timed("priority_revenue", lambda: analytics.priority_revenue(SF_DIR).to_pandas())
    timed("events_hourly", lambda: analytics.events_hourly(SF_DIR).count())
    timed("purchase_attribution", lambda: analytics.purchase_attribution(SF_DIR).count())
    timed("top_terms", lambda: analytics.top_terms(SF_DIR).to_pandas())
    timed("token_stats", lambda: analytics.token_table(SF_DIR).count())
    timed("knn_brute", lambda: neighbors.knn_brute(SF_DIR).to_pandas())
    timed("minhash_clusters", lambda: neardup.minhash_clusters(SF_DIR).count())
    timed("dedup_exact_docs", lambda: analytics.dedup_exact_docs(SF_DIR).count())
    timed("structural_xml", lambda: structural_pipeline(SF_DIR).count())
    timed("sessionize", lambda: analytics.sessionize(SF_DIR).count())
    timed("pack_sequences", lambda: analytics.pack_sequences(SF_DIR).count())
    from ebook_ocr_ray.pipelines import quality, spandedup

    timed("dedup_spans", lambda: spandedup.remove_duplicated_spans(SF_DIR).count())
    timed("quality_buckets", lambda: quality.quality_buckets(SF_DIR).count())
    timed(
        "dedup_fuzzy_exact", lambda: analytics.dedup_fuzzy_exact(SF_DIR).count()
    )

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs_per_sec": round(n_docs / timings["extract_e2e"], 1) if n_docs else 0.0,
        "extract_docs": n_docs,
    }
    ray.shutdown()
    return result


def probe_battery() -> dict:
    """Boot fingerprint (the BASELINE.md probe protocol): single-core
    hashing, /tmp spool-path write throughput, and a pandas sort-groupby
    micro-bench. These normalize this run's absolute timings against the
    recorded boots — co-tenant VMs make cross-boot absolutes invalid."""
    import hashlib
    import tempfile

    out: dict = {}
    t0 = time.time()
    for i in range(1_000_000):
        hashlib.md5(str(i).encode()).digest()
    out["md5_1m_sec"] = round(time.time() - t0, 3)

    buf = b"\0" * (8 << 20)
    with tempfile.NamedTemporaryFile(dir="/tmp") as f:
        t0 = time.time()
        for _ in range(8):
            f.write(buf)
        f.flush()
        os.fdatasync(f.fileno())
        out["tmp_write_mb_s"] = round(64 / (time.time() - t0), 1)

    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {"k": rng.randint(0, 1000, 2_000_000), "v": rng.rand(2_000_000)}
    )
    t0 = time.time()
    df.sort_values("k", kind="mergesort").groupby("k")["v"].sum()
    out["sort_groupby_2m_sec"] = round(time.time() - t0, 3)
    try:
        out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    out["loadavg_at_start"] = LOADAVG_AT_START
    return out


def _headline_subprocess(ncpu: int, factor: int) -> dict:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_BENCH_HEADLINE_ONLY="1",
        GRAFT_BENCH_NO_SCALING="1",
        # FORCE the factor: an ambient GRAFT_BENCH_FACTOR would silently
        # change the legs' amplification while the JSON still records the
        # requested factor — mislabeled scaling evidence. run_scaling
        # reads the env override itself and passes it here explicitly.
        GRAFT_BENCH_FACTOR=str(factor),
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def scaling_pair(cpus: tuple[int, int] = (4, 16), factor: int = 32) -> dict:
    """One fresh-session N -> 4N pair on a factor-amplified corpus — the
    per-round scaling evidence embedded into the bench JSON. Smaller
    amplification than the full --scaling battery (64x) so the whole
    bench stays under ~10 minutes, but large enough that the wide leg's
    fixed executor footprint (~2-4s session+spool setup) cannot depress
    the ratio: at 16x a ~19s 16-cpu leg under-read the efficiency by
    ~0.15 vs the 64x battery on the same boot. Ratios above 1 are real
    (the fixed footprint amortizes with width)."""
    legs = {n: _headline_subprocess(n, factor) for n in cpus}
    t = [legs[cpus[0]]["queries"]["extract_e2e"], legs[cpus[1]]["queries"]["extract_e2e"]]
    return {
        "cpus": list(cpus),
        "factor": factor,
        "extract_e2e_sec": t,
        "docs_per_sec": [legs[cpus[0]]["docs_per_sec"], legs[cpus[1]]["docs_per_sec"]],
        "efficiency": round((t[0] / t[1]) / (cpus[1] / cpus[0]), 3),
        "battery_note": "authoritative criterion evidence is the 64x "
                        "--scaling battery recorded in BASELINE.md "
                        "(this boot: 4->16 = 1.337, 8->32 = 1.099)",
    }


def run_scaling() -> None:
    def one(ncpu: int) -> dict:
        # bigger corpus for the scaling criterion so compute, not fixed
        # session cost, dominates at both parallelism levels
        env_factor = int(os.environ.get("GRAFT_BENCH_FACTOR", "64"))
        return _headline_subprocess(ncpu, env_factor)

    # Two N -> 4N pairs. 4->16 is the cleaner cluster-size stand-in: the
    # 8->32 pair saturates this VM's memory bus (a pure-multiprocessing
    # probe of the same per-doc extraction code, no Ray, also drops to
    # ~0.61 per-core efficiency at 32 procs — see BASELINE.md), which a
    # real 4N-node cluster with per-node memory would not.
    results = {n: one(n) for n in (4, 16, 8, 32)}
    t = {n: results[n]["queries"]["extract_e2e"] for n in results}
    eff_4_16 = (t[4] / t[16]) / 4
    eff_8_32 = (t[8] / t[32]) / 4
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff_4_16, 3),
                "unit": "ratio",
                "cpus": [4, 16],
                "extract_e2e_sec": [t[4], t[16]],
                "docs_per_sec": [
                    results[4]["docs_per_sec"], results[16]["docs_per_sec"]
                ],
                "secondary_pair": {
                    "cpus": [8, 32],
                    "extract_e2e_sec": [t[8], t[32]],
                    "efficiency": round(eff_8_32, 3),
                    "note": "VM memory-bus saturation at 32 procs; "
                            "pure-mp ceiling is ~0.77 (BASELINE.md)",
                },
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        result = run_bench()
        if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") and not os.environ.get(
            "GRAFT_BENCH_NO_SCALING"
        ):
            result["probes"] = probe_battery()
            result["scaling"] = scaling_pair()
        print(json.dumps(result))
