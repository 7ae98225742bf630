"""Regression lock for the round-5 gate-log hygiene work: the pipelines
that historically emitted "RefBundle with a different schema" warnings
(schema-less zero-block bundles from whole-task-empty filter outputs —
see joins.filler_if_empty) must stay warning-free.

The warning is logged in the DRIVER process by the streaming executor
(ray/data/_internal/execution/streaming_executor_state.py:793), but Ray
Data's loggers don't propagate to the root logger, so a handler is
attached directly to the executor's module logger; a control test
proves the mechanism sees a deliberately divergent pipeline."""

import contextlib
import logging

import pyarrow as pa
import pytest

from conftest import SF_SMOKE

RAY_EXEC_LOGGER = "ray.data._internal.execution.streaming_executor_state"


class _Collector(logging.Handler):
    def __init__(self):
        super().__init__(logging.WARNING)
        self.records = []

    def emit(self, record):
        self.records.append(record)

    @property
    def divergences(self):
        return [
            r.getMessage()[:200]
            for r in self.records
            if "RefBundle with a different schema" in r.getMessage()
        ]


@contextlib.contextmanager
def capture_executor_warnings():
    logger = logging.getLogger(RAY_EXEC_LOGGER)
    handler = _Collector()
    old_level = logger.level
    logger.addHandler(handler)
    logger.setLevel(logging.WARNING)
    try:
        yield handler
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)


class TestWarningFreePipelines:
    def test_capture_mechanism_sees_divergence(self, ray_session):
        """Control: a filter whose whole-task outputs go empty (typed
        empties are DROPPED, leaving schema-less zero-block bundles)
        must be visible to the collector — otherwise the green tests
        below prove nothing."""
        import ray.data

        src = (
            ray.data.range(512, override_num_blocks=8)
            .map_batches(lambda b: pa.table({"x": b["id"]}), batch_format="pyarrow")
            .materialize()
        )
        with capture_executor_warnings() as h:
            src.map_batches(
                lambda t: t.filter(pa.compute.less(t["x"], 64)),
                batch_format="pyarrow",
            ).map_batches(lambda t: t, batch_format="pyarrow").materialize()
        assert h.divergences, (
            "the collector no longer captures the executor's "
            "schema-divergence warning; the warning-free assertions "
            "below are vacuous"
        )

    @pytest.mark.parametrize(
        "runner",
        [
            pytest.param(
                lambda sf: __import__(
                    "ebook_ocr_ray.pipelines.neardup", fromlist=["x"]
                ).minhash_clusters(sf).count(),
                id="minhash_clusters",
            ),
            pytest.param(
                lambda sf: __import__(
                    "ebook_ocr_ray.pipelines.decontam", fromlist=["x"]
                ).decontaminate_join(sf).count(),
                id="decontaminate_join",
            ),
            pytest.param(
                lambda sf: __import__(
                    "ebook_ocr_ray.pipelines.analytics", fromlist=["x"]
                ).token_quantiles_per_source(sf).count(),
                id="token_quantiles",
            ),
            pytest.param(
                lambda sf: __import__(
                    "ebook_ocr_ray.pipelines.analytics", fromlist=["x"]
                ).distinct_terms_hll(sf),
                id="distinct_terms_hll",
            ),
            pytest.param(
                # the at-scale hot path: safe_join(drop_sentinels=False)
                # + the `exact` re-check owning both filter and refill
                lambda sf: __import__(
                    "ebook_ocr_ray.pipelines.neardup", fromlist=["x"]
                ).minhash_clusters(sf, hot_strategy="join").count(),
                id="minhash_join_path",
            ),
            pytest.param(
                # 20-source cardinality at the sparsest corpus: the old
                # sort aggregate + Sort warned here
                lambda sf: __import__(
                    "ebook_ocr_ray.pipelines.analytics", fromlist=["x"]
                ).source_stats(sf).count(),
                id="source_stats",
            ),
        ],
    )
    def test_pipeline_warning_free(self, ray_session, runner):
        with capture_executor_warnings() as h:
            runner(SF_SMOKE)
        assert not h.divergences, h.divergences

    def test_decontam_join_no_overlap_warning_free(self, ray_session):
        """The clean-corpus case: NO shingle overlap between corpus and
        bench, so every join partition's output empties after the exact
        re-check — the exact situation where a filler placed after the
        join's built-in sentinel filter could never fire (review finding;
        safe_join(drop_sentinels=False) + hit_partial owning the filter
        fixed it)."""
        import ray.data

        from ebook_ocr_ray.pipelines.decontam import decontaminate_ds_join

        docs = ray.data.from_arrow(
            [
                pa.table(
                    {
                        "doc_id": pa.array([i], pa.int64()),
                        "text": pa.array(
                            [f"alpha bravo charlie delta doc{i}"], pa.string()
                        ),
                    }
                )
                for i in range(8)
            ]
        )
        bench = ray.data.from_arrow(
            pa.table({"text": pa.array(["zulu yankee xray whiskey victor"], pa.string())})
        )
        with capture_executor_warnings() as h:
            out = decontaminate_ds_join(docs, bench, n=3).to_pandas()
        assert len(out) == 8 and out.contaminated.sum() == 0
        assert not h.divergences, h.divergences


class TestFillerIfEmpty:
    """Unit lock for joins.filler_if_empty — the primitive every
    empty-producing filter leans on."""

    def test_passthrough_when_nonempty(self):
        from ebook_ocr_ray.joins import filler_if_empty

        t = pa.table({"k": pa.array([5], pa.int64()), "v": pa.array(["x"])})
        assert filler_if_empty(t, "k") is t

    def test_empty_becomes_one_subceiling_row_same_schema(self):
        from ebook_ocr_ray.joins import SENTINEL_CEILING, filler_if_empty

        t = pa.schema(
            [("k", pa.int64()), ("v", pa.string()), ("w", pa.int32())]
        ).empty_table()
        out = filler_if_empty(t, "k")
        assert len(out) == 1
        assert out.schema == t.schema
        assert out["k"][0].as_py() < SENTINEL_CEILING + 1  # filtered downstream
        assert out["v"][0].as_py() is None and out["w"][0].as_py() is None
