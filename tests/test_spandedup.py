"""Duplicated-span removal: planted-span truth table, occurrence (not
distinct-doc) counting, coverage-union geometry, join==broadcast, and a
flagship smoke run."""
import numpy as np
import pandas as pd
import pyarrow as pa

from conftest import SF_SMOKE


def _run(ray, rows, hot_strategy="broadcast", k=4, min_count=2):
    import ray.data as rd

    from ebook_ocr_ray.pipelines.spandedup import remove_duplicated_spans_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    return (
        remove_duplicated_spans_ds(
            docs, k=k, min_count=min_count, hot_strategy=hot_strategy
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )


class TestSpanRemoval:
    def test_planted_shared_span(self, ray_session):
        shared = "alpha beta gamma delta"
        rows = [
            (1, f"one two {shared} three four"),
            (2, f"five six seven {shared} eight"),
            (3, "nothing in common with the others here"),
        ]
        out = _run(ray_session, rows, k=4)
        assert out.loc[1, "clean_text"] == "one two three four"
        assert out.loc[1, "n_removed"] == 4
        assert out.loc[2, "clean_text"] == "five six seven eight"
        assert out.loc[2, "n_removed"] == 4
        assert out.loc[3, "clean_text"] == rows[2][1]
        assert out.loc[3, "n_removed"] == 0

    def test_overlapping_spans_union(self, ray_session):
        # two docs share a 5-word region -> two overlapping 4-word hot
        # spans; coverage is the union (5 words), not 8
        region = "alpha beta gamma delta epsilon"
        rows = [(1, f"pre {region} post"), (2, f"{region} tail words here")]
        out = _run(ray_session, rows, k=4)
        assert out.loc[1, "clean_text"] == "pre post"
        assert out.loc[1, "n_removed"] == 5
        assert out.loc[2, "clean_text"] == "tail words here"
        assert out.loc[2, "n_removed"] == 5

    def test_occurrence_counting_within_one_doc(self, ray_session):
        # a doc repeating its OWN span reaches min_count alone
        span = "alpha beta gamma delta"
        rows = [(1, f"{span} mid point {span}"), (2, "unrelated words only here now")]
        out = _run(ray_session, rows, k=4)
        assert out.loc[1, "clean_text"] == "mid point"
        assert out.loc[1, "n_removed"] == 8
        assert out.loc[2, "n_removed"] == 0

    def test_min_count_boundary(self, ray_session):
        span = "alpha beta gamma delta"
        rows = [(1, f"x {span} y"), (2, f"z {span} w")]
        # two occurrences < min_count=3 -> nothing removed
        out = _run(ray_session, rows, k=4, min_count=3)
        assert int(out["n_removed"].sum()) == 0
        # whole-doc coverage -> empty clean_text
        rows2 = [(1, span), (2, span)]
        out2 = _run(ray_session, rows2, k=4)
        assert out2.loc[1, "clean_text"] == ""
        assert out2.loc[1, "n_removed"] == 4

    def test_short_docs_pass_through(self, ray_session):
        rows = [(1, "one two three"), (2, "one two three"), (3, "")]
        out = _run(ray_session, rows, k=4)
        # duplicate texts, but shorter than k: no spans exist at all
        assert int(out["n_removed"].sum()) == 0
        assert out.loc[1, "clean_text"] == "one two three"
        assert out.loc[3, "clean_text"] == ""

    def test_join_equals_broadcast(self, ray_session):
        shared = "alpha beta gamma delta epsilon zeta"
        rows = [
            (i, f"doc {i} words {shared} trailer {i}") for i in range(1, 8)
        ] + [(20, "a singleton document with no shared content at all")]
        a = _run(ray_session, rows, hot_strategy="broadcast")
        b = _run(ray_session, rows, hot_strategy="join")
        pd.testing.assert_frame_equal(a, b)
        # the shared region is "words <6 shared> trailer" (the flanking
        # words are also common to all 7 docs): 8 covered positions
        assert (a.loc[1:7, "n_removed"] == 8).all()

    def test_flagship_smoke(self, ray_session):
        from ebook_ocr_ray.pipelines.spandedup import remove_duplicated_spans

        out = remove_duplicated_spans(SF_SMOKE).to_pandas()
        assert len(out) > 0
        assert set(out.columns) == {"doc_id", "clean_text", "n_removed"}
        assert (out["n_removed"] >= 0).all()


class TestRebuildKernel:
    def test_difference_array_union(self):
        from ebook_ocr_ray.pipelines.spandedup import _rebuild

        words = list("abcdefgh")
        # spans at 0 and 2 with k=3 cover 0..4
        clean, n = _rebuild(words, np.array([0, 2]), 3)
        assert clean == "f g h" and n == 5
        # span clipped at the tail
        clean, n = _rebuild(words, np.array([6]), 3)
        assert clean == "a b c d e f" and n == 2
        clean, n = _rebuild(words, np.array([], dtype=np.int64), 3)
        assert n == 0 and clean == "a b c d e f g h"
