"""Benchmark decontamination: planted-overlap truth table + flagship run."""
import pyarrow as pa

from conftest import SF_SMOKE


def _flags(ray, docs_rows, bench_texts, n):
    import ray.data as rd

    from ebook_ocr_ray.pipelines.decontam import bench_ngram_set, decontaminate_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs_rows], pa.int64()),
                "text": pa.array([r[1] for r in docs_rows], pa.string()),
            }
        )
    )
    ref = ray.put(bench_ngram_set(bench_texts, n))
    out = decontaminate_ds(docs, ref, n).to_pandas().set_index("doc_id")
    return out


class TestDecontaminate:
    def test_planted_overlap(self, ray_session):
        bench = ["the quick brown fox jumps over the lazy dog tonight"]
        rows = [
            # shares the 8-gram "quick brown ... dog" -> contaminated
            (1, "a quick brown fox jumps over the lazy dog sits"),
            # same words, one swapped inside every 8-window -> clean
            (2, "a quick brown fox leaps over the lazy dog sits"),
            # unrelated -> clean
            (3, "completely different words in this tiny document here"),
        ]
        out = _flags(ray_session, rows, bench, n=8)
        assert out.loc[1, "contaminated"] == 1 and out.loc[1, "n_hits"] >= 1
        assert out.loc[2, "contaminated"] == 0
        assert out.loc[3, "contaminated"] == 0

    def test_short_doc_whole_text_shingle(self, ray_session):
        # <n words: the whole text is the single shingle, so only an
        # exact short-text match in the benchmark contaminates.
        bench = ["tiny doc"]
        rows = [(1, "tiny doc"), (2, "tiny dog"), (3, "")]
        out = _flags(ray_session, rows, bench, n=8)
        assert out.loc[1, "n_hits"] == 1
        assert out.loc[2, "n_hits"] == 0
        # empty text -> no shingles -> clean even vs an empty bench text
        out2 = _flags(ray_session, rows, [""], n=8)
        assert int(out2["contaminated"].sum()) == 0

    def test_distinct_hit_count(self, ray_session):
        # a doc repeating one contaminated shingle counts it once
        bench = ["one two three four five six seven eight"]
        rep = "one two three four five six seven eight"
        rows = [(1, rep + " filler " + rep)]
        out = _flags(ray_session, rows, bench, n=8)
        assert out.loc[1, "n_hits"] >= 1
        # distinct: hits cannot exceed the benchmark set size
        from ebook_ocr_ray.pipelines.decontam import bench_ngram_set

        assert out.loc[1, "n_hits"] <= len(
            bench_ngram_set([rows[0][1]], 8)
        )

    def test_flagship_bench_members_flag_themselves(self, ray_session):
        from ebook_ocr_ray.pipelines.decontam import BENCH_MOD, decontaminate

        df = decontaminate(SF_SMOKE).to_pandas()
        members = df[df.doc_id % BENCH_MOD == 0]
        assert len(members) > 0
        assert (members.contaminated == 1).all()
        # contamination must not be universal, or the flag is useless
        assert df.contaminated.sum() < len(df)


class TestDecontaminateJoinFallback:
    def test_join_equals_broadcast_on_corpus(self, ray_session):
        """The keyed semi-join fallback (eval set beyond broadcast size)
        must produce exactly the broadcast path's flags over the real
        synthetic corpus, zero-rows included."""
        import ray.data as rd

        from ebook_ocr_ray.pipelines.decontam import (
            BENCH_MOD,
            bench_ngram_set,
            decontaminate_ds,
            decontaminate_ds_join,
        )

        path = f"{SF_SMOKE}/documents.parquet"

        def keep_bench(t):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % BENCH_MOD == 0)).select(["text"])

        docs = rd.read_parquet(path, columns=["doc_id", "text"])
        bench_ds = rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
            keep_bench, batch_format="pyarrow"
        )
        bench_texts = [r["text"] for r in bench_ds.take_all()]
        ref = ray_session.put(bench_ngram_set(bench_texts))

        a = (
            decontaminate_ds(rd.read_parquet(path, columns=["doc_id", "text"]), ref)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            decontaminate_ds_join(docs, bench_ds)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert a.equals(b)
        assert a.contaminated.sum() > 0          # the check is not vacuous

    def test_join_handles_empty_bench(self, ray_session):
        import ray.data as rd

        from ebook_ocr_ray.pipelines.decontam import decontaminate_ds_join

        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["some words here", ""], pa.string())})
        )
        bench = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
        out = decontaminate_ds_join(docs, bench).to_pandas().sort_values("doc_id")
        assert list(out.n_hits) == [0, 0]
        assert list(out.contaminated) == [0, 0]
