"""The composed training-data job: value equality against an explicit
stage-by-stage composition of the public per-stage APIs, plus the
spool-wave claim discipline."""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import SF_SMOKE


def _write_docs_table(df: pd.DataFrame, root: str) -> str:
    os.makedirs(root, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "text": pa.array(df["text"], pa.string()),
            }
        ),
        os.path.join(root, "documents.parquet"),
    )
    return root


def _stagewise(sf_dir: str, tmp_path) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """The same composition, built stage by stage from the PUBLIC
    per-stage operators with explicit materialization between stages —
    the independent witness the one-chain job must equal."""
    import ray
    import ray.data as rd

    from ebook_ocr_ray.functions.textstats import stable_hash63
    from ebook_ocr_ray.pipelines.analytics import chunk_documents, pack_sequences
    from ebook_ocr_ray.pipelines.decontam import (
        BENCH_MOD,
        bench_ngram_set,
        decontaminate_ds,
    )
    from ebook_ocr_ray.pipelines.extraction import extraction_pipeline
    from ebook_ocr_ray.pipelines.neardup import minhash_clusters_cascade
    from ebook_ocr_ray.pipelines.quality import gopher_rule_stats

    ext = extraction_pipeline(sf_dir, with_duplicates=True).to_pandas()
    docs = pd.DataFrame(
        {
            "doc_id": [stable_hash63(u) for u in ext.url],
            "text": ext.extracted_text.astype(str),
        }
    )

    def to_ds(df: pd.DataFrame) -> "rd.Dataset":
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(df["doc_id"], pa.int64()),
                    "text": pa.array(df["text"], pa.string()),
                }
            )
        )

    stats = gopher_rule_stats(to_ds(docs)).to_pandas()
    kept = docs.merge(stats.loc[stats.keep == 1, ["doc_id"]], on="doc_id")

    kdir = _write_docs_table(kept, str(tmp_path / "sw_kept"))
    clusters = minhash_clusters_cascade(kdir, fuzzy=True).to_pandas()
    reps = set(clusters.loc[clusters.doc_id == clusters.cluster_id, "doc_id"])
    surv = kept[kept.doc_id.isin(reps)]

    bench_texts = kept.loc[kept.doc_id % BENCH_MOD == 0, "text"].tolist()
    bench_ref = ray.put(bench_ngram_set(bench_texts))
    flags = decontaminate_ds(to_ds(surv), bench_ref).to_pandas()
    clean = set(flags.loc[flags.contaminated == 0, "doc_id"])
    final = surv[surv.doc_id.isin(clean) & (surv.doc_id % BENCH_MOD != 0)]

    fdir = _write_docs_table(final, str(tmp_path / "sw_final"))
    chunks = chunk_documents(fdir).to_pandas()
    pack = pack_sequences(fdir).to_pandas()
    return final, chunks, pack


def _sorted(df: pd.DataFrame, by: list[str]) -> pd.DataFrame:
    return df.sort_values(by, kind="mergesort").reset_index(drop=True)


class TestComposedEqualsStagewise:
    def test_job_equals_stage_by_stage(self, ray_session, tmp_path):
        from ebook_ocr_ray.pipelines.trainjob import training_data_job

        out = training_data_job(SF_SMOKE, str(tmp_path / "scratch"))
        got_docs = _sorted(out["docs"].to_pandas(), ["doc_id"])
        got_chunks = _sorted(out["chunks"].to_pandas(), ["doc_id", "chunk_idx"])
        got_pack = _sorted(
            out["pack"].to_pandas(), ["bucket", "seq_idx", "doc_id", "chunk_idx"]
        )

        want_docs, want_chunks, want_pack = _stagewise(SF_SMOKE, tmp_path)
        pd.testing.assert_frame_equal(
            got_docs, _sorted(want_docs, ["doc_id"]), check_dtype=False
        )
        pd.testing.assert_frame_equal(
            got_chunks, _sorted(want_chunks, ["doc_id", "chunk_idx"])
        )
        pd.testing.assert_frame_equal(
            got_pack, _sorted(want_pack, ["bucket", "seq_idx", "doc_id", "chunk_idx"])
        )
        # every stage filtered something (the composition is non-trivial)
        assert 0 < len(got_docs) < 500
        assert len(got_chunks) == len(got_pack) > len(got_docs)

    def test_spool_wave_discipline(self, ray_session, tmp_path):
        """The job's corpus-sized intermediates live as claimed spool
        waves: the wave dirs exist afterwards, successful claims are
        released, and re-running into the same scratch refuses (dirty
        spool) instead of silently appending."""
        from ebook_ocr_ray.pipelines.trainjob import training_data_job

        scratch = str(tmp_path / "scratch")
        out = training_data_job(SF_SMOKE, scratch)
        out["pack"].to_pandas()
        for wave in ("clean/documents.parquet", "final/documents.parquet"):
            assert os.path.isdir(os.path.join(scratch, wave))
            assert not os.path.exists(os.path.join(scratch, wave) + ".claim")
        with pytest.raises(ValueError, match="not empty|claimed"):
            training_data_job(SF_SMOKE, scratch)

    def test_degenerate_corpus_returns_empty_typed_outputs(
        self, ray_session, tmp_path
    ):
        """A corpus where EVERY doc fails the Gopher word-count floor
        empties the clean wave; write_parquet of an empty dataset leaves
        no files, so the job must return typed zero-row handles instead
        of crashing on the file-less wave read."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ebook_ocr_ray.pipelines.trainjob import training_data_job

        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(10), pa.int64()),
                    "text": pa.array(["too short"] * 10, pa.string()),
                    "lang": pa.array(["en"] * 10, pa.string()),
                }
            ),
            str(sf / "documents.parquet"),
        )
        out = training_data_job(str(sf), str(tmp_path / "scratch"))
        assert out["docs"].count() == 0
        assert out["chunks"].count() == 0
        assert out["pack"].count() == 0
        assert out["chunks"].schema().names == [
            "doc_id", "chunk_idx", "chunk_text", "n_tokens",
        ]
