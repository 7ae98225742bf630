"""Analytics operators vs DuckDB oracles at sf0.001 (tiny, fast), plus
unit tests for text stats and sketches."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(ours, con, sql):
    oracle = con.execute(sql).df()
    a, b = canon(ours if isinstance(ours, pd.DataFrame) else ours.to_pandas()), canon(oracle)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestRelational:
    def test_q1_pricing(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import q1_pricing
        import __ray_entry__ as e

        assert_matches_oracle(q1_pricing(SF), con, e.oracle_sql()["q1_pricing"])

    def test_events_hourly(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import events_hourly
        import __ray_entry__ as e

        assert_matches_oracle(events_hourly(SF), con, e.oracle_sql()["events_hourly"])

    def test_orders_by_region(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import orders_by_region
        import __ray_entry__ as e

        assert_matches_oracle(orders_by_region(SF), con, e.oracle_sql()["orders_by_region"])

    def test_top_terms(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import top_terms
        import __ray_entry__ as e

        assert_matches_oracle(top_terms(SF), con, e.oracle_sql()["top_terms"])


class TestTextOps:
    def test_token_stats(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import token_table
        import __ray_entry__ as e

        assert_matches_oracle(token_table(SF), con, e.oracle_sql()["token_stats"])

    def test_doc_fingerprint(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import fingerprint_table
        import __ray_entry__ as e

        assert_matches_oracle(fingerprint_table(SF), con, e.oracle_sql()["doc_fingerprint"])

    def test_text_profile_deterministic(self, ray_session):
        from ebook_ocr_ray.pipelines.analytics import text_profile

        a = text_profile(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = text_profile(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestNeighbors:
    def test_knn_brute_matches_oracle(self, ray_session, con):
        from ebook_ocr_ray.pipelines.neighbors import knn_brute
        import __ray_entry__ as e

        assert_matches_oracle(knn_brute(SF), con, e.oracle_sql()["knn_brute"])

    def test_embedding_matrix_equals_pylist_decode(self):
        """The flatten->reshape decode must be value-identical to the
        row-wise to_pylist path on every layout it fast-paths: chunked
        list, sliced list, fixed-size list, sliced fixed-size list.
        (Ragged/null columns can't form a matrix in EITHER path; the
        embedding tables never produce them.)"""
        import numpy as np
        import pyarrow as pa

        from ebook_ocr_ray.pipelines.neighbors import embedding_matrix

        rng = np.random.default_rng(7)
        m = rng.random((10, 8))
        as_list = pa.chunked_array(
            [pa.array(list(m[:6])), pa.array(list(m[6:]))]
        )
        for col in (
            as_list,
            as_list.combine_chunks().slice(2, 5),
            pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float64()), 8
            ),
            pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float64()), 8
            ).slice(3, 4),
        ):
            got = embedding_matrix(col)
            want = np.asarray(col.to_pylist(), dtype=np.float64)
            assert np.array_equal(got, want, equal_nan=True)
        assert embedding_matrix(pa.array([], pa.list_(pa.float64()))).shape == (0, 0)

    def test_knn_ivf_mostly_agrees_with_brute(self, ray_session):
        from ebook_ocr_ray.pipelines.neighbors import knn_brute, knn_ivf

        brute = knn_brute(SF).to_pandas()
        ivf = knn_ivf(SF).to_pandas()
        # approximate search: require >= 60% overlap of neighbor sets
        overlap = 0
        for qid in brute.qid.unique():
            b = set(brute[brute.qid == qid].nid)
            v = set(ivf[ivf.qid == qid].nid)
            overlap += len(b & v) / len(b)
        assert overlap / brute.qid.nunique() >= 0.6

    def test_knn_ivf_prunes_io(self, ray_session, tmp_path, caplog):
        """The cell-partitioned index must make probing read a strict
        subset of the table (true partition pruning, not per-batch
        masking): with one query and nprobe=1, at most 1/n_cells-ish of
        the rows may be opened."""
        import logging
        import re

        from ebook_ocr_ray.pipelines.neighbors import knn_ivf

        with caplog.at_level(logging.INFO, logger="ebook_ocr_ray.pipelines.neighbors"):
            out = knn_ivf(
                SF, n_queries=1, nprobe=1, index_dir=str(tmp_path / "ivf")
            ).to_pandas()
        assert len(out) == 5
        m = [
            re.search(r"reading (\d+) of (\d+) rows", r.message)
            for r in caplog.records
            if "partition pruning" in r.message
        ]
        assert m and m[0]
        rows_read, rows_total = int(m[0].group(1)), int(m[0].group(2))
        assert 0 < rows_read < rows_total / 2

    def test_jaccard_dup_pairs_matches_oracle(self, ray_session, con):
        from ebook_ocr_ray.pipelines.neardup import jaccard_dup_pairs
        import __ray_entry__ as e

        assert_matches_oracle(
            jaccard_dup_pairs(SF), con, e.oracle_sql()["jaccard_dup_pairs"]
        )

    def test_jaccard_rational_threshold_is_exact(self, ray_session, tmp_path):
        """Pair at exactly inter/union == 1/2 must be KEPT (>=), and one
        shingle below must not — the integer compare has no float edge."""
        import pyarrow as pa

        from ebook_ocr_ray.pipelines import neardup

        # doc1/doc2: 4 shingles each, sharing... build texts with known
        # 3-word shingle overlap: "a b c d e f" -> shingles {abc,bcd,cde,def}
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a b c d e f",          # {abc bcd cde def}
                        "a b c d e g",          # {abc bcd cde deg} inter=3 un=5 -> 3/5 >= 1/2 keep
                        "x y z w v u",          # disjoint
                    ],
                    pa.string(),
                ),
            }
        )
        path = tmp_path / "documents.parquet"
        import pyarrow.parquet as pq

        pq.write_table(docs, str(path))
        out = neardup.jaccard_dup_pairs(str(tmp_path)).to_pandas()
        assert list(zip(out.id_a, out.id_b)) == [(1, 2)]
        assert list(out.inter) == [3] and list(out.un) == [5]

    def test_jaccard_df_cap_drops_stop_shingles(self, ray_session, tmp_path):
        """The far side of JACCARD_DF_CAP: a posting list longer than the
        cap is dropped BEFORE pair generation (bounded recall, logged in
        the worker), removing its +1 from every affected pair's
        intersection. Three docs sharing two shingles pair at the default
        cap; with the cap below their df both shared shingles are
        stop-shingles and no pair survives."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ebook_ocr_ray.pipelines import neardup

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                # shingles: {w1w2w3, w2w3w4, w3w4xI} — the first two are
                # shared by ALL three docs (df=3), the last is private
                "text": pa.array(
                    [f"w1 w2 w3 w4 x{i}" for i in (1, 2, 3)], pa.string()
                ),
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        full = neardup.jaccard_dup_pairs(str(tmp_path)).to_pandas()
        assert len(full) == 3 and (full.inter == 2).all()  # inter=2, un=4
        capped = neardup.jaccard_dup_pairs(str(tmp_path), df_cap=2).to_pandas()
        assert len(capped) == 0                  # both shared shingles dropped

    def test_embedding_dup_pairs(self, ray_session, con):
        from ebook_ocr_ray.pipelines.neighbors import embedding_dup_pairs
        import __ray_entry__ as e

        assert_matches_oracle(embedding_dup_pairs(SF), con, e.oracle_sql()["embedding_dup_pairs"])

    def test_embedding_dup_pairs_hot_label_caps_to_star(self, ray_session, tmp_path):
        """A label block bigger than the cap must complete with the star
        fallback (bounded pair volume) instead of going all-pairs: with n
        identical vectors and cap c the pair count is C(c,2) + (n - c),
        not C(n,2)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ebook_ocr_ray.pipelines.neighbors import embedding_dup_pairs

        n, cap = 50, 8
        vec = [1.0, 0.0, 0.0]
        t = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([vec] * n, pa.list_(pa.float32())),
                "label": pa.array([7] * n, pa.int32()),
            }
        )
        pq.write_table(t, tmp_path / "embeddings.parquet")
        df = embedding_dup_pairs(str(tmp_path), max_block=cap).to_pandas()
        assert len(df) == cap * (cap - 1) // 2 + (n - cap)
        # star edges attach every tail id to the block's min id
        tail = df[df.id_b >= cap]
        assert (tail.id_a == 0).all()
        assert (df.id_a < df.id_b).all()


class TestNearDup:
    def test_minhash_finds_planted_near_dups(self, ray_session, tmp_path):
        """Plant exact + near duplicates in a tiny parquet corpus and check
        clustering picks them up."""
        base = "the quick brown fox jumps over the lazy dog and runs far away today " * 4
        rows = [
            {"doc_id": 0, "text": base.strip()},
            {"doc_id": 1, "text": base.strip()},                        # exact dup
            {"doc_id": 2, "text": (base + "extra tail words here").strip()},  # near dup
            {"doc_id": 3, "text": "completely different content about databases and queries"},
        ]
        pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
        from ebook_ocr_ray.pipelines.neardup import minhash_clusters

        out = minhash_clusters(str(tmp_path)).to_pandas()
        c = dict(zip(out.doc_id, out.cluster_id))
        assert c[0] == c[1] == c[2] == 0
        assert c[3] == 3

    def test_simhash_pairs_on_planted_dups(self, ray_session, tmp_path):
        base = "identical words in this document repeated enough times to matter " * 5
        rows = [
            {"doc_id": 10, "text": base.strip()},
            {"doc_id": 11, "text": base.strip()},
            {"doc_id": 12, "text": "unrelated text talking about something else entirely now"},
        ]
        pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
        from ebook_ocr_ray.pipelines.neardup import simhash_pairs

        out = simhash_pairs(str(tmp_path)).to_pandas()
        assert (10, 11) in set(zip(out.id_a, out.id_b))
        assert out[out.hamming == 0].shape[0] >= 1

    def test_simhash_duplicated_doc_id_no_self_pairs(self, ray_session, tmp_path):
        """A doc_id duplicated in the input table must not pair with
        itself (hamming 0) — the simhash kernel carries the same
        within-bucket dedup guard as the LSH kernel."""
        base = "identical words in this document repeated enough times to matter " * 5
        rows = [
            {"doc_id": 10, "text": base.strip()},
            {"doc_id": 10, "text": base.strip()},     # exact duplicate ROW
            {"doc_id": 11, "text": base.strip()},
        ]
        pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
        from ebook_ocr_ray.pipelines.neardup import simhash_pairs

        out = simhash_pairs(str(tmp_path)).to_pandas()
        assert (out.id_a != out.id_b).all()
        assert set(zip(out.id_a, out.id_b)) == {(10, 11)}

    def test_dedup_exact_docs(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import dedup_exact_docs
        import __ray_entry__ as e

        assert_matches_oracle(dedup_exact_docs(SF), con, e.oracle_sql()["dedup_exact_docs"])


class TestSketchUnits:
    def test_minhash_similarity_tracks_jaccard(self):
        from ebook_ocr_ray.functions.sketches import jaccard, minhash_signature

        a = "one two three four five six seven eight nine ten " * 3
        b = a + "extra words at the end of the text"
        sa, sb = minhash_signature(a), minhash_signature(b)
        est = np.mean(sa == sb)
        true = jaccard(a, b)
        assert abs(est - true) < 0.25

    def test_simhash_close_for_similar(self):
        from ebook_ocr_ray.functions.sketches import hamming64, simhash64

        a = "a long document with many stable words inside it " * 4
        b = a + "tiny change"
        assert hamming64(simhash64(a), simhash64(b)) <= 12
        c = "completely different material altogether with other tokens"
        assert hamming64(simhash64(a), simhash64(c)) > 12

    def test_rolling_fingerprint_order_sensitive(self):
        from ebook_ocr_ray.functions.textstats import rolling_fingerprint

        assert rolling_fingerprint("ab cd") != rolling_fingerprint("cd ab")


class TestLabelPropagation:
    def test_chain_and_islands(self, ray_session):
        """Distributed min-label propagation finds components of a chain
        graph (diameter > 1) and leaves islands separate."""
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.neardup import label_propagation_clusters

        # chain 1-2-3-4, pair 10-11, separate pair 20-21
        edges = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([1, 2, 3, 10, 20], pa.int64()),
                    "id_b": pa.array([2, 3, 4, 11, 21], pa.int64()),
                }
            )
        )
        out = label_propagation_clusters(edges).to_pandas()
        labels = dict(zip(out.node, out.label))
        assert labels[1] == labels[2] == labels[3] == labels[4] == 1
        assert labels[10] == labels[11] == 10
        assert labels[20] == labels[21] == 20

    def test_matches_union_find_on_minhash_candidates(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.neardup import (
            label_propagation_clusters,
            minhash_clusters,
        )

        base = "the quick brown fox jumps over the lazy dog and runs far away today " * 4
        rows = [
            {"doc_id": 0, "text": base.strip()},
            {"doc_id": 1, "text": base.strip()},
            {"doc_id": 2, "text": (base + "extra tail words here").strip()},
            {"doc_id": 3, "text": "completely different content about databases and queries"},
        ]
        pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
        uf = minhash_clusters(str(tmp_path)).to_pandas()
        uf_map = dict(zip(uf.doc_id, uf.cluster_id))
        edges = rd.from_arrow(
            pa.table({"id_a": pa.array([0, 0], pa.int64()),
                      "id_b": pa.array([1, 2], pa.int64())})
        )
        lp = label_propagation_clusters(edges).to_pandas()
        lp_map = dict(zip(lp.node, lp.label))
        for d in (0, 1, 2):
            assert lp_map[d] == uf_map[d] == 0

    def test_keyed_variant_matches_broadcast(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.neardup import (
            label_propagation_clusters,
            label_propagation_keyed,
        )

        edges = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([1, 2, 3, 10, 20, 5], pa.int64()),
                    "id_b": pa.array([2, 3, 4, 11, 21, 6], pa.int64()),
                }
            )
        )
        a = label_propagation_clusters(edges).to_pandas().sort_values("node").reset_index(drop=True)
        b = label_propagation_keyed(edges).to_pandas().sort_values("node").reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)


class TestHotBucketCap:
    def test_overflow_bucket_linear_and_connected(self, ray_session):
        """One degenerate bucket of 100 ids with cap 16: pair count is
        triangle(16) + star(84) = 204, not triangle(100) = 4950, and the
        chain keeps every id reachable (one component)."""
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.neardup import (
            candidate_pair_dataset,
            label_propagation_keyed,
        )

        n = 100
        buckets = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(n)), pa.int64()),
                    "band": pa.array([0] * n, pa.int32()),
                    "key": pa.array([7] * n, pa.int64()),
                }
            )
        )
        pairs = candidate_pair_dataset(buckets, max_bucket=16).materialize()
        assert pairs.count() == 16 * 15 // 2 + (n - 16)
        labels = label_propagation_keyed(pairs, num_partitions=2).to_pandas()
        assert labels.label.nunique() == 1          # star keeps one component
        assert set(labels.node) == set(range(n))

    def test_identical_docs_cluster_despite_cap(self, ray_session, tmp_path):
        """Exact duplicates overflowing the all-pairs cap still cluster
        together via the chain fallback (every chain link verifies)."""
        import pandas as pd

        from ebook_ocr_ray.pipelines import neardup

        n = 40
        rows = [{"doc_id": i, "text": "the very same text body for every document here"}
                for i in range(n)]
        pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
        old = neardup.MAX_BUCKET
        neardup.MAX_BUCKET = 8
        try:
            out = neardup.minhash_clusters(str(tmp_path), num_partitions=2).to_pandas()
        finally:
            neardup.MAX_BUCKET = old
        assert (out.cluster_id == 0).all()


class TestCodeReviewRound2:
    def test_long_chain_converges_broadcast(self, ray_session):
        """A 15-node chain (diameter 14) must fully converge — round-2
        review found the old max_iters=10 default silently returned wrong
        labels for components deeper than 10."""
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.neardup import label_propagation_clusters

        n = 15
        edges = rd.from_arrow(
            pa.table({"id_a": pa.array(list(range(n - 1)), pa.int64()),
                      "id_b": pa.array(list(range(1, n)), pa.int64())})
        )
        out = label_propagation_clusters(edges).to_pandas()
        assert (out.label == 0).all()

    def test_chain_converges_keyed(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.neardup import label_propagation_keyed

        n = 8
        edges = rd.from_arrow(
            pa.table({"id_a": pa.array(list(range(n - 1)), pa.int64()),
                      "id_b": pa.array(list(range(1, n)), pa.int64())})
        )
        out = label_propagation_keyed(edges, num_partitions=2).to_pandas()
        assert (out.label == 0).all()

    def test_empty_docs_never_near_dup_candidates(self, ray_session, tmp_path):
        """Empty/whitespace docs share the sentinel sketch values but must
        NOT cluster together (they are not duplicates of each other)."""
        import pandas as pd

        from ebook_ocr_ray.pipelines.neardup import minhash_clusters, simhash_pairs

        rows = [
            {"doc_id": 0, "text": ""},
            {"doc_id": 1, "text": "   "},
            {"doc_id": 2, "text": "genuinely real content with several words here"},
        ]
        pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
        clusters = minhash_clusters(str(tmp_path)).to_pandas()
        assert dict(zip(clusters.doc_id, clusters.cluster_id)) == {0: 0, 1: 1, 2: 2}
        assert len(simhash_pairs(str(tmp_path)).to_pandas()) == 0

    def test_safe_join_keeps_negative_keys(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.joins import safe_join

        left = rd.from_arrow(pa.table({"k": pa.array([-5, 3], pa.int64()),
                                       "v": ["neg", "pos"]}))
        right = rd.from_arrow(pa.table({"kk": pa.array([-5, 3], pa.int64()),
                                        "w": ["NEG", "POS"]}))
        out = (
            safe_join(left, right, on="k", right_on="kk", num_partitions=4)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert list(out.k) == [-5, 3]
        assert list(out.w) == ["NEG", "POS"]


class TestTrainingDataOps:
    """Round-2 additions: sessionization, per-group top-k, histogram
    quantiles, PII redaction, tf-idf — each against its oracle SQL plus
    one behavioral edge apiece."""

    def test_sessionize_matches_oracle(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import sessionize
        import __ray_entry__ as e

        assert_matches_oracle(sessionize(SF), con, e.oracle_sql()["sessionize"])

    def test_sessionize_splits_on_gap(self, ray_session):
        """Two bursts 31 minutes apart must land in different sessions."""
        import ray.data
        from ebook_ocr_ray.pipelines.analytics import sessionize

        base = pd.Timestamp("2026-01-01 00:00:00")
        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [7, 7, 7, 7],
                "ts": [base, base + pd.Timedelta(minutes=1),
                       base + pd.Timedelta(minutes=32),
                       base + pd.Timedelta(minutes=33)],
                "value": [1.0, 2.0, 3.0, 4.0],
            }
        )
        import os, tempfile
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            out = sessionize(d).to_pandas().sort_values("session_idx")
        assert out.session_idx.tolist() == [1, 2]
        assert out.n_events.tolist() == [2, 2]
        assert out.value_cents.tolist() == [300, 700]

    def test_top_docs_per_source(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import top_docs_per_source
        import __ray_entry__ as e

        out = top_docs_per_source(SF)
        assert_matches_oracle(out, con, e.oracle_sql()["top_docs_per_source"])

    def test_token_quantiles(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import token_quantiles_per_source
        import __ray_entry__ as e

        assert_matches_oracle(
            token_quantiles_per_source(SF), con, e.oracle_sql()["token_quantiles"]
        )

    def test_redact_pii(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import redact_pii
        import __ray_entry__ as e

        out = redact_pii(SF).to_pandas()
        assert_matches_oracle(out, con, e.oracle_sql()["redact_pii"])
        # every row was contaminated with exactly one email + one phone
        assert (out.n_emails == 1).all() and (out.n_phones == 1).all()
        assert out.clean_text.str.contains("<EMAIL>").all()
        assert out.clean_text.str.contains("<PHONE>").all()
        assert not out.clean_text.str.contains("@").any()

    def test_tfidf_top_terms(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import tfidf_top_terms
        import __ray_entry__ as e

        out = tfidf_top_terms(SF).to_pandas()
        assert_matches_oracle(out, con, e.oracle_sql()["tfidf_top_terms"])
        assert (out.groupby("source").size() <= 5).all()


class TestStratifiedSample:
    def test_matches_oracle(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import stratified_sample
        import __ray_entry__ as e

        assert_matches_oracle(
            stratified_sample(SF), con, e.oracle_sql()["stratified_sample"]
        )

    def test_rates_and_determinism(self, ray_session):
        from ebook_ocr_ray.pipelines.analytics import stratified_sample

        a = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)          # rerun-stable, no RNG
        kept = a.groupby("source").size()
        # src0 keeps everything (threshold 256 >= any byte)
        import pyarrow.parquet as pq

        total = pq.read_table(f"{SF}/documents.parquet", columns=["source"])
        totals = total.to_pandas().groupby("source").size()
        assert kept.get("src0", 0) == totals["src0"]
        # lower-tier sources keep strictly less
        assert kept.get("src3", 0) < totals["src3"]


class TestRangeJoin:
    def test_clicks_before_purchase_matches_oracle(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import clicks_before_purchase
        import __ray_entry__ as e

        assert_matches_oracle(
            clicks_before_purchase(SF), con, e.oracle_sql()["clicks_before_purchase"]
        )

    def test_window_is_half_open(self, ray_session):
        """A click exactly AT the purchase timestamp is outside [t-w, t);
        one exactly w before is inside."""
        import os, tempfile
        from ebook_ocr_ray.pipelines.analytics import clicks_before_purchase

        t = pd.Timestamp("2026-01-01 12:00:00")
        w = pd.Timedelta(hours=1)
        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [9, 9, 9, 9],
                "ts": [t - w, t - pd.Timedelta(minutes=5), t, t],
                "event_type": ["click", "click", "click", "purchase"],
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            out = clicks_before_purchase(d).to_pandas()
        assert out.event_id.tolist() == [4]
        assert out.n_clicks.tolist() == [2]       # at-boundary in, at-ts out


class TestEmptyInputs:
    """Empty tables must yield empty results, not KeyErrors — Ray's empty
    aggregate frames drop their columns, which is easy to trip over."""

    @pytest.fixture()
    def empty_dir(self, tmp_path):
        pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "ts": pd.Series(dtype="datetime64[us]"),
                "value": pd.Series(dtype="float64"),
                "event_type": pd.Series(dtype="object"),
            }
        ).to_parquet(tmp_path / "events.parquet")
        pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "source": pd.Series(dtype="object"),
                "text": pd.Series(dtype="object"),
                "n_chars": pd.Series(dtype="int64"),
            }
        ).to_parquet(tmp_path / "documents.parquet")
        return str(tmp_path)

    def test_all_new_operators_handle_empty(self, ray_session, empty_dir):
        from ebook_ocr_ray.pipelines.analytics import (
            clicks_before_purchase,
            redact_pii,
            sessionize,
            stratified_sample,
            tfidf_top_terms,
            token_quantiles_per_source,
            top_docs_per_source,
        )

        from ebook_ocr_ray.pipelines.analytics import (
            chunk_documents,
            pack_sequences,
            repetition_profile,
        )

        for fn in (sessionize, clicks_before_purchase, top_docs_per_source,
                   token_quantiles_per_source, tfidf_top_terms, redact_pii,
                   stratified_sample, chunk_documents, pack_sequences,
                   repetition_profile):
            assert len(fn(empty_dir).to_pandas()) == 0, fn.__name__


class TestTfidfJoinStrategy:
    def test_join_path_equals_broadcast_path(self, ray_session):
        """The at-scale keyed-join df path must produce exactly the
        broadcast path's output (hash collisions filtered by the
        post-join term-equality check)."""
        from ebook_ocr_ray.pipelines.analytics import tfidf_top_terms

        a = canon(tfidf_top_terms(SF, df_strategy="broadcast").to_pandas())
        b = canon(tfidf_top_terms(SF, df_strategy="join").to_pandas())
        pd.testing.assert_frame_equal(a, b)


class TestHotBucketJoinStrategy:
    def test_join_path_equals_broadcast_for_both_sketches(self, ray_session):
        """The at-scale keyed-semi-join hot-bucket filter must reproduce
        the broadcast filter's results exactly (mixed-key collisions are
        re-checked on (band, key) after the join)."""
        from ebook_ocr_ray.pipelines.neardup import minhash_clusters, simhash_pairs

        a = canon(minhash_clusters(SF, hot_strategy="broadcast").to_pandas())
        b = canon(minhash_clusters(SF, hot_strategy="join").to_pandas())
        pd.testing.assert_frame_equal(a, b)

        a = canon(simhash_pairs(SF, hot_strategy="broadcast").to_pandas())
        b = canon(simhash_pairs(SF, hot_strategy="join").to_pandas())
        pd.testing.assert_frame_equal(a, b)


class TestChunking:
    def test_matches_oracle(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import chunk_documents
        import __ray_entry__ as e

        assert_matches_oracle(
            chunk_documents(SF), con, e.oracle_sql()["chunk_documents"]
        )

    def test_window_geometry(self, ray_session):
        """Consecutive chunks overlap by exactly `overlap` words and
        reassemble to the original text."""
        from ebook_ocr_ray.pipelines.analytics import chunk_documents

        out = chunk_documents(SF, chunk_tokens=10, overlap=3).to_pandas()
        one = out[out.doc_id == out.doc_id.iloc[0]].sort_values("chunk_idx")
        words = []
        for i, r in enumerate(one.itertuples()):
            piece = r.chunk_text.split(" ")
            assert r.n_tokens == len(piece) <= 10
            if i == 0:
                words = piece
            else:
                assert words[-3:] == piece[:3]        # overlap region agrees
                words.extend(piece[3:])
        # stride of 7: every word is covered exactly once after overlap strip
        import pyarrow.parquet as pq

        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        original = docs[docs.doc_id == one.doc_id.iloc[0]].text.iloc[0]
        assert " ".join(words) == original

    def test_overlap_must_be_smaller(self):
        import pytest
        from ebook_ocr_ray.pipelines.analytics import chunk_documents

        with pytest.raises(ValueError):
            chunk_documents("/tmp", chunk_tokens=8, overlap=8)


class TestSequencePacking:
    def test_matches_oracle(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import pack_sequences
        import __ray_entry__ as e

        assert_matches_oracle(
            pack_sequences(SF), con, e.oracle_sql()["pack_sequences"]
        )

    def test_budget_respected_and_dense(self, ray_session):
        from ebook_ocr_ray.pipelines.analytics import pack_sequences

        out = pack_sequences(SF).to_pandas()
        per_seq = out.groupby(["bucket", "seq_idx"]).n_tokens.sum()
        # a sequence exceeds the budget only when a single chunk does
        multi = out.groupby(["bucket", "seq_idx"]).size()
        assert (per_seq[multi > 1] <= 128).all()
        # greedy density: consecutive sequences could not be merged
        for (b, s), tok in per_seq.items():
            nxt = per_seq.get((b, s + 1))
            if nxt is not None:
                first_next = out[(out.bucket == b) & (out.seq_idx == s + 1)]\
                    .sort_values(["doc_id", "chunk_idx"]).n_tokens.iloc[0]
                assert tok + first_next > 128


class TestRepetitionProfile:
    def test_matches_oracle(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import repetition_profile
        import __ray_entry__ as e

        assert_matches_oracle(
            repetition_profile(SF), con, e.oracle_sql()["repetition_profile"]
        )

    def test_fully_repetitive_doc_scores_high(self, ray_session, tmp_path):
        from ebook_ocr_ray.pipelines.analytics import repetition_profile

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["spam " * 50 + "spam", "all distinct words here now ok"],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        out = repetition_profile(str(tmp_path)).to_pandas().set_index("doc_id")
        assert out.loc[1].rep_milli == 1000      # every 4-gram duplicated
        assert out.loc[2].rep_milli == 0
        assert out.loc[2].max_gram_count == 1


class TestHyperLogLog:
    def test_matches_oracle(self, ray_session, con):
        from ebook_ocr_ray.pipelines.analytics import distinct_terms_hll
        import __ray_entry__ as e

        assert_matches_oracle(
            distinct_terms_hll(SF), con, e.oracle_sql()["distinct_terms_hll"]
        )

    def test_estimate_accuracy_and_merge(self):
        """m=4096 gives ~1.6% standard error; assert a generous 5% bound
        at several cardinalities, and that merging split sketches equals
        sketching the union (the property the keyed Max relies on)."""
        import numpy as np
        from ebook_ocr_ray.functions.sketches import (
            hll_estimate,
            hll_merge,
            hll_partial,
        )

        for n in (1000, 20000, 100000):
            vals = [f"v{i}" for i in range(n)]
            est = hll_estimate(hll_partial(vals))
            assert abs(est - n) / n < 0.05, (n, est)
            half = n // 2
            merged = hll_merge(hll_partial(vals[:half]), hll_partial(vals[half:]))
            np.testing.assert_array_equal(merged, hll_partial(vals))

    def test_small_range_linear_counting(self):
        from ebook_ocr_ray.functions.sketches import hll_estimate, hll_partial

        est = hll_estimate(hll_partial([f"x{i}" for i in range(50)]))
        assert abs(est - 50) <= 2                # linear counting is near-exact


class TestFuzzyExactDedup:
    def _run(self, ray, rows):
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.analytics import dedup_fuzzy_exact_ds

        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )
        return dedup_fuzzy_exact_ds(docs).to_pandas().set_index("doc_id").sort_index()

    def test_variants_collapse_to_min_id(self, ray_session):
        rows = [
            (5, "Hello,  World! This is DOC one."),
            (2, "hello world this is doc one"),          # survivor (min id)
            (9, "HELLO WORLD — this is doc one?!"),      # non-ascii dash strips
            (7, "a completely different document"),
        ]
        out = self._run(ray_session, rows)
        assert list(out.index) == [2, 7]
        assert out.loc[2, "n_variants"] == 3
        assert out.loc[7, "n_variants"] == 1

    def test_whitespace_and_empty(self, ray_session):
        rows = [(1, "   "), (2, ""), (3, "!!!"), (4, "real text")]
        # all three normalize to '' -> one survivor (min id 1)
        out = self._run(ray_session, rows)
        assert list(out.index) == [1, 4]
        assert out.loc[1, "n_variants"] == 3

    def test_normalize_function(self):
        from ebook_ocr_ray.pipelines.analytics import fuzzy_normalize

        # tab is stripped (not a space), leaving "a  bc" -> collapse
        assert fuzzy_normalize("A  B\tC") == "a bc"
        assert fuzzy_normalize("Hello,  World!") == "hello world"
        assert fuzzy_normalize(None) == ""
        assert fuzzy_normalize("  x  ") == "x"

    def test_query_wrapper_collapses_perturbed_union(self, ray_session):
        from ebook_ocr_ray.pipelines.analytics import dedup_fuzzy_exact

        out = dedup_fuzzy_exact(SF).to_pandas()
        import pyarrow.parquet as pq

        n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
        assert len(out) == n                       # every pair collapsed
        assert (out["n_variants"] == 2).all()
        from ebook_ocr_ray.pipelines.analytics import VARIANT_ID_BIT

        assert (out["doc_id"] < VARIANT_ID_BIT).all()  # original id survives


class TestRebalanceLangs:
    def _ds(self, rows):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "lang": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    def test_small_groups_pass_through_exactly(self, ray_session):
        from ebook_ocr_ray.pipelines.analytics import rebalance_langs_ds

        rows = [(i, "fr") for i in range(10)] + [(100 + i, "en") for i in range(400)]
        out = rebalance_langs_ds(self._ds(rows), cap=50).to_pandas()
        fr = out[out.lang == "fr"]
        assert len(fr) == 10                               # under cap: all kept
        en = out[out.lang == "en"]
        # Bernoulli(50/400) over 400 docs: generous 4-sigma band
        assert 25 <= len(en) <= 85, len(en)

    def test_deterministic_and_reshard_stable(self, ray_session):
        from ebook_ocr_ray.pipelines.analytics import rebalance_langs_ds

        rows = [(i, "en") for i in range(300)]
        a = rebalance_langs_ds(self._ds(rows), cap=60).to_pandas()
        b = (
            rebalance_langs_ds(self._ds(rows).repartition(7), cap=60)
            .to_pandas()
        )
        assert sorted(a.doc_id) == sorted(b.doc_id)

    def test_cap_at_group_size_is_identity(self, ray_session):
        from ebook_ocr_ray.pipelines.analytics import rebalance_langs_ds

        rows = [(i, "de") for i in range(40)]
        out = rebalance_langs_ds(self._ds(rows), cap=40).to_pandas()
        assert len(out) == 40


class TestDedupSemantic:
    def test_planted_clusters_and_singletons(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ebook_ocr_ray.pipelines.neighbors import dedup_semantic

        # vecs 0,1,2 identical (one cluster, survivor 0); 3,4 identical
        # in another label (survivor 3); 5 orthogonal singleton
        rows = [
            (0, [1.0, 0.0], 1), (1, [1.0, 0.0], 1), (2, [1.0, 0.0], 1),
            (3, [0.0, 1.0], 2), (4, [0.0, 1.0], 2),
            (5, [1.0, 0.0], 2),            # same label as 3/4 but orthogonal
        ]
        t = pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        )
        pq.write_table(t, tmp_path / "embeddings.parquet")
        out = (
            dedup_semantic(str(tmp_path))
            .to_pandas().set_index("vec_id").sort_index()
        )
        assert out.to_dict()["cluster_size"] == {0: 3, 3: 2, 5: 1}

    def test_no_pairs_all_singletons(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ebook_ocr_ray.pipelines.neighbors import dedup_semantic

        t = pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float32())),
                "label": pa.array([1, 1], pa.int32()),
            }
        )
        pq.write_table(t, tmp_path / "embeddings.parquet")
        out = dedup_semantic(str(tmp_path)).to_pandas()
        assert sorted(out.vec_id) == [1, 2]
        assert (out.cluster_size == 1).all()


class TestRebalanceNullGroup:
    def test_null_group_is_capped_too(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ebook_ocr_ray.pipelines.analytics import rebalance_langs_ds

        rows = pa.table(
            {
                "doc_id": pa.array(list(range(300)), pa.int64()),
                "lang": pa.array([None] * 290 + ["fr"] * 10, pa.string()),
            }
        )
        out = rebalance_langs_ds(rd.from_arrow(rows), cap=50).to_pandas()
        nulls = out[out.lang.isna()]
        # the dominant null slice must NOT be exempt from the cap
        assert 20 <= len(nulls) <= 85, len(nulls)
        assert len(out[out.lang == "fr"]) == 10


class TestKnnEmptyQuerySpace:
    def test_offset_id_space_returns_empty_typed_result(
        self, ray_session, tmp_path
    ):
        """An embeddings table whose vec_ids all exceed n_queries selects
        zero query rows: knn must return an empty (qid, nid, rank)
        result, not crash normalizing a 0-row matrix."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ebook_ocr_ray.pipelines.neighbors import knn_brute

        sf = tmp_path / "sf"
        sf.mkdir()
        rng = np.random.RandomState(0)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(1000, 1020), pa.int64()),
                    "embedding": pa.array(
                        [rng.rand(8).tolist() for _ in range(20)],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
            str(sf / "embeddings.parquet"),
        )
        ds = knn_brute(str(sf), n_queries=10, k=3)
        assert ds.count() == 0
        assert sorted(ds.schema().names) == ["nid", "qid", "rank"]
