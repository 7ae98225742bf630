"""Property-based invariants (hypothesis): the synth -> extract round trip
holds for arbitrary word-soup documents, and core pure functions keep
their contracts under random input."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ebook_ocr_ray.config import ExtractionConfig
from ebook_ocr_ray.sources.pages import expected_extraction, synth_html, synth_pdf
from ebook_ocr_ray.stages.extract import extract_one

# word-soup alphabet mirroring the documents table: lowercase words, no
# punctuation, single-space separated
WORDS = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=10),
    min_size=1,
    max_size=120,
).map(" ".join)

# the extraction round trip contract matches the driver corpus: bodies are
# >= 6 chars (the short-ASCII garbage rule eats shorter spans — frozen
# reference semantics, src/rover/line_processing.py:79-81)
BODY = WORDS.filter(lambda t: len(t) > 5)

CFG = ExtractionConfig()


class TestRoundTripProperties:
    @settings(max_examples=60, deadline=None)
    @given(doc_id=st.integers(min_value=0, max_value=10**7), text=BODY)
    def test_html_round_trip(self, doc_id, text):
        got, heads, *_ = extract_one(synth_html(doc_id, text), CFG)
        # garbage rule 4 can eat a line with a >=5 char run — exclude by
        # construction? No: assert the invariant the generator guarantees
        import re

        if re.search(r"(.)\1{4}", text):
            return  # outside the generator's contract (driver data has none)
        assert got == expected_extraction(doc_id, text)
        assert heads == [f"Document {doc_id:,}"]

    @settings(max_examples=40, deadline=None)
    @given(doc_id=st.integers(min_value=0, max_value=10**7), text=BODY)
    def test_pdf_round_trip(self, doc_id, text):
        got, *_ = extract_one(synth_pdf(doc_id, text), CFG)
        assert got == expected_extraction(doc_id, text)

    @settings(max_examples=40, deadline=None)
    @given(text=WORDS)
    def test_extraction_deterministic(self, text):
        a = extract_one(synth_html(1, text), CFG)
        b = extract_one(synth_html(1, text), CFG)
        assert a == b


class TestPureFunctionProperties:
    @settings(max_examples=60, deadline=None)
    @given(texts=st.lists(st.text(min_size=0, max_size=40), min_size=0, max_size=4))
    def test_char_table_never_exceeds_base(self, texts):
        from ebook_ocr_ray.functions.voting import build_char_table

        named = {f"s{i}": t for i, t in enumerate(texts)}
        slots = build_char_table(named)
        longest = max((len(t) for t in texts if t), default=0)
        assert len(slots) == longest

    @settings(max_examples=60, deadline=None)
    @given(
        ys=st.lists(st.floats(min_value=0, max_value=10000, allow_nan=False), max_size=30)
    )
    def test_row_clustering_partitions_all_spans(self, ys):
        from ebook_ocr_ray.functions.lines import make_span, rows_from_spans

        spans = [make_span("x", 0, y - 5, 8, y + 5, 1.0) for y in ys]
        rows = rows_from_spans(spans)
        assert sum(len(r.spans) for r in rows) == len(spans)
        # rows come out in ascending y order
        centers = [r.yc for r in rows]
        assert centers == sorted(centers)

    @settings(max_examples=60, deadline=None)
    @given(paras=st.lists(st.text(alphabet="ab .", min_size=0, max_size=12), max_size=8))
    def test_continuation_merge_preserves_content(self, paras):
        from ebook_ocr_ray.functions.bookparse import merge_continuations

        merged = merge_continuations(paras)
        # no characters are lost or invented (modulo stripped edges)
        assert "".join(merged).replace(" ", "") == "".join(
            p.strip() for p in paras
        ).replace(" ", "")

    @settings(max_examples=40, deadline=None)
    @given(a=WORDS, b=WORDS)
    def test_jaccard_bounds_and_symmetry(self, a, b):
        from ebook_ocr_ray.functions.sketches import jaccard

        j = jaccard(a, b)
        assert 0.0 <= j <= 1.0
        assert jaccard(b, a) == j
        assert jaccard(a, a) == 1.0


class TestSurvivorAggregateProperties:
    """The keyed dedup aggregate must be partition-invariant: however the
    rows of one content_sha group are split into blocks, the folded
    (global min key, count at that key) accumulator equals the brute
    force over the whole multiset — this is the property that makes
    cross-block byte-identical tie detection correct under ANY Ray block
    layout."""

    @settings(max_examples=120, deadline=None)
    @given(
        keys=st.lists(
            st.text(alphabet="0123456789", min_size=3, max_size=3).map(
                lambda d: f"{d}|https://x/{d}"
            ),
            min_size=1,
            max_size=12,
        ),
        cuts=st.lists(st.integers(min_value=1, max_value=11), max_size=4),
        data=st.data(),
    )
    def test_partition_invariant(self, keys, cuts, data):
        import pyarrow as pa

        from ebook_ocr_ray.pipelines.extraction import _make_survivor_agg

        agg = _make_survivor_agg()

        # brute force over the whole multiset
        kmin = min(keys)
        want = (sum(1 for k in keys if k == kmin), kmin)

        # arbitrary partition into blocks (cut points), arbitrary fold order
        points = sorted({c for c in cuts if c < len(keys)})
        blocks, prev = [], 0
        for p in points + [len(keys)]:
            if p > prev:
                blocks.append(keys[prev:p])
                prev = p
        order = data.draw(st.permutations(range(len(blocks))))

        acc = "0:~"                                       # zero sentinel
        for i in order:
            block = blocks[i]
            bmin = min(block)
            partial = pa.table(
                {
                    "min_key": pa.array([bmin], pa.string()),
                    "n_min": pa.array(
                        [sum(1 for k in block if k == bmin)], pa.int64()
                    ),
                }
            )
            acc = agg.combine(acc, agg.aggregate_block(partial))
        na, k = acc.split(":", 1)
        assert (int(na), k) == want

    @settings(max_examples=60, deadline=None)
    @given(
        parts=st.lists(
            st.tuples(
                st.text(alphabet="049", min_size=2, max_size=2).map(
                    lambda d: f"{d}|u"
                ),
                st.integers(min_value=1, max_value=5),
            ),
            min_size=2,
            max_size=6,
        )
    )
    def test_combine_associative_and_commutative(self, parts):
        from ebook_ocr_ray.pipelines.extraction import _make_survivor_agg

        agg = _make_survivor_agg()
        encs = [f"{n}:{k}" for k, n in parts]
        a, b = encs[0], encs[1]
        assert agg.combine(a, b) == agg.combine(b, a)
        if len(encs) >= 3:
            c = encs[2]
            assert agg.combine(agg.combine(a, b), c) == agg.combine(
                a, agg.combine(b, c)
            )


class TestBatchSketchProperties:
    """Property check: the vectorized batch sketch kernels agree with the
    frozen per-doc functions on ARBITRARY text (the fixed-example
    equivalence test can't cover unicode, long runs of spaces, huge
    words, or mixed empty/non-empty batches)."""

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs",)),
                max_size=120,
            ),
            min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_minhash_and_simhash_batch_equivalence(self, texts):
        import numpy as np

        from ebook_ocr_ray.functions.sketches import (
            lsh_band_keys,
            lsh_band_keys_batch,
            minhash_signature,
            minhash_signatures_batch,
            simhash64,
            simhash64_batch,
        )

        sigs = minhash_signatures_batch(texts, k=3)
        keys = lsh_band_keys_batch(sigs)
        prints = simhash64_batch(texts)
        for i, t in enumerate(texts):
            np.testing.assert_array_equal(sigs[i], minhash_signature(t, k=3))
            assert keys[i].tolist() == [k for _, k in lsh_band_keys(sigs[i])]
            assert int(prints[i]) == simhash64(t)


class TestRound4Properties:
    @settings(max_examples=100, deadline=None)
    @given(text=WORDS)
    def test_fuzzy_normalize_idempotent_and_perturbation_invariant(self, text):
        """The fuzzy-dedup key contract: normalization is idempotent, and
        the cascade's target perturbations (case flips, punctuation
        insertion, space runs, trailing junk) never change the key."""
        from ebook_ocr_ray.pipelines.analytics import fuzzy_normalize
        from ebook_ocr_ray.pipelines.neardup import _fuzzy_text_keys

        base = fuzzy_normalize(text)
        assert fuzzy_normalize(base) == base
        variants = [
            text.upper(),
            text + "  !!",
            text.replace(" ", "   ", 1),
            "  " + text + ".",
        ]
        keys = _fuzzy_text_keys([text] + variants)
        assert len(set(keys.tolist())) == 1

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=40),
        d=st.integers(min_value=1, max_value=16),
        off=st.integers(min_value=0, max_value=10),
        data=st.data(),
    )
    def test_embedding_matrix_equals_rowwise_decode(self, n, d, off, data):
        """flatten->reshape decode is value-identical to the to_pylist
        path on arbitrary shapes, offsets and layouts."""
        import numpy as np
        import pyarrow as pa

        from ebook_ocr_ray.pipelines.neighbors import embedding_matrix

        vals = data.draw(
            st.lists(
                st.floats(allow_nan=False, allow_infinity=False, width=32),
                min_size=n * d,
                max_size=n * d,
            )
        )
        m = np.asarray(vals, dtype=np.float64).reshape(n, d)
        cols = [
            pa.array(list(m)),
            pa.FixedSizeListArray.from_arrays(pa.array(m.ravel()), d),
        ]
        for col in cols:
            sl = col.slice(min(off, n - 1), max(1, n - off))
            for c in (col, sl):
                got = embedding_matrix(c)
                want = np.asarray(c.to_pylist(), dtype=np.float64)
                np.testing.assert_array_equal(got, want)


class TestUrlNormalizationProperties:
    URL = st.builds(
        lambda scheme, www, host, path, q, frag, slash: (
            scheme + www + host + path + q + frag + slash
        ),
        scheme=st.sampled_from(["https://", "http://", "HTTP://", "HTTPS://"]),
        www=st.sampled_from(["", "www.", "WWW."]),
        host=st.from_regex(r"[a-z0-9-]{1,12}\.example", fullmatch=True),
        path=st.from_regex(r"(/[a-z0-9]{1,8}){0,3}", fullmatch=True),
        q=st.sampled_from(["", "?a=1", "?utm_source=feed&b=2"]),
        frag=st.sampled_from(["", "#frag"]),
        slash=st.sampled_from(["", "/"]),
    )

    @given(url=URL)
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, url):
        """normalize(normalize(u)) == normalize(u): a canonical form must
        be a fixed point, or re-normalizing a stored url_norm would change
        keys between runs."""
        import pyarrow as pa

        from ebook_ocr_ray.pipelines.extraction import normalize_urls

        once = normalize_urls(pa.array([url])).to_pylist()[0]
        twice = normalize_urls(pa.array([once])).to_pylist()[0]
        assert once == twice

    @given(url=URL)
    @settings(max_examples=200, deadline=None)
    def test_no_scheme_query_fragment_or_trailing_slash(self, url):
        import pyarrow as pa

        from ebook_ocr_ray.pipelines.extraction import normalize_urls

        norm = normalize_urls(pa.array([url])).to_pylist()[0]
        assert "://" not in norm
        assert "?" not in norm and "#" not in norm
        assert not norm.endswith("/")
        assert not norm.startswith("www.")
        assert norm == norm.lower()


class TestGopherRuleProperties:
    @given(
        words=st.lists(
            st.text(alphabet="abcdef", min_size=1, max_size=8),
            min_size=1,
            max_size=60,
        ),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    @settings(max_examples=10, deadline=None)
    def test_permutation_invariant(self, ray_session, words, seed):
        """Every Gopher metric is a bag-of-words statistic: shuffling word
        order must not change any output column. One Ray run per example:
        original and shuffled doc share a batch."""
        import random

        import pyarrow as pa
        import ray

        from ebook_ocr_ray.pipelines.quality import gopher_rule_stats

        shuffled = list(words)
        random.Random(seed).shuffle(shuffled)
        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    [" ".join(words), " ".join(shuffled)], pa.string()
                ),
            }
        )
        df = (
            gopher_rule_stats(ray.data.from_arrow(t))
            .to_pandas()
            .sort_values("doc_id")
            .drop(columns=["doc_id"])
            .reset_index(drop=True)
        )
        assert df.iloc[0].to_dict() == df.iloc[1].to_dict()
