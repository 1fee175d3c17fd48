"""Analysis-layer tests: BPE differential vs the reference trainer,
frequency/LLR math, and skipgram-similarity brute-force equivalence."""

import math
from collections import Counter

import pytest

from fuzzy_search_spark.analysis.subtoken import encode_bpe, train_bpe
from tests.oracle import _ensure_paths, reference_available


class TestBPE:
    def test_textbook_example(self):
        # classic BPE walkthrough: low/lower/newest/widest
        counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        vocab, merges = train_bpe(counts, 10)
        assert merges[0] in {("e", "s"), ("s", "t")} or merges[0][1] == " "
        assert "est" in vocab or "est " in vocab

    def test_merges_deterministic(self):
        counts = {"aaab": 3, "aab": 2, "abab": 4}
        v1, m1 = train_bpe(counts, 8)
        v2, m2 = train_bpe(counts, 8)
        assert (v1, m1) == (v2, m2)

    def test_encode_roundtrip(self):
        counts = {"testing": 4, "test": 6, "resting": 3}
        _vocab, merges = train_bpe(counts, 12)
        segs = encode_bpe("testing", merges)
        assert "".join(segs) == "testing "

    @pytest.mark.skipif(not reference_available(), reason="no reference")
    def test_differential_vs_reference(self):
        _ensure_paths()
        from fuzzy_search.analysis.subtoken import make_byte_pair_encoding

        # tie-free inputs: no two pairs share (frequency, combined length)
        # at any step (the reference breaks such ties in set order)
        tokens = (["abc"] * 8 + ["abd"] * 5 + ["bcd"] * 2)
        for k in (1, 2, 3, 4):
            ref_vocab = make_byte_pair_encoding(list(tokens), k)
            vocab, _merges = train_bpe(Counter(tokens), k)
            assert vocab == ref_vocab, k


class TestSkipgramSimilarityBruteForce:
    @pytest.mark.spark
    def test_matches_numpy_cosine(self):
        import numpy as np

        from fuzzy_search_spark.analysis.similarity import (
            skipgram_similarity_topk,
        )
        from fuzzy_search_spark.kernels.skipgrams import iter_skipgrams
        from fuzzy_search_spark.spark.session import get_spark

        terms = ["molten", "molted", "malted", "salted", "salten",
                 "pinkish", "pinkist", "blush", "plush"]
        spark = get_spark(master="local[2]", app_name="sim-brute")
        spark.sparkContext.setLogLevel("ERROR")
        try:
            df = spark.createDataFrame([(t,) for t in terms], "term string")
            got = {(r.term, r.similar_term): r.cosine
                   for r in skipgram_similarity_topk(df, k=10).collect()}
        finally:
            spark.stop()

        def vec(t):
            return Counter(g for g, _, _ in iter_skipgrams(t, 3, 0))

        for a in terms:
            for b in terms:
                if a == b or abs(len(a) - len(b)) > 2:
                    continue
                va, vb = vec(a), vec(b)
                dot = sum(va[g] * vb[g] for g in va)
                if dot == 0:
                    assert (a, b) not in got
                    continue
                norm = math.sqrt(sum(v * v for v in va.values())) * \
                    math.sqrt(sum(v * v for v in vb.values()))
                assert got[(a, b)] == pytest.approx(dot / norm, abs=1e-6), (a, b)


class TestLshAnn:
    @pytest.mark.spark
    def test_lsh_results_subset_of_bruteforce(self):
        import numpy as np

        from fuzzy_search_spark.pipeline.ann import (
            cosine_topk,
            lsh_bucket,
            lsh_topk,
        )
        from fuzzy_search_spark.spark.session import get_spark

        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((200, 16)).round(4)
        query = vecs[0].tolist()
        spark = get_spark(master="local[2]", app_name="lsh-ann")
        spark.sparkContext.setLogLevel("ERROR")
        try:
            df = spark.createDataFrame(
                [(i, v.tolist()) for i, v in enumerate(vecs)],
                "vec_id long, embedding array<double>")
            brute = {r.vec_id: r.cosine
                     for r in cosine_topk(df.filter("vec_id != 0"),
                                          query, k=200).collect()}
            approx = lsh_topk(df.filter("vec_id != 0"), query, k=10,
                              num_planes=4).collect()
            # every LSH result carries its exact brute-force cosine
            assert approx, "query bucket unexpectedly empty"
            for r in approx:
                assert brute[r.vec_id] == r.cosine
            # determinism: same seed -> same buckets
            b1 = {r.vec_id: r.bucket for r in lsh_bucket(df).collect()}
            b2 = {r.vec_id: r.bucket for r in lsh_bucket(df).collect()}
            assert b1 == b2
        finally:
            spark.stop()


class TestLshMultiTable:
    @pytest.mark.spark
    def test_multi_table_recall_dominates_single(self):
        import numpy as np

        from fuzzy_search_spark.pipeline.ann import (
            cosine_topk,
            lsh_topk,
            lsh_topk_multi,
        )
        from fuzzy_search_spark.spark.session import get_spark

        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((300, 16)).round(4)
        # plant a true neighborhood: 12 vectors near the query direction
        for i in range(1, 13):
            vecs[i] = (vecs[0] + 0.25 * rng.standard_normal(16)).round(4)
        query = vecs[0].tolist()
        spark = get_spark(master="local[2]", app_name="lsh-multi")
        spark.sparkContext.setLogLevel("ERROR")
        try:
            df = spark.createDataFrame(
                [(i, v.tolist()) for i, v in enumerate(vecs)],
                "vec_id long, embedding array<double>").filter("vec_id != 0")
            truth = [r.vec_id for r in cosine_topk(df, query, k=10).collect()]
            single = {r.vec_id for r in
                      lsh_topk(df, query, k=10, num_planes=6).collect()}
            multi = {r.vec_id for r in
                     lsh_topk_multi(df, query, k=10, num_planes=6,
                                    num_tables=4).collect()}
            # every result carries its exact cosine: multi's candidate set
            # contains the single-table bucket, so recall can only improve
            recall_single = len(single & set(truth)) / len(truth)
            recall_multi = len(multi & set(truth)) / len(truth)
            assert recall_multi >= recall_single
            assert recall_multi >= 0.8, recall_multi
            # determinism
            again = {r.vec_id for r in
                     lsh_topk_multi(df, query, k=10, num_planes=6,
                                    num_tables=4).collect()}
            assert multi == again
        finally:
            spark.stop()


class TestVocabulary:
    """Driver-side Vocabulary parity vs the reference class
    (tokenization/vocabulary.py:8-125, run live under oracle_shims)."""

    TERMS = ["Alpha", "beta", "Alpha", "GAMMA", "delta", "beta"]

    def _both(self, ignorecase):
        import sys
        sys.path.insert(0, "tests/oracle_shims")
        sys.path.insert(0, "/root/reference")
        from fuzzy_search.tokenization.vocabulary import (
            Vocabulary as RefVocabulary,
        )
        from fuzzy_search_spark.analysis.vocabulary import Vocabulary

        return (Vocabulary(self.TERMS, ignorecase=ignorecase),
                RefVocabulary(self.TERMS, ignorecase=ignorecase))

    @pytest.mark.parametrize("ignorecase", [False, True])
    def test_ids_match_reference(self, ignorecase):
        if not reference_available():
            pytest.skip("reference not available")
        mine, ref = self._both(ignorecase)
        assert mine.term_id == ref.term_id
        assert mine.id_term == ref.id_term
        assert len(mine) == len(ref)
        for term in ref:
            assert mine.term2id(term) == ref.term2id(term)
            assert term in mine
        assert mine.term2id("nope") is None and ref.term2id("nope") is None
        assert mine.id2term(999) is None and ref.id2term(999) is None

    def test_add_terms_and_reset(self):
        if not reference_available():
            pytest.skip("reference not available")
        mine, ref = self._both(False)
        for v in (mine, ref):
            v.add_terms("Epsilon")
            v.add_terms(["zeta", "Epsilon"])
        assert mine.term_id == ref.term_id
        for v in (mine, ref):
            v.add_terms(["fresh"], reset_index=True)
        assert mine.term_id == ref.term_id == {"fresh": 0}

    def test_token_input(self):
        from fuzzy_search_spark.analysis.vocabulary import Vocabulary
        from fuzzy_search_spark.kernels.tokenize import tokenize

        tokens = tokenize("The quick brown fox", ignorecase=True)
        vocab = Vocabulary(tokens)
        assert vocab.term2id("the") == 0 and vocab.term2id("fox") == 3


def test_train_bpe_agrees_with_reference_surface_machinery():
    """The engine's histogram trainer (train_bpe) and the reference-surface
    incremental machinery (make_byte_pair_encoding) implement the same
    merge rule — max frequency, shortest combined length, lexicographic —
    so their learned vocabularies must be identical at every k."""
    from collections import Counter

    from fuzzy_search_spark.analysis.subtoken import (
        make_byte_pair_encoding,
        train_bpe,
    )

    tokens = (["low"] * 5 + ["lowest"] * 2 + ["newer"] * 6 + ["wider"] * 3
              + ["new"] * 2 + ["lower"] * 4)
    for k in (1, 3, 5, 8, 12, 20):
        vocab_hist, _merges = train_bpe(Counter(tokens), k)
        vocab_inc = make_byte_pair_encoding(tokens, k)
        assert vocab_hist == vocab_inc, k

