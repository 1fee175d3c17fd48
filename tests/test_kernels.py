"""Kernel unit tests, mirroring the reference suite's golden assertions
(test_tokenization_string.py, README.md skipgram counts)."""

import pytest

from fuzzy_search_spark.kernels import strings as S
from fuzzy_search_spark.kernels.boundaries import snap_start, snap_span, type_map
from fuzzy_search_spark.kernels.skipgrams import (
    GramScanner,
    encode_gram,
    iter_skipgrams,
    keyed_skipgrams,
)


class TestNgrams:
    def test_padded_gram_count(self):
        # len(text) + 3 - n grams for padded ngrams (reference
        # test_tokenization_string.py golden)
        for text in ("test", "sentence"):
            for n in (2, 3):
                assert len(S.char_ngrams(text, n)) == len(text) + 3 - n

    def test_too_short(self):
        assert S.char_ngrams("a", 2) == []

    def test_padding(self):
        assert S.char_ngrams("ab", 2) == ["#a", "ab", "b#"]


class TestOverlap:
    def test_char_overlap_multiset(self):
        # reference golden: score_char_overlap('ttttt','tttt') == 4
        assert S.char_overlap("ttttt", "tttt") == 4
        assert S.char_overlap("tttt", "ttttt") == 4
        assert S.char_overlap("abc", "cba") == 3
        assert S.char_overlap("abc", "xyz") == 0

    def test_ngram_overlap_multiset(self):
        assert S.ngram_overlap("test", "test", 2) == 5
        assert S.ngram_overlap("test", "tost", 2) == 3


class TestIndelSimilarity:
    def test_readme_golden(self):
        # README.md:77-82: Veneris vs Veucris -> 10/14
        assert S.indel_similarity("Veneris", "Veucris") == 0.7142857142857143

    def test_symmetric_and_bounds(self):
        assert S.indel_similarity("", "") == 1.0
        assert S.indel_similarity("abc", "") == 0.0
        assert S.indel_similarity("abc", "abc") == 1.0

    def test_cutoff_collapses(self):
        v = S.indel_similarity("Veneris", "Veucris")
        assert S.indel_similarity("Veneris", "Veucris", score_cutoff=0.8) == 0.0
        assert S.indel_similarity("Veneris", "Veucris", score_cutoff=0.7) == v

    def test_matches_shim(self):
        # cross-check against the independent oracle-shim implementation
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "oracle_shims"))
        import Levenshtein

        pairs = [("PRAESENTIBUS", "PRASENTIEBUS"), ("den Heere", "deu Heere"),
                 ("a", "b"), ("kitten", "sitting")]
        for a, b in pairs:
            assert S.indel_similarity(a, b) == Levenshtein.ratio(a, b)
            assert S.levenshtein_distance(a, b) == Levenshtein.distance(a, b)


class TestSkipgrams:
    def test_readme_counts(self):
        # README.md:573-607: "This is a test sentence." at ngram_size=2
        text = "This is a test sentence."
        assert len(list(iter_skipgrams(text, 2, 2))) == 66
        assert len(list(iter_skipgrams(text, 2, 1))) == 45
        assert len(list(iter_skipgrams(text, 2, 0))) == 23

    def test_first_grams(self):
        grams = [g for g, _, _ in iter_skipgrams("This is", 2, 2)]
        assert grams[:6] == ["Th", "Ti", "Ts", "hi", "hs", "h "]

    def test_short_text_single_gram(self):
        assert list(iter_skipgrams("ab", 2, 2)) == [("ab", 0, 2)]

    def test_unigrams(self):
        assert [g for g, _, _ in iter_skipgrams("abc", 1, 2)] == ["a", "b", "c"]

    def test_scanner_equals_bruteforce(self):
        text = "Veucris den 5. Januaris 1725. PR&ASIDE " * 4
        vocab_src = "den .. Januarii 1725"
        vocab = {k for k, _, _ in keyed_skipgrams(vocab_src)}
        scanner = GramScanner(vocab, 2, 2)
        brute = [(k, s, ln) for k, s, ln in keyed_skipgrams(text)
                 if k in vocab]
        assert scanner.scan(text) == brute

    def test_scanner_short_text_path(self):
        vocab = {k for k, _, _ in keyed_skipgrams("test")}
        scanner = GramScanner(vocab, 2, 2)
        assert scanner.scan("te") == [(encode_gram("te"), 0, 2)]


class TestBoundaries:
    def test_type_map(self):
        assert type_map("a. ", ".,") == "wss"
        assert type_map("a. ", ".,", whitespace_only=True) == "wws"

    def test_snap_start_prefix(self):
        assert snap_start("xx, word", ", word", 2) == 4

    def test_snap_start_left_shift(self):
        # 'ord' inside 'word' with boundary 2 back
        assert snap_start("a word", "ord", 3) == 2

    def test_snap_start_reject(self):
        assert snap_start("abcdefg", "efg", 4) is None

    def test_snap_span_end_extension(self):
        import string
        text = "dit is een PRAESIDE, zeker"
        got = snap_span("PRAESIDE", "PRAESID", text, 11, 18, string.punctuation)
        assert got == ("PRAESIDE", 11, 19)


def test_skipgram_distance_table_parity():
    """Reproduces the reference Phrase.skipgram_distance table (object-pair
    keyed there; (string, start) identity here) value for value."""
    import sys

    sys.path.insert(0, "tests/oracle_shims")
    sys.path.insert(0, "/root/reference")
    from fuzzy_search.phrase.phrase import Phrase as RefPhrase

    from fuzzy_search_spark.kernels.skipgrams import skipgram_distance_table

    for phrase in ("PRAESIDE", "den .. Januarii 1725", "abcabc", "xy"):
        ref = RefPhrase(phrase, ngram_size=2, skip_size=2)
        ref_items = sorted(
            (((k[0].string, k[0].start_offset),
              (k[1].string, k[1].start_offset)), v)
            for k, v in ref.skipgram_distance.items())
        mine = skipgram_distance_table(phrase, 2, 2,
                                       ref.within_range_threshold)
        mine_items = sorted((k[:2], v) for k, v in mine.items())
        assert [v for _, v in mine_items] == [v for _, v in ref_items]
        assert [k for k, _ in mine_items] == [k for k, _ in ref_items], phrase
