"""Differential parity of the token matcher against the reference
FuzzyTokenSearcher, plus mirrored unit goldens from its test suite."""

import random

import pytest

from fuzzy_search_spark.token_matcher import (
    compile_token_model,
    find_token_matches,
    token_skipgrams,
)
from tests.oracle import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def make_reference_token_searcher(phrases, config=None, vocabulary=None):
    from tests.oracle import _ensure_paths

    _ensure_paths()
    from fuzzy_search.search.token_searcher import FuzzyTokenSearcher

    return FuzzyTokenSearcher(phrase_list=list(phrases), config=config,
                              vocabulary=vocabulary)


def ref_matches(searcher, text):
    return [
        (m.phrase.phrase_string, m.variant.phrase_string, m.string,
         m.offset, m.end, m.levenshtein_similarity)
        for m in searcher.find_matches({"text": text, "id": "d"})
    ]


def eng_matches(tm, text):
    return [
        (m.phrase, m.variant, m.string, m.offset, m.end,
         m.levenshtein_similarity)
        for m in find_token_matches(text, tm)
    ]


class TestTokenSkipgrams:
    def test_matches_reference_generator(self):
        from tests.oracle import _ensure_paths

        _ensure_paths()
        from fuzzy_search.tokenization.string import token2skipgrams

        for token in ["test", "testing", "a", "ab", "Januarii", "x" * 12]:
            for pad in (False, True):
                for n, s in ((2, 2), (2, 1), (3, 2)):
                    ref = [(g.string, g.start_offset, g.length)
                           for g in token2skipgrams(token, n, s, pad_token=pad)]
                    got = token_skipgrams(token, n, s, pad_token=pad)
                    assert got == ref, (token, pad, n, s)


REFERENCE_TEXTS = [
    "This is a test in which we are testing",
    "The purpose is testing",
    "We are test ing",
    "This is a testcase",
    "This is a best test case",
    "this is a best test case to test best case matching",
    "a document for a test",
    "this is a test best case",
    "this is a time to rest",
    "test case",
    "t e s t",
    "",
]


def assert_tie_equivalent(eng, ref, text):
    """Exact equality, or — for offsets where several phrases tie on the
    Levenshtein score — the same (offset, score) picks (the reference's
    choice among ties is process-dependent: it iterates id-hashed sets)."""
    if eng == ref:
        return
    assert [(m[3], m[5]) for m in eng] == [(m[3], m[5]) for m in ref], text


class TestTokenSearcherParity:
    def test_reference_test_model(self):
        phrases = ["test", "test case", "best case", "best test case"]
        searcher = make_reference_token_searcher(phrases)
        tm = compile_token_model(phrases)
        for text in REFERENCE_TEXTS:
            assert_tie_equivalent(eng_matches(tm, text),
                                  ref_matches(searcher, text), text)

    def test_with_variants_and_offsets(self):
        phrases = [
            {"phrase": "testing", "variants": ["texting"], "label": "t"},
            {"phrase": "document", "max_start_offset": 25},
            {"phrase": "Zijne Hoogheid"},
        ]
        searcher = make_reference_token_searcher(phrases)
        tm = compile_token_model(phrases)
        texts = REFERENCE_TEXTS + [
            "Zijne Hoogheid was aanwezig",
            "Zijne Hoog heid was aanwezig",
            "het document is getest",
            "een heel lang voorstuk dat het document ver naar achteren duwt",
        ]
        for text in texts:
            assert eng_matches(tm, text) == ref_matches(searcher, text), text

    def test_randomized_parity(self):
        phrases = [
            {"phrase": "test case"},
            {"phrase": "best case"},
            {"phrase": "Admiraliteyt van Vrieslandt"},
            {"phrase": "den Heere", "variants": ["de Heer"]},
            {"phrase": "testing"},
        ]
        searcher = make_reference_token_searcher(phrases)
        tm = compile_token_model(phrases)
        words = ["test", "case", "best", "tast", "cese", "Admiraliteyt",
                 "Vrieslandt", "Vrieslaidt", "van", "den", "Heere", "Heer",
                 "de", "ing", "teft", "cafe", "lorem", "ipsum", "aduiralitey"]
        rng = random.Random(4242)
        exact = diffs = 0
        for _ in range(150):
            text = " ".join(rng.choice(words)
                            for _ in range(rng.randint(1, 25)))
            ref = ref_matches(searcher, text)
            eng = eng_matches(tm, text)
            if eng == ref:
                exact += 1
            else:
                diffs += 1
                assert_tie_equivalent(eng, ref, text)
        assert exact >= 120, f"{exact}/150 exact, {diffs} tolerated"


def test_max_offset_models_parity():
    phrases = [{"phrase": "test", "max_start_offset": 1},
               {"phrase": "document", "max_end_offset": 25},
               {"phrase": "case"}]
    searcher = make_reference_token_searcher(phrases)
    tm = compile_token_model(phrases)
    texts = [
        "test it now", "now test it", "a document for a test",
        "this very long sentence puts the document word far beyond limits",
        "document first then case", "case document test",
        "tes t of partial tokens near documen t limits",
    ]
    for text in texts:
        assert eng_matches(tm, text) == ref_matches(searcher, text), text


def test_user_vocabulary_parity():
    phrases = ["Zijne Hoogheid", "Mogende Heeren"]
    vocab = ["Mogende", "Hoogheid", "Heeren"]
    searcher = make_reference_token_searcher(phrases, vocabulary=vocab)
    tm = compile_token_model(phrases, vocabulary=vocab)
    texts = ["Zijne Hoogheid de Mogende Heeren", "Hoogheid Mogende",
             "Zijne Hooghied was daar", "Mogende Heeren vergaderden"]
    for text in texts:
        assert_tie_equivalent(eng_matches(tm, text),
                              ref_matches(searcher, text), text)


def test_vectorized_probe_equals_python_fallback():
    """The NumPy probe (searchsorted index + vectorized _match_type) and
    the Python accumulation loop must be interchangeable bit-for-bit:
    same matches, same distractor pairs, same vocab cache."""
    import random

    import fuzzy_search_spark.token_matcher as T

    rng = random.Random(77)
    words = ["confirmatie", "ordonnantie", "resolutie", "missive",
             "hoogheid", "mogende", "heeren", "daarop", "besloten"]
    phrases = [" ".join(rng.sample(words, rng.choice((1, 2, 3))))
               for _ in range(40)]
    vocab = words[:5]
    texts = []
    for _ in range(30):
        toks = [rng.choice(words) for _ in range(rng.randrange(4, 14))]
        # OCR-ish corruption
        toks = ["".join(c if rng.random() > 0.08 else "x" for c in t)
                for t in toks]
        texts.append(" ".join(toks))

    m_vec = T.compile_token_model(phrases, {}, vocabulary=vocab)
    assert m_vec.probe_index is not None
    orig = T._build_probe_index
    T._build_probe_index = lambda tm: None
    try:
        m_py = T.compile_token_model(phrases, {}, vocabulary=vocab)
    finally:
        T._build_probe_index = orig
    assert m_py.probe_index is None
    assert m_vec.distractor_pairs == m_py.distractor_pairs
    assert m_vec.vocab_cache == m_py.vocab_cache
    for text in texts:
        a = [(m.phrase, m.variant, m.string, m.offset, m.end,
              m.levenshtein_similarity)
             for m in T.find_token_matches(text, m_vec)]
        b = [(m.phrase, m.variant, m.string, m.offset, m.end,
              m.levenshtein_similarity)
             for m in T.find_token_matches(text, m_py)]
        assert a == b, text


def test_chain_fused_paths_equal_generic():
    """The chain loop's fused constructors (_PartialPhrase.fresh with a
    precomputed shared missing list; copy_extend's O(1) incremental
    update) must be attribute-identical to the generic
    constructor + add_tokens forms they replaced, across random token
    layouts including equal-start, overlapping, adjacent and gapped
    follow-up matches and phrases with repeated tokens."""
    from fuzzy_search_spark.token_matcher import (MatchType,
                                                  Tok,
                                                  TokenMatch,
                                                  _PartialPhrase,
                                                  compile_token_model)

    rng = random.Random(7)
    tm = compile_token_model(
        ["alpha beta gamma", "beta beta delta", "gamma alpha"], {})

    def mk_tok(word, start):
        return Tok(n=word, index=0, char_index=start,
                   char_end_index=100 - (start + len(word) + 1))

    words = ["alpha", "beta", "gamma", "delta"]
    for _ in range(300):
        pn = rng.choice(list(tm.phrases))
        phrase = tm.phrases[pn]
        seed_word = rng.choice(words)
        seed = TokenMatch((mk_tok(seed_word, 10),), seed_word,
                          MatchType.FULL)
        # generic vs fused fresh
        generic = _PartialPhrase(phrase, [seed])
        missing_after = list(phrase.missing_template)
        if seed_word in missing_after:
            missing_after.remove(seed_word)
        fused = _PartialPhrase.fresh(phrase, seed, missing_after)
        for attr in ("missing", "text_tokens", "text_start", "text_end",
                     "text_length"):
            assert getattr(generic, attr) == getattr(fused, attr), attr

        # follow-up match at an equal-start / overlapping / adjacent /
        # gapped position relative to the seed (end = 10 + len)
        nxt_word = rng.choice(words)
        nxt_start = rng.choice([10, 12, 10 + len(seed_word),
                                10 + len(seed_word) + 3])
        nxt = TokenMatch((mk_tok(nxt_word, nxt_start),), nxt_word,
                         MatchType.FULL)
        if nxt_word not in generic.missing:
            continue  # copy_extend's caller-checked precondition
        two_call = generic.copy()
        two_call.add_tokens([nxt])
        fused2 = fused.copy_extend(nxt)
        for attr in ("missing", "text_tokens", "text_start", "text_end",
                     "text_length"):
            assert getattr(two_call, attr) == getattr(fused2, attr), attr
        # the shared missing list must not have been mutated
        assert fused.missing == missing_after
