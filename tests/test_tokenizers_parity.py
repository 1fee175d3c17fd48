"""Differential parity for the RegEx/Custom tokenizer kernels against the
reference's Tokenizer classes (running live under tests/oracle_shims)."""

import random
import sys

import pytest

sys.path.insert(0, "tests/oracle_shims")
sys.path.insert(0, "/root/reference")

from fuzzy_search_spark.kernels.tokenize import (  # noqa: E402
    custom_token_spans,
    regex_split_spans,
    regex_token_spans,
    spans_to_tokens,
    tokenize,
)

TEXTS = [
    "",
    "one",
    "  leading and trailing  ",
    "den 5. Januaris 1725. PR&ASIDE, Den Heer",
    "a-b c_d e.f, (g) [h]! i? j;",
    "repeated token token token end",
]


def _rand_texts(n=60, seed=13):
    rng = random.Random(seed)
    alpha = "abcde .,-!?()"
    return ["".join(rng.choice(alpha) for _ in range(rng.randrange(0, 50)))
            for _ in range(n)]


def _ref_tokens(tokenizer, text):
    return [(t.string, t.char_index, t.char_end_index, t.normalised_string)
            for t in tokenizer.tokenize(text)]


def _mine(spans_tokens):
    return [(s.string, s.char_index, s.char_end_index, s.normalized)
            for s in spans_tokens]


@pytest.mark.parametrize("split_pattern", [r"\s+", r"[,.]\s*"])
@pytest.mark.parametrize("ignorecase", [False, True])
def test_regex_split_parity(split_pattern, ignorecase):
    from fuzzy_search.tokenization.token import RegExTokenizer

    ref = RegExTokenizer(split_pattern=split_pattern, ignorecase=ignorecase)
    for text in TEXTS + _rand_texts():
        mine = _mine(spans_to_tokens(
            text, regex_split_spans(text, split_pattern),
            ignorecase=ignorecase))
        assert mine == _ref_tokens(ref, text), (split_pattern, text)


def test_regex_token_pattern_parity():
    from fuzzy_search.tokenization.token import RegExTokenizer

    ref = RegExTokenizer(token_pattern=r"\w+")
    for text in TEXTS + _rand_texts(seed=14):
        mine = _mine(spans_to_tokens(text, regex_token_spans(text, r"\w+")))
        assert mine == _ref_tokens(ref, text), text


def test_custom_tokenizer_parity():
    from fuzzy_search.tokenization.token import CustomTokenizer

    def fn(text):
        return [w for w in text.replace(",", " ").split() if w]

    ref = CustomTokenizer(tokenizer_func=fn)
    for text in TEXTS + _rand_texts(seed=15):
        mine = _mine(spans_to_tokens(text, custom_token_spans(text, fn)))
        assert mine == _ref_tokens(ref, text), text


def test_boundary_tokens_parity():
    from fuzzy_search.tokenization.token import RegExTokenizer

    ref = RegExTokenizer(split_pattern=r"\s+", include_boundary_tokens=True)
    for text in TEXTS:
        mine = _mine(spans_to_tokens(
            text, regex_split_spans(text, r"\s+"),
            include_boundary_tokens=True))
        assert mine == _ref_tokens(ref, text), text


def test_wordpunct_matches_reference_base():
    """The default tokenizer (vendored WordPunct regex) agrees with the
    reference's base Tokenizer (NLTK WordPunct under the shim)."""
    from fuzzy_search.tokenization.token import Tokenizer

    ref = Tokenizer()
    for text in TEXTS + _rand_texts(seed=16):
        mine = _mine(tokenize(text))
        assert mine == _ref_tokens(ref, text), text


def test_wordpunct_ignorecase_normalized():
    from fuzzy_search.tokenization.token import Tokenizer

    ref = Tokenizer(ignorecase=True)
    for text in TEXTS + _rand_texts(seed=17):
        mine = _mine(tokenize(text, ignorecase=True))
        assert mine == _ref_tokens(ref, text), text
