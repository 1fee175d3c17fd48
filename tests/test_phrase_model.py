"""PhraseModel registry facade: differential parity vs the reference
(phrase/phrase_model.py, live under oracle_shims) + searcher integration."""

import sys

import pytest

sys.path.insert(0, "tests/oracle_shims")
sys.path.insert(0, "/root/reference")

from fuzzy_search_spark.phrase_model import Phrase, PhraseModel  # noqa: E402

refmod = pytest.importorskip("fuzzy_search.phrase.phrase_model")

MODEL = [
    {"phrase": "okay", "variants": ["OK", "okai"], "label": "affirm"},
    {"phrase": "nope", "label": ["negative", "informal"], "rank": 3},
    {"phrase": "maybe"},
]


def _both(**kwargs):
    return PhraseModel(**kwargs), refmod.PhraseModel(**kwargs)


def _json_norm(j):
    return sorted(
        (e["phrase"], tuple(sorted(e.get("variants", []))),
         tuple(sorted(e.get("label", []))),
         tuple(sorted((e.get("custom") or {}).items())))
        for e in j)


def test_model_json_parity():
    mine, ref = _both(model=MODEL)
    assert _json_norm(mine.json) == _json_norm(ref.json)
    for p in ("okay", "nope", "maybe"):
        assert mine.has_phrase(p) and ref.has_phrase(p)
    assert not mine.has_phrase("OK") and not ref.has_phrase("OK")


def test_variant_links_parity():
    mine, ref = _both(model=MODEL)
    assert mine.variant_of("OK").phrase_string == \
        ref.variant_of("OK").phrase_string == "okay"
    assert mine.variant_of("nope") is None and ref.variant_of("nope") is None
    assert sorted(v.phrase_string for v in mine.variants("okay")) == \
        sorted(v.phrase_string for v in ref.variants("okay")) == \
        ["OK", "okai"]
    assert mine.variants("missing") is None and ref.variants("missing") is None


def test_labels_and_custom_parity():
    mine, ref = _both(model=MODEL)
    assert mine.get_labels("nope") == ref.get_labels("nope") == \
        {"negative", "informal"}
    assert mine.is_label("affirm") and ref.is_label("affirm")
    assert mine.has_label("okay") and ref.has_label("okay")
    assert not mine.has_label("maybe") and not ref.has_label("maybe")
    assert mine.has_custom("nope", "rank") and ref.has_custom("nope", "rank")
    assert mine.get("nope", "rank") == ref.get("nope", "rank") == 3
    with pytest.raises(ValueError):
        mine.get("okay", "rank")
    with pytest.raises(ValueError):
        ref.get("okay", "rank")


def test_incremental_build_and_removal_parity():
    mine, ref = _both(phrases=["alpha", "beta"])
    for m in (mine, ref):
        m.add_variants([{"phrase": "alpha", "variants": ["alfa"]}])
        m.add_labels([{"phrase": "beta", "label": "greek"}])
    assert _json_norm(mine.json) == _json_norm(ref.json)
    assert len(mine) == len(ref.phrase_index) == 2
    # removal of a variant-less phrase behaves identically
    for m in (mine, ref):
        m.remove_phrase(m.get_phrase("beta"))
    assert _json_norm(mine.json) == _json_norm(ref.json)
    # documented divergence: the reference's remove_phrase crashes on a
    # phrase WITH variants (phrase_model.py:287-289 iterates has_variants
    # KEYS — main phrases — and indexes variant_index with them); this
    # facade implements the documented intent instead
    with pytest.raises(KeyError):
        ref.remove_phrase(ref.get_phrase("alpha"))
    mine.remove_phrase(mine.get_phrase("alpha"))
    assert mine.variant_of("alfa") is None and len(mine) == 0
    with pytest.raises(ValueError):
        mine.remove_phrase(Phrase("alpha"))


def test_get_phrases_by_max_length_parity():
    mine, ref = _both(phrases=["a", "abcd", "abcdefgh"])
    assert sorted(p.phrase_string for p in mine.get_phrases_by_max_length(4)) \
        == sorted(p.phrase_string for p in ref.get_phrases_by_max_length(4)) \
        == ["a", "abcd"]


def test_phrase_object_surface():
    p = Phrase({"phrase": "test me", "label": "x", "max_start_offset": 5})
    assert p.name == "test me" and len(p) == 7
    assert p.has_label("x") and not p.has_label("y")
    assert p.has_max_start_offset() and not p.has_max_end_offset()
    with pytest.raises(TypeError):
        Phrase({"nophrase": 1})


def test_searcher_accepts_phrase_model():
    from fuzzy_search_spark.compat import (
        FuzzyPhraseSearcher,
        default_config,
        make_searcher,
    )
    from tests.test_matcher_golden import (
        README_CONFIG,
        README_PHRASES,
        TEXT1,
    )

    pm = PhraseModel(model=README_PHRASES, config=README_CONFIG)
    via_model = FuzzyPhraseSearcher(phrase_model=pm, config=README_CONFIG)
    via_list = FuzzyPhraseSearcher(phrase_list=README_PHRASES,
                                   config=README_CONFIG)
    assert [(m.string, m.offset) for m in via_model.find_matches(TEXT1)] == \
        [(m.string, m.offset) for m in via_list.find_matches(TEXT1)]

    s = make_searcher(["PRAESIDE"], {"char_match_threshold": 0.6,
                                     "levenshtein_threshold": 0.6})
    assert [m.string for m in s.find_matches("een PR&ASIDE geval")] == \
        ["PR&ASIDE"]
    assert default_config["levenshtein_threshold"] == 0.6


def test_default_config_matches_reference():
    from fuzzy_search.search.config import default_config as ref_config

    from fuzzy_search_spark.compat import default_config

    assert default_config == ref_config
