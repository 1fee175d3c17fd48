"""The compat facade must run the reference README's own usage snippets."""

from fuzzy_search_spark.compat import (
    FuzzyContextSearcher,
    FuzzyPhraseSearcher,
    FuzzyTemplateSearcher,
    FuzzyTokenSearcher,
    make_searcher,
)
from tests.test_matcher_golden import README_CONFIG, README_PHRASES, TEXT1


def test_readme_snippet():
    searcher = FuzzyPhraseSearcher(phrase_list=README_PHRASES,
                                   config=README_CONFIG)
    matches = searcher.find_matches({"text": TEXT1, "id": "t1"})
    assert [m.string for m in matches] == [
        "Veucris", "den 5. Januaris 1725", "PR&ASIDE", "PRASENTIEBUS",
        "Velters"]
    m = matches[0]
    assert m.phrase.phrase_string == "Veneris"
    assert m.variant.phrase_string == "Veneris"
    assert m.text_id == "t1"
    assert m.levenshtein_similarity == 0.7142857142857143
    payload = m.json()
    assert payload["type"] == "PhraseMatch"
    assert payload["match_scores"]["char_match"] == m.character_overlap


def test_make_searcher_and_string_input():
    searcher = make_searcher(["PRAESIDE"], {"char_match_threshold": 0.6,
                                            "levenshtein_threshold": 0.6})
    got = searcher.find_matches("dit is een PR&ASIDE geval")
    assert [m.string for m in got] == ["PR&ASIDE"]
    assert got[0].text_id is None


def test_token_searcher_facade():
    searcher = FuzzyTokenSearcher(phrase_list=["best test case"])
    got = searcher.find_matches("This is a best test case")
    assert [m.string for m in got] == ["best test case"]
    assert got[0].character_overlap is None  # token path computes lev only


def test_context_searcher_facade():
    searcher = FuzzyContextSearcher(config=dict(README_CONFIG,
                                                context_size=10))
    searcher.index_phrase_model(README_PHRASES)
    got = searcher.find_matches({"text": TEXT1, "id": "t1"})
    m = [x for x in got if x.string == "PR&ASIDE"][0]
    assert m.context == "ris 1725. PR&ASIDE, Den Heer"
    assert m.prefix == "ris 1725. "


def test_template_searcher_facade():
    phrases = [
        {"phrase": "Makelaers", "label": "broker_term"},
        {"phrase": "verkopen", "label": "auction_sale"},
    ]
    template = {"type": "group", "ordered": True, "elements": [
        {"type": "label", "label": "broker_term", "required": True},
        {"type": "label", "label": "auction_sale"},
    ]}
    searcher = FuzzyTemplateSearcher(phrases, template,
                                     config={"char_match_threshold": 0.6,
                                             "levenshtein_threshold": 0.6})
    got = searcher.search_text(
        "Anthony Bosman, Makelaers tot Rotterdam, zullen verkopen")
    assert len(got) == 1
    assert [m.label for m in got[0].phrase_matches] == [
        "broker_term", "auction_sale"]
