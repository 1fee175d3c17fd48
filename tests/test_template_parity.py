"""Template matcher parity: the reference's auction-advertisement template
goldens, driven both through its own FuzzyTemplateSearcher (oracle) and
through this engine's template module."""

import pytest

from fuzzy_search_spark.matcher import Match
from fuzzy_search_spark.template import find_template_matches, parse_template
from tests.oracle import _ensure_paths, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _make_match(label: str, index: int) -> Match:
    return Match(phrase=label, variant=label, string=label, offset=index,
                 end=index + len(label), label=label, char_match=1.0,
                 ngram_match=1.0, levenshtein_similarity=1.0)


@pytest.fixture(scope="module")
def auction():
    _ensure_paths()
    import sys

    sys.path.insert(0, "/root/reference")
    from data.demo_data import DemoData
    from fuzzy_search.pattern.fuzzy_template import FuzzyTemplate
    from fuzzy_search.phrase.phrase_model import PhraseModel
    from fuzzy_search.search.template_searcher import FuzzyTemplateSearcher

    data = DemoData().get_dataset("auction_advertisements")
    phrase_model = PhraseModel(model=data["phrases"])
    template = FuzzyTemplate(phrase_model=phrase_model,
                             template_json=data["template"],
                             ignore_unknown=True)
    searcher = FuzzyTemplateSearcher(template=template)
    known_labels = set(phrase_model.is_label_of.keys())
    mine = parse_template(data["template"], known_labels=known_labels,
                          ignore_unknown=True)
    return data, searcher, mine, phrase_model


def _ref_matches(phrase_model, labels):
    from fuzzy_search.match.phrase_match import PhraseMatch

    matches = []
    for index, label in enumerate(labels):
        match_phrase = next(p for p in phrase_model.get_phrases()
                            if p.has_label(label))
        m = PhraseMatch(match_phrase=match_phrase, match_variant=match_phrase,
                        match_string=label, match_offset=index)
        m.label = label
        matches.append(m)
    return matches


@pytest.mark.parametrize("test_name", ["test1", "test2", "test3", "test4"])
def test_auction_goldens(auction, test_name):
    data, searcher, mine, phrase_model = auction
    test_data = data["tests"][test_name]
    labels = test_data["match_sequence"]

    ref_result = searcher.find_template_matches(
        _ref_matches(phrase_model, labels))
    eng_result = find_template_matches(
        [_make_match(label, i) for i, label in enumerate(labels)], mine)

    assert len(eng_result) == len(ref_result)
    if "num_template_matches" in test_data:
        assert len(eng_result) == test_data["num_template_matches"]
    for ref_tm, eng_tm in zip(ref_result, eng_result):
        ref_labels = [
            m.label if isinstance(m.label, str) else m.label
            for m in ref_tm.phrase_matches
        ]
        eng_labels = [m.label for m in eng_tm.phrase_matches]
        assert eng_labels == ref_labels
        ref_flat = [(em["label"], len(em["phrase_matches"]))
                    for em in ref_tm.element_matches]
        eng_flat = [(em["label"], len(em["phrase_matches"]))
                    for em in eng_tm.label_matches]
        assert eng_flat == ref_flat


def test_simple_label_template(auction):
    tpl = parse_template(["test_label"], known_labels={"test_label"})
    matches = [_make_match("test_label", 3)]
    got = find_template_matches(matches, tpl)
    assert len(got) == 1
    assert got[0].phrase_matches == matches


def test_required_label_missing(auction):
    tpl = parse_template(
        [{"label": "a", "required": True}, {"label": "b"}],
        known_labels={"a", "b"})
    got = find_template_matches([_make_match("b", 0)], tpl)
    assert got == []
