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


def test_doc_and_token_list_inputs():
    """Doc and List[Token] inputs flow through both searchers (reference
    phrase_searcher.py:29-46 / token_searcher.py:259-301 input range)."""
    from fuzzy_search_spark.compat import Tokenizer

    tok = Tokenizer()
    doc = tok.tokenize_doc(TEXT1, doc_id="d1")

    phrase = FuzzyPhraseSearcher(phrase_list=README_PHRASES,
                                 config=README_CONFIG)
    via_doc = phrase.find_matches(doc)
    via_str = phrase.find_matches({"text": TEXT1, "id": "d1"})
    assert [(m.string, m.offset) for m in via_doc] == \
        [(m.string, m.offset) for m in via_str]
    assert via_doc[0].text_id == "d1"

    token = FuzzyTokenSearcher(phrase_list=["best test case"])
    text = "This is a best test case"
    tdoc = tok.tokenize_doc(text, doc_id="t")
    via_doc = token.find_matches(tdoc)
    via_list = token.find_matches(tok.tokenize(text))
    via_str = token.find_matches(text)
    assert [(m.string, m.offset) for m in via_doc] == \
        [(m.string, m.offset) for m in via_str] == \
        [(m.string, m.offset) for m in via_list]
    assert via_doc and via_doc[0].string == "best test case"

    import pytest

    with pytest.raises(TypeError):
        phrase.find_matches(42)


def test_doc_parity_with_reference():
    """Pre-tokenized Docs produce identical matches from both engines."""
    import sys

    sys.path.insert(0, "tests/oracle_shims")
    sys.path.insert(0, "/root/reference")
    from fuzzy_search.search.phrase_searcher import (
        FuzzyPhraseSearcher as RefSearcher,
    )
    from fuzzy_search.search.token_searcher import (
        FuzzyTokenSearcher as RefTokenSearcher,
    )
    from fuzzy_search.tokenization.token import Tokenizer as RefTokenizer

    from fuzzy_search_spark.compat import Tokenizer

    ref = RefSearcher(phrase_list=README_PHRASES, config=README_CONFIG)
    mine = FuzzyPhraseSearcher(phrase_list=README_PHRASES,
                               config=README_CONFIG)
    ref_doc = RefTokenizer().tokenize_doc(TEXT1, doc_id="d1")
    my_doc = Tokenizer().tokenize_doc(TEXT1, doc_id="d1")
    ref_out = [(m.string, m.offset, m.end, m.levenshtein_similarity)
               for m in ref.find_matches(ref_doc)]
    my_out = [(m.string, m.offset, m.end, m.levenshtein_similarity)
              for m in mine.find_matches(my_doc)]
    assert my_out == ref_out

    text = "This is a best test case with best tesst overlap"
    rtok = RefTokenSearcher(phrase_list=["best test case"])
    mtok = FuzzyTokenSearcher(phrase_list=["best test case"])
    ref_out = [(m.string, m.offset) for m in
               rtok.find_matches(RefTokenizer().tokenize_doc(text, doc_id="x"))]
    my_out = [(m.string, m.offset) for m in
              mtok.find_matches(Tokenizer().tokenize_doc(text, doc_id="x"))]
    assert my_out == ref_out


def test_configure_and_reindex():
    """configure / index_phrases / index_phrase_model recompile in place
    (reference searcher.py:101-201)."""
    s = FuzzyPhraseSearcher(phrase_list=["PRAESIDE"],
                            config={"char_match_threshold": 0.6,
                                    "levenshtein_threshold": 0.6})
    assert [m.string for m in s.find_matches("een PR&ASIDE geval")] == \
        ["PR&ASIDE"]
    s.configure({"levenshtein_threshold": 0.95})
    assert s.find_matches("een PR&ASIDE geval") == []
    s.configure({"levenshtein_threshold": 0.6})
    s.index_phrases(["Veneris"])
    assert [m.string for m in s.find_matches("ie Veucris den")] == ["Veucris"]
    from fuzzy_search_spark.compat import PhraseModel

    s.index_phrase_model(PhraseModel(["PRAESIDE"]))
    assert [m.string for m in s.find_matches("een PR&ASIDE geval")] == \
        ["PR&ASIDE"]


def test_phrase_match_json_roundtrip():
    """json() -> phrase_match_from_json reconstructs the match (reference
    phrase_match.py:378-399 counterpart)."""
    from fuzzy_search_spark.compat import phrase_match_from_json

    searcher = FuzzyPhraseSearcher(phrase_list=README_PHRASES,
                                   config=README_CONFIG)
    for m in searcher.find_matches({"text": TEXT1, "id": "t1"}):
        back = phrase_match_from_json(m.json())
        assert back.phrase.phrase_string == m.phrase.phrase_string
        assert back.variant.phrase_string == m.variant.phrase_string
        assert (back.string, back.offset, back.end) == \
            (m.string, m.offset, m.end)
        assert back.levenshtein_similarity == m.levenshtein_similarity
        assert back.text_id == "t1"
        assert back.json() == m.json()


def test_top_level_reference_imports():
    """`import fuzzy_search_spark as fuzzy_search` satisfies the reference
    package's top-level surface (fuzzy_search/__init__.py:1-29)."""
    import fuzzy_search_spark as fs

    s = fs.make_searcher(["PRAESIDE"], fs.default_config)
    assert [m.string for m in s.find_matches("een PR&ASIDE geval")] == \
        ["PR&ASIDE"]
    assert fs.PhraseModel(["x"]).has_phrase("x")
    assert fs.PhraseMatch is not None and fs.FuzzyTokenSearcher is not None
    assert isinstance(fs.__version__, str)
