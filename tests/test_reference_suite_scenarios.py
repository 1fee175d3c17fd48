"""Differential runs of the reference library's OWN test-suite inputs
(north rule: byte-identical output "on its own pytest suite").

Each scenario is the (phrases, config, text) DATA from a behavioral test
in /root/reference/test/test_search_phrase_searcher.py or
test_search_token_searcher.py (cited per row); the assertion is
differential — the engine must reproduce the live reference's output
(with the same tolerance ladder as the randomized parity sweep for the
reference's process-order-unstable tie-breaks)."""

import pytest

from fuzzy_search_spark.model import compile_model
from tests.oracle import (
    engine_matches,
    make_reference_searcher,
    reference_available,
    reference_matches,
)
from tests.test_reference_parity import _tie_key

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

_REPUBLIC_CONFIG = {
    "char_match_threshold": 0.6,
    "ngram_threshold": 0.5,
    "levenshtein_threshold": 0.6,
    "ignorecase": False,
    "max_length_variance": 3,
    "ngram_size": 2,
    "skip_size": 2,
}

# (id, phrases, config, text) — inputs lifted verbatim from the reference's
# own tests (file:test name in the id)
PHRASE_SCENARIOS = [
    ("near_match", ["contains"], {},
     "This text consaint some typos."),
    ("case_sensitive", ["contains"], {},
     "This text CONSAINT some typos."),
    ("ignorecase", ["contains"], {"ignorecase": True},
     "This text CONSAINT some typos."),
    ("word_boundaries", ["contains"], {},
     "This text containsi some typos."),
    ("repeat_phrases", ["contains"], {},
     "This text contains contains some repetition."),
    ("correct_start", ["contains"], {},
     "This text con contains some weirdness."),
    ("length_variance", ["coffee"], {},
     "For sale two units of coffy."),
    ("length_variance_2", ["Makelaars"], {},
     "door de Alakei&ers by na gecompletecrt"),
    ("variants", [{"phrase": "okay", "variants": ["OK"]}],
     {"include_variants": True},
     "This text is okay and this test is OK."),
    ("distractors", [{"phrase": "baking", "distractors": ["braking"]}],
     {"filter_distractors": True},
     "This text is about baking and not about braking."),
    ("exact_special_chars",
     [{"phrase": "[baking]", "distractors": ["braking"]}], {},
     "This text is about [baking] and not about braking."),
    ("text_split",
     [{"phrase": "ONtfangen een Missive van"}, {"phrase": "Missive"},
      {"phrase": "Gouverneur Generaal"}, {"phrase": "Gouverneur"},
      {"phrase": "Generaal van de"}], {},
     "Ntfangen een Missive van den Gouverneur Generaal van het eiland "
     "Amoras, verfoekende, dat dit beter getest moet worden."),
    ("admiraliteiten", ["Admiraliteiten in t gemeen"], _REPUBLIC_CONFIG,
     "aaniraliteyten in het gemeen"),
    ("admiraliteit_vriesland", ["Admiraliteit in Vriesland"],
     _REPUBLIC_CONFIG, "AduiraliteytVrieslaidt"),
    ("dontfangen", ["ONtfangen een Missive van"], _REPUBLIC_CONFIG,
     "DONtfangen een Missive van den Heere vander Goes"),
    ("long_opening",
     ["hebben ter Vergaderinge ingebraght",
      "hebben ter Vergaderinge ingebragt en laaten leezen de Resolutie"],
     _REPUBLIC_CONFIG,
     "De Heeren Gedeputeerden van de Provincie van Zeelandt, hebben ter "
     "Vergaderinge ingebraght en laten lesen de Resolutie van de Heeren "
     "Staten van de hoogh-gemelde Provincie hare Principalen, raeckende "
     "het negotieren van hare quote voor een derde part in de Petitie tot "
     "de extraordinaris Equipage voor het loopende jaer, volgende de "
     "voorschreve Resolutie hier na geinsereert."),
]


@pytest.mark.parametrize(
    "phrases,config,text",
    [pytest.param(p, c, t, id=i) for i, p, c, t in PHRASE_SCENARIOS])
def test_reference_suite_phrase_scenarios(phrases, config, text):
    searcher = make_reference_searcher(phrases, config)
    model = compile_model(phrases, config)
    ref = reference_matches(searcher, text)
    eng = engine_matches(model, text)
    if eng != ref and _tie_key(eng) != _tie_key(ref):
        from tests.oracle import explained_by_attribution_tie

        assert explained_by_attribution_tie(eng, ref, phrases, config), \
            f"text={text!r}"


TOKEN_SCENARIOS = [
    ("simple", ["test"], 'This is a test in which we are testing'),
    ("best_phrase_option", ["best case", "test case"],
     'This is a best test case'),
    ("best_per_text_range", ["best test case"],
     'this is a best test case to test best case matching'),
    ("full_fixture", ["test case"], 'This is a test case'),
]


@pytest.mark.parametrize(
    "phrases,text",
    [pytest.param(p, t, id=i) for i, p, t in TOKEN_SCENARIOS])
def test_reference_suite_token_scenarios(phrases, text):
    import sys

    sys.path.insert(0, "tests/oracle_shims")
    sys.path.insert(0, "/root/reference")
    from fuzzy_search.search.token_searcher import (
        FuzzyTokenSearcher as RefTokenSearcher,
    )

    from fuzzy_search_spark.token_matcher import (
        compile_token_model,
        find_token_matches,
    )

    ref = [(m.phrase.phrase_string, m.string, m.offset, m.end,
            m.levenshtein_similarity)
           for m in RefTokenSearcher(phrase_list=list(phrases))
           .find_matches(text)]
    tm = compile_token_model(list(phrases), None)
    eng = [(m.phrase, m.string, m.offset, m.end, m.levenshtein_similarity)
           for m in find_token_matches(text, tm)]
    assert sorted(eng) == sorted(ref), text
