"""End-to-end matcher goldens mirrored from the reference test suite
(test/test_search_phrase_searcher.py) plus self-contained pins, so the suite
passes even without the reference checkout."""

import pytest

from fuzzy_search_spark.matcher import find_matches
from fuzzy_search_spark.model import compile_model

README_CONFIG = {
    "char_match_threshold": 0.6,
    "ngram_threshold": 0.5,
    "levenshtein_threshold": 0.6,
    "ignorecase": False,
    "max_length_variance": 3,
    "ngram_size": 2,
    "skip_size": 2,
}

README_PHRASES = ["PRAESIDE", "PRAESENTIBUS", "Veneris", "Mercurii",
                  "den .. Januarii 1725"]

TEXT1 = (
    "ie Veucris den 5. Januaris 1725. PR&ASIDE, Den Heere Bentinck. "
    "PRASENTIEBUS, De Heeren Jan Welderen , van Dam, Torck , met een "
    "extraordinaris Gedeputeerde uyt de Provincie van Gelderlandt. Van "
    "Maasdam , vanden Boetzelaer , Noordwyck , met een extraordinaris "
    "Gedeputeerde uyt de Provincie van Hollandt ende Westvrieslandt. "
    "Velters, Ockersse , Noey; van Hoorn , met een extraordinaris "
    "Gedeputeerde uyt de Provincie van Zeelandt. Van Renswoude , van "
    "Voor{t. Van Schwartzenbergh, vander Waayen, Vegilin Van Claerbergen."
)

TEXT2 = (
    "Mercuri: den 10. Jangarii, 1725. ia PRESIDE, Den Heere an Iddekinge. "
    "PRA&SENTIBUS, De Heeren /an Welderen , van Dam, van Wynbergen, Torck, "
    "met een extraordinaris Gedeputeerde uyt de Provincie van Gelderland. "
    "Van Maasdam , van der Goes , Raadtpenfionaris van Hoornbeeck"
)


@pytest.fixture(scope="module")
def readme_model():
    return compile_model(README_PHRASES, README_CONFIG)


class TestReadmeGoldens:
    def test_text1_matches(self, readme_model):
        got = [
            (m.phrase, m.string, m.offset, m.end, m.char_match,
             m.ngram_match, m.levenshtein_similarity)
            for m in find_matches(TEXT1, readme_model)
        ]
        assert got == [
            ("Veneris", "Veucris", 3, 10,
             0.7142857142857143, 0.625, 0.7142857142857143),
            ("den .. Januarii 1725", "den 5. Januaris 1725", 11, 31,
             0.9, 0.8095238095238095, 0.9),
            ("PRAESIDE", "PR&ASIDE", 33, 41,
             0.875, 0.6666666666666666, 0.875),
            ("PRAESENTIBUS", "PRASENTIEBUS", 63, 75,
             1.0, 0.7692307692307693, 0.9166666666666666),
            ("Veneris", "Velters", 322, 329,
             0.7142857142857143, 0.5, 0.7142857142857143),
        ]

    def test_text2_match_count_and_strings(self, readme_model):
        got = find_matches(TEXT2, readme_model)
        assert [m.string for m in got] == [
            "Mercuri", "den 10. Jangarii, 1725", "PRESIDE", "PRA&SENTIBUS"
        ]
        assert [m.phrase for m in got] == [
            "Mercurii", "den .. Januarii 1725", "PRAESIDE", "PRAESENTIBUS"
        ]


class TestExactMatching:
    def test_exact_word_boundary(self):
        model = compile_model(["test"], {"use_word_boundaries": True})
        got = find_matches("this is a test and another test.", model)
        assert [(m.string, m.offset, m.levenshtein_similarity) for m in got] \
            == [("test", 10, 1.0), ("test", 27, 1.0)]

    def test_exact_no_mid_word(self):
        model = compile_model(["test"], {"use_word_boundaries": True,
                                         "char_match_threshold": 0.9,
                                         "ngram_threshold": 0.9,
                                         "levenshtein_threshold": 0.9})
        got = find_matches("this is testing attestation", model)
        assert all(m.string == "test" and m.exact for m in got) is True or got == []

    def test_exact_substring_mode(self):
        model = compile_model(["test"], {"use_word_boundaries": False})
        got = [m for m in find_matches("attestation", model) if m.exact]
        assert [(m.string, m.offset) for m in got] == [("test", 2)]


class TestVariantsAndDistractors:
    def test_variant_resolves_to_main(self):
        model = compile_model(
            [{"phrase": "PRAESENTIBUS",
              "variants": ["Present de Heeren", "Pntes die voors"]}],
            {"include_variants": True, "char_match_threshold": 0.6,
             "levenshtein_threshold": 0.6},
        )
        got = find_matches("hier zijn Presant de Heeren aanwezig", model)
        assert len(got) == 1
        assert got[0].phrase == "PRAESENTIBUS"
        assert got[0].variant == "Present de Heeren"

    def test_distractor_rejects(self):
        model = compile_model(
            [{"phrase": "baking", "distractors": ["braking"]}],
            {"filter_distractors": True, "char_match_threshold": 0.5,
             "levenshtein_threshold": 0.5},
        )
        # 'braking' scores higher against the distractor -> dropped
        got = find_matches("I was braking bread", model)
        assert got == []
        got = find_matches("I was bakin bread", model)
        assert [m.string for m in got] == ["bakin"]


class TestOffsetsAndConfig:
    def test_max_start_offset(self):
        model = compile_model(
            [{"phrase": "test", "max_start_offset": 1}],
            {"use_word_boundaries": True},
        )
        assert [m.offset for m in find_matches("test it now", model)] == [0]
        assert find_matches("now test it", model) == []

    def test_ignorecase(self):
        model = compile_model(["PRAESIDE"],
                              {"ignorecase": True, "char_match_threshold": 0.6,
                               "levenshtein_threshold": 0.6})
        got = find_matches("de praeside was aanwezig", model)
        assert [m.string for m in got] == ["praeside"]

    def test_empty_and_tiny_inputs(self):
        model = compile_model(["PRAESIDE"], README_CONFIG)
        assert find_matches("", model) == []
        assert find_matches("P", model) == []
        assert find_matches(".....", model) == []

    def test_deterministic_across_calls(self, readme_model):
        a = find_matches(TEXT1, readme_model)
        b = find_matches(TEXT1, readme_model)
        assert a == b


class TestHardLengthVariance:
    def test_glued_words(self):
        # reference TestSearcherRealData2: 'AduiraliteytVrieslaidt' must
        # match 'Admiraliteyt' with word boundaries off
        model = compile_model(
            ["Admiraliteyt"],
            {"char_match_threshold": 0.6, "ngram_threshold": 0.5,
             "levenshtein_threshold": 0.6, "use_word_boundaries": False,
             "max_length_variance": 3},
        )
        got = find_matches("AduiraliteytVrieslaidt", model)
        assert len(got) == 1
        assert got[0].offset == 0


def test_engine_deterministic_across_hash_seeds():
    """Unlike the reference (set-iteration tie-breaks flip with the
    interpreter's hash seed — see test_reference_parity), this engine's
    output is bit-identical under any PYTHONHASHSEED: a hard requirement
    for resumable distributed jobs, where retried tasks must reproduce
    their partition's rows exactly."""
    import json
    import os
    import subprocess
    import sys

    script = (
        "import sys, json\n"
        "sys.path.insert(0, '.')\n"
        "from tests.test_matcher_golden import README_CONFIG, "
        "README_PHRASES, TEXT1, TEXT2\n"
        "from fuzzy_search_spark.model import compile_model\n"
        "from fuzzy_search_spark.matcher import find_matches\n"
        "m = compile_model(README_PHRASES, README_CONFIG)\n"
        "out = [[x.phrase, x.variant, x.string, x.offset, x.end,\n"
        "        x.char_match, x.ngram_match, x.levenshtein_similarity]\n"
        "       for t in (TEXT1, TEXT2) for x in find_matches(t, m)]\n"
        "print(json.dumps(out))\n"
    )
    outs = set()
    for seed in (0, 1, 2, 13):
        env = dict(os.environ, PYTHONHASHSEED=str(seed))
        proc = subprocess.run([sys.executable, "-c", script], env=env,
                              capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr[-1500:]
        outs.add(proc.stdout.strip())
    assert len(outs) == 1, "engine output varies with hash seed"


def test_compiled_model_pickle_roundtrip_matches():
    """The compiled model is broadcast to executors pickled; the unpickled
    copy (including the local-id sweep tables) must match identically."""
    import pickle

    from fuzzy_search_spark.fixtures import README_CONFIG, README_MODEL
    from fuzzy_search_spark.matcher import find_matches
    from fuzzy_search_spark.model import compile_model

    model = compile_model(README_MODEL, README_CONFIG)
    clone = pickle.loads(pickle.dumps(model))
    text = ("ie Veucris den 5. Januaris 1725. PR&ASIDE den Heere "
            "Mercurli en PRAESENTIBUS rapport van Vencris")
    a = find_matches(text, model)
    b = find_matches(text, clone)
    assert [(m.phrase, m.variant, m.string, m.offset, m.end,
             m.levenshtein_similarity) for m in a] == \
           [(m.phrase, m.variant, m.string, m.offset, m.end,
             m.levenshtein_similarity) for m in b]
    assert a, "expected at least one match in the fixture text"
    for cp in clone.phrases.values():
        assert cp.loc_freq is not None and cp.loc_early is not None
