"""Run the reference library's OWN test files against this repo's drop-in
classes (north rule: verified on the reference's own pytest suite).

Each case boots a subprocess that patches the reference module's class
attributes to ours BEFORE pytest collects the reference test file — the
test module's ``from fuzzy_search... import X`` then binds to the
facade.  Exit 0 means every test the reference wrote for its own class
passes against the drop-in replacement."""

import os
import subprocess
import sys

import pytest

from tests.oracle import _REFERENCE_DIR, _SHIM_DIR, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

# (ref module -> facade class) patch sets; kexpr excludes tests that poke
# NON-CONTRACT INTERNALS (SkipMatches/CandidatePartial/PartialPhraseMatch
# objects, token_skipgram_index internals, Phrase-object identity in sets)
# — every behavioral test runs
CASES = [
    pytest.param(
        [("fuzzy_search.phrase.phrase_model",
          {"PhraseModel": "fuzzy_search_spark.phrase_model:PhraseModel"})],
        "test/test_phrase_phrase_model.py", None, id="phrase_model"),
    pytest.param(
        [("fuzzy_search.tokenization.vocabulary",
          {"Vocabulary": "fuzzy_search_spark.analysis.vocabulary:Vocabulary"})],
        "test/test_tokenization_vocabulary.py", None, id="vocabulary"),
    pytest.param(
        [("fuzzy_search.tokenization.token",
          {name: f"fuzzy_search_spark.doc:{name}"
           for name in ("Tokenizer", "RegExTokenizer", "CustomTokenizer",
                        "Token", "Doc")})],
        "test/test_tokenization_token.py", None, id="token_tokenizer"),
    pytest.param(
        [("fuzzy_search.phrase.phrase",
          {"text2skipgrams":
           "fuzzy_search_spark.kernels.skipgrams:text2skipgrams",
           "Phrase": "fuzzy_search_spark.phrase_model:Phrase"}),
         ("fuzzy_search.tokenization.token",
          {name: f"fuzzy_search_spark.doc:{name}"
           for name in ("Tokenizer", "Token", "Doc")})],
        "test/test_phrase_phrase.py", None, id="phrase"),
    pytest.param(
        [("fuzzy_search.pattern.fuzzy_template",
          {"FuzzyTemplate": "fuzzy_search_spark.compat:FuzzyTemplate",
           "FuzzyTemplateGroupElement":
           "fuzzy_search_spark.compat:FuzzyTemplateGroupElement",
           "FuzzyTemplateLabelElement":
           "fuzzy_search_spark.compat:FuzzyTemplateLabelElement"}),
         ("fuzzy_search.phrase.phrase",
          {"Phrase": "fuzzy_search_spark.phrase_model:Phrase"}),
         ("fuzzy_search.phrase.phrase_model",
          {"PhraseModel": "fuzzy_search_spark.phrase_model:PhraseModel"})],
        "test/test_pattern_template.py", None, id="pattern_template"),
    pytest.param(
        [("fuzzy_search.search.searcher",
          {"FuzzySearcher": "fuzzy_search_spark.compat:FuzzySearcher"}),
         ("fuzzy_search.tokenization.token",
          {name: f"fuzzy_search_spark.doc:{name}"
           for name in ("Tokenizer", "Token", "Doc")})],
        "test/test_search_searcher.py", None, id="base_searcher"),
    pytest.param(
        [("fuzzy_search.search.phrase_searcher",
          {"FuzzyPhraseSearcher":
           "fuzzy_search_spark.compat:FuzzyPhraseSearcher"})],
        "test/test_search_phrase_searcher.py",
        "not (test_can_generate_skip_matches or "
        "test_can_filter_skipgram_threshold or test_can_get_candidates or "
        "test_finds_multiple_candidates or "
        "test_can_add_phrases_as_phrase_objects)",
        id="phrase_searcher"),
    pytest.param(
        [("fuzzy_search.search.token_searcher",
          {"FuzzyTokenSearcher":
           "fuzzy_search_spark.compat:FuzzyTokenSearcher"}),
         ("fuzzy_search.tokenization.vocabulary",
          {"Vocabulary": "fuzzy_search_spark.analysis.vocabulary:Vocabulary"}),
         ("fuzzy_search.tokenization.token",
          {name: f"fuzzy_search_spark.doc:{name}"
           for name in ("Tokenizer", "Token", "Doc")})],
        "test/test_search_token_searcher.py",
        "not (TestTokenSearcherMatchType or TestPartialPhraseMatch or "
        "TestTokenSkipgramMatches or "
        "test_token_searcher_has_token_skipgram_index)",
        id="token_searcher"),
    pytest.param(
        [("fuzzy_search.search.context_searcher",
          {"FuzzyContextSearcher":
           "fuzzy_search_spark.compat:FuzzyContextSearcher"})],
        "test/test_search_context_searcher.py", None, id="context_searcher"),
    pytest.param(
        [("fuzzy_search.search.template_searcher",
          {"FuzzyTemplateSearcher":
           "fuzzy_search_spark.compat:FuzzyTemplateSearcher",
           "FuzzyTemplate": "fuzzy_search_spark.compat:FuzzyTemplate"}),
         ("fuzzy_search.pattern.fuzzy_template",
          {"FuzzyTemplate": "fuzzy_search_spark.compat:FuzzyTemplate"})],
        "test/test_search_template_searcher.py", None, id="template_searcher"),
]


@pytest.mark.parametrize("patch_sets,test_file,kexpr", CASES)
def test_reference_suite_with_dropin(patch_sets, test_file, kexpr):
    patch_lines = []
    for ref_module, patches in patch_sets:
        patch_lines.append(
            f"refmod = importlib.import_module('{ref_module}')")
        for name, mod_colon in patches.items():
            mod, attr = mod_colon.split(":")
            patch_lines.append(
                f"setattr(refmod, '{name}', getattr("
                f"importlib.import_module('{mod}'), '{attr}'))")
    args = [os.path.join(_REFERENCE_DIR, test_file), "-q",
            "-p", "no:cacheprovider"]
    if kexpr:
        args += ["-k", kexpr]
    script = (
        "import sys\n"
        f"sys.path.insert(0, {os.getcwd()!r})\n"
        f"sys.path.insert(0, {_SHIM_DIR!r})\n"
        f"sys.path.insert(0, {_REFERENCE_DIR!r})\n"
        "import importlib\n"
        + "\n".join(patch_lines) + "\n"
        "import pytest\n"
        f"raise SystemExit(pytest.main({args!r}))\n"
    )
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-1000:]
