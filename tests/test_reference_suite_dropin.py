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

CASES = [
    pytest.param(
        "fuzzy_search.phrase.phrase_model",
        {"PhraseModel": "fuzzy_search_spark.phrase_model:PhraseModel"},
        "test/test_phrase_phrase_model.py", id="phrase_model"),
    pytest.param(
        "fuzzy_search.tokenization.vocabulary",
        {"Vocabulary": "fuzzy_search_spark.analysis.vocabulary:Vocabulary"},
        "test/test_tokenization_vocabulary.py", id="vocabulary"),
    pytest.param(
        "fuzzy_search.tokenization.token",
        {name: f"fuzzy_search_spark.doc:{name}"
         for name in ("Tokenizer", "RegExTokenizer", "CustomTokenizer",
                      "Token", "Doc")},
        "test/test_tokenization_token.py", id="token_tokenizer"),
]


@pytest.mark.parametrize("ref_module,patches,test_file", CASES)
def test_reference_suite_with_dropin(ref_module, patches, test_file):
    patch_lines = "\n".join(
        "import importlib\n"
        f"_m = importlib.import_module('{mod_colon.split(':')[0]}')\n"
        f"setattr(refmod, '{name}', getattr(_m, '{mod_colon.split(':')[1]}'))"
        for name, mod_colon in patches.items())
    script = (
        "import sys\n"
        f"sys.path.insert(0, {os.getcwd()!r})\n"
        f"sys.path.insert(0, {_SHIM_DIR!r})\n"
        f"sys.path.insert(0, {_REFERENCE_DIR!r})\n"
        f"import importlib\n"
        f"refmod = importlib.import_module('{ref_module}')\n"
        f"{patch_lines}\n"
        "import pytest\n"
        f"raise SystemExit(pytest.main([r'{os.path.join(_REFERENCE_DIR, test_file)}', "
        "'-q', '-p', 'no:cacheprovider']))\n"
    )
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-1000:]
