"""Test-only harness that runs the read-only reference library at
/root/reference as a golden oracle (with pure-Python shims for its missing
C/NLTK deps) and adapts its output to this engine's Match tuples.

Never imported by the engine itself — tests only.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

_SHIM_DIR = os.path.join(os.path.dirname(__file__), "oracle_shims")
_REFERENCE_DIR = os.environ.get("FUZZY_REFERENCE_DIR", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(_REFERENCE_DIR, "fuzzy_search"))


def _ensure_paths() -> None:
    for p in (_SHIM_DIR, _REFERENCE_DIR):
        if p not in sys.path:
            sys.path.insert(0, p)


def make_reference_searcher(phrases, config: Optional[dict] = None):
    _ensure_paths()
    from fuzzy_search.search.phrase_searcher import FuzzyPhraseSearcher

    return FuzzyPhraseSearcher(phrase_list=list(phrases), config=config)


def reference_matches(searcher, text: str, text_id: str = "doc") -> List[tuple]:
    """Run the reference searcher; normalize to comparable tuples."""
    out = []
    for m in searcher.find_matches({"text": text, "id": text_id}):
        out.append((
            m.phrase.phrase_string,
            m.variant.phrase_string,
            m.string,
            m.offset,
            m.end,
            m.character_overlap,
            m.ngram_overlap,
            m.levenshtein_similarity,
        ))
    return out


def engine_matches(model, text: str) -> List[tuple]:
    from fuzzy_search_spark.matcher import find_matches

    return [
        (m.phrase, m.variant, m.string, m.offset, m.end,
         m.char_match, m.ngram_match, m.levenshtein_similarity)
        for m in find_matches(text, model)
    ]


def reference_matches_with_seed(phrases, config, text: str,
                                seed: int) -> List[tuple]:
    """Run the reference in a SUBPROCESS under a specific PYTHONHASHSEED.

    The reference's equal-score tie-breaks iterate sets of Phrase objects,
    so its output on tie documents depends on the interpreter's hash
    randomization — including which of two identical-span main/variant
    candidates survives the per-phrase overlap filter, which can flip a
    whole match row in or out (the variant attribution scores differently
    and may miss a threshold).  Re-running under other seeds enumerates
    the reference's plausible outputs for such documents."""
    import json
    import subprocess

    script = (
        "import sys, json\n"
        f"sys.path.insert(0, {_SHIM_DIR!r})\n"
        f"sys.path.insert(0, {_REFERENCE_DIR!r})\n"
        "from fuzzy_search.search.phrase_searcher import FuzzyPhraseSearcher\n"
        "phrases, config, text = json.load(sys.stdin)\n"
        "s = FuzzyPhraseSearcher(phrase_list=phrases, config=config)\n"
        "out = [[m.phrase.phrase_string, m.variant.phrase_string, m.string,\n"
        "        m.offset, m.end, m.character_overlap, m.ngram_overlap,\n"
        "        m.levenshtein_similarity]\n"
        "       for m in s.find_matches({'text': text, 'id': 'doc'})]\n"
        "print(json.dumps(out))\n"
    )
    env = dict(os.environ, PYTHONHASHSEED=str(seed))
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        text=True, timeout=300,
        input=__import__("json").dumps([list(phrases), config, text]))
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    return [tuple(row) for row in __import__("json").loads(proc.stdout)]


def matches_any_reference_order(eng, phrases, config, text: str,
                                seeds=(0, 2, 5, 13, 29, 41)) -> bool:
    """True if the engine's output equals the reference's output under at
    least one interpreter hash seed."""
    for seed in seeds:
        if eng == reference_matches_with_seed(phrases, config, text, seed):
            return True
    return False
