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
