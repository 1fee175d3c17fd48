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
    """Run the reference in a fresh SUBPROCESS (diagnostic helper).

    The reference's equal-score tie-breaks iterate sets of Phrase
    OBJECTS, which hash by id() — so the tie order depends on allocation
    addresses and varies per process run; PYTHONHASHSEED does not control
    it (the seed here mostly just distinguishes runs).  Sampling fresh
    runs empirically enumerates the reference's plausible outputs for a
    tie document; the DETERMINISTIC in-suite tolerance is
    :func:`explained_by_attribution_tie`."""
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
                                seeds=tuple(range(12))) -> bool:
    """True if the engine's output equals the reference's output in at
    least one of N fresh reference processes (diagnostic sampling of the
    reference's address-order nondeterminism — probabilistic, so tests
    should prefer :func:`explained_by_attribution_tie`)."""
    for seed in seeds:
        if eng == reference_matches_with_seed(phrases, config, text, seed):
            return True
    return False


def explained_by_attribution_tie(eng, ref, phrases, config) -> bool:
    """Deterministic structural tolerance for the reference's second
    tie-break instability class.

    When identical-span candidates from a main phrase and one of its
    variants tie in the reference's per-phrase overlap filter, the
    SURVIVING attribution is an allocation-address coin flip (the
    reference iterates a set of Phrase OBJECTS, whose order PYTHONHASHSEED
    does not even control) — and since the two attributions score
    differently, the whole match row flips in or out of the output.

    The engine-side signature of that flip is narrow and checkable
    without re-running the reference: every symmetric-difference row must
    belong to a phrase family (main + variants) whose score vectors for
    the EXACT matched string STRADDLE the config thresholds — at least
    one family member passes all three score gates and at least one
    fails.  A genuinely wrong match (string the reference could never
    emit, wrong span scoring) fails this predicate for every family
    member on the same side of the gates."""
    from fuzzy_search_spark.config import effective_config
    from fuzzy_search_spark.kernels import strings as S

    cfg = effective_config(config)
    families = {}
    for p in phrases:
        if isinstance(p, str):
            families[p] = [p]
        else:
            families[p["phrase"]] = [p["phrase"]] + \
                list(p.get("variants", []) or [])

    def passes(family_member: str, string: str) -> bool:
        a, b = family_member, string
        if cfg.ignorecase:
            a, b = a.lower(), b.lower()
        char_m, ngram_m, lev_m = S.cached_match_scores(a, b, cfg.ngram_size)
        return (char_m >= cfg.char_match_threshold
                and ngram_m >= cfg.ngram_threshold
                and lev_m >= cfg.levenshtein_threshold)

    # a divergent doc can mix both classes: first cancel class-(a)
    # attribution flips pairwise — rows from opposite sides that agree on
    # (phrase, string, offsets, lev) and differ only in the variant
    # attribution (and hence the variant-derived char/ngram scores)
    from collections import Counter

    def akey(row):
        return (row[0], row[2], row[3], row[4], row[7])

    eng_c = Counter(map(akey, set(eng) - set(ref)))
    ref_c = Counter(map(akey, set(ref) - set(eng)))
    residual_keys = set((eng_c - ref_c) | (ref_c - eng_c))

    for row in set(eng) ^ set(ref):
        if akey(row) not in residual_keys:
            continue  # cancelled attribution flip
        phrase, string = row[0], row[2]
        fam = families.get(phrase)
        if not fam or len(fam) < 2:
            return False
        verdicts = {passes(f, string) for f in fam}
        if verdicts != {True, False}:
            return False
    return True
