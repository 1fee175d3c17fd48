"""The inlined hot-loop sweep must be exactly equivalent to the
reference-shaped `_Partial` state machine (kept in matcher.py as the
readable specification), including the incremental skip-count overlap."""

import random

from fuzzy_search_spark import matcher
from fuzzy_search_spark.matcher import _Candidate, _Partial, _sweep_candidates
from fuzzy_search_spark.model import compile_model


def _spec_sweep(cp, grams, text, thr, mlv, gap_limit):
    """Straight transcription of the reference sweep over _Partial."""
    candidates = []
    partial = _Partial(cp, mlv)
    last = len(grams) - 1

    def emit():
        if partial.start == partial.end:
            return
        string = text[partial.start:partial.end]
        if not candidates or not (candidates[-1].start == partial.start
                                  and candidates[-1].end == partial.end):
            candidates.append(_Candidate(cp, partial.start, partial.end,
                                         string, partial.count_overlap()))
        if partial.shift_start():
            if partial.start != partial.end:
                candidates.append(
                    _Candidate(cp, partial.start, partial.end,
                               text[partial.start:partial.end],
                               partial.count_overlap()))

    for ci, gram in enumerate(grams):
        partial.add(gram)
        if partial.is_match(thr):
            emit()
        next_start = grams[ci + 1][1] if ci < last else None
        if next_start and next_start - gram[1] > gap_limit:
            partial = _Partial(cp, mlv)
    if partial.is_match(thr):
        emit()
    return candidates


def test_inlined_sweep_equals_spec():
    model = compile_model(
        ["den .. Januarii 1725", "PRAESIDE", "test case"],
        {"char_match_threshold": 0.5, "levenshtein_threshold": 0.5,
         "max_length_variance": 3},
    )
    rng = random.Random(99)
    vocab = ["den", "Jan", "Januarii", "1725", "den .. Januarii 1725",
             "dn Januarii  1725", "JanJanJan", "den den den", "17251725",
             "PRAESIDE", "PRSIDE", "tst case", "case test", "xx"]
    checked = 0
    for _ in range(400):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40)))
        hits = model.scanner.scan(text)
        for cp in model.phrases.values():
            grams = [g for g in hits if g[0] in cp.gram_set]
            if not grams:
                continue
            spec = _spec_sweep(cp, grams, text, 0.2, 3, 5)
            fast = _sweep_candidates(cp, grams, text, 0.2, 3, 5)
            assert [(c.start, c.end, c.string, c.skip_count_overlap)
                    for c in fast] == \
                   [(c.start, c.end, c.string, c.skip_count_overlap)
                    for c in spec], text
            checked += len(spec)
    assert checked > 100


def test_local_id_sweep_equals_generic():
    """The local-id sweep (dense per-phrase tables, list-indexed state)
    must reproduce the generic dict/set sweep exactly, including the
    skip-count overlap score."""
    model = compile_model(
        ["den .. Januarii 1725", "PRAESIDE", "test case"],
        {"char_match_threshold": 0.5, "levenshtein_threshold": 0.5,
         "max_length_variance": 3},
    )
    rng = random.Random(1234)
    vocab = ["den", "Jan", "Januarii", "1725", "den .. Januarii 1725",
             "dn Januarii  1725", "JanJanJan", "den den den", "17251725",
             "PRAESIDE", "PRSIDE", "tst case", "case test", "xx"]
    checked = 0
    for _ in range(400):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40)))
        hits = model.scanner.scan(text)
        for cp in model.phrases.values():
            grams = [g for g in hits if g[0] in cp.gram_set]
            if not grams:
                continue
            key_to_loc = {int(k): i
                          for i, k in enumerate(cp.sorted_keys_np.tolist())}
            lk = [key_to_loc[g[0]] for g in grams]
            gs = [g[1] for g in grams]
            gl = [g[2] for g in grams]
            generic = _sweep_candidates(cp, grams, text, 0.2, 3, 5)
            local = matcher._sweep_candidates_local(cp, lk, gs, gl, text,
                                                    0.2, 3, 5)
            assert [(c.start, c.end, c.string, c.skip_count_overlap)
                    for c in local] == \
                   [(c.start, c.end, c.string, c.skip_count_overlap)
                    for c in generic], text
            checked += len(generic)
    assert checked > 100
