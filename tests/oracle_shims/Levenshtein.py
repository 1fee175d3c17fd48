"""Pure-Python stand-in for the C `Levenshtein` package, used ONLY so the
read-only reference library at /root/reference can run as a golden test
oracle inside this sandbox (the C extension is not installed here).

Semantics match the published python-Levenshtein / rapidfuzz API:

- ``distance(s1, s2)``: unit-cost edit distance (ins/del/sub all cost 1).
- ``ratio(s1, s2)``: normalized indel similarity,
  ``(len1 + len2 - d_indel) / (len1 + len2)`` where ``d_indel`` is the
  edit distance with substitution cost 2 (equivalently
  ``2 * LCS / (len1 + len2)``).
- Optional ``score_cutoff``: for ``ratio``, results below the cutoff are
  returned as 0.0; for ``distance``, results above are returned as
  ``score_cutoff + 1``.
"""


def distance(s1: str, s2: str, score_cutoff=None) -> int:
    if s1 == s2:
        return 0
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s1) + 1))
    for i2, c2 in enumerate(s2):
        cur = [i2 + 1]
        for i1, c1 in enumerate(s1):
            if c1 == c2:
                cur.append(prev[i1])
            else:
                cur.append(1 + min(prev[i1], prev[i1 + 1], cur[-1]))
        prev = cur
    d = prev[-1]
    if score_cutoff is not None and d > score_cutoff:
        return score_cutoff + 1
    return d


def _lcs_length(s1: str, s2: str) -> int:
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    prev = [0] * (len(s1) + 1)
    for c2 in s2:
        cur = [0]
        for i1, c1 in enumerate(s1):
            if c1 == c2:
                cur.append(prev[i1] + 1)
            else:
                cur.append(max(prev[i1 + 1], cur[-1]))
        prev = cur
    return prev[-1]


def ratio(s1: str, s2: str, score_cutoff=None) -> float:
    total = len(s1) + len(s2)
    if total == 0:
        return 1.0
    sim = (2 * _lcs_length(s1, s2)) / total
    if score_cutoff is not None and sim < score_cutoff:
        return 0.0
    return sim
