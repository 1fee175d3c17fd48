"""Word-boundary snapping of candidate match spans.

Semantics contract (reference: match/match_offsets.py:120-443):

- The start offset may move left by at most 2 chars to reach a word boundary,
  or right past a non-word prefix; otherwise the candidate is rejected.
- The end offset is decided by a 3-char type-map decision table over
  (phrase tail, match tail, text suffix), where each char maps to 'w'
  (word-ish) or 's' (space/punct).  When the phrase itself ends in
  punctuation, only whitespace counts as 's' (the reference's documented
  "ugly hack", match_offsets.py:186-196).

One deliberate divergence: (phrase_end, match_end, text_suffix) combinations
the reference does not cover raise ValueError there (a crash); at 10^12-doc
scale a crash on one document is unacceptable, so uncovered combinations
reject the candidate (return None) instead.  The reference's own test suite
never reaches such a combination, so golden parity is unaffected.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

from fuzzy_search_spark.kernels.strings import (
    NON_WORD_AFFIXES_1,
    non_word_prefix,
)

_WHITESPACE = " \t\n\r"


@lru_cache(maxsize=65536)
def type_map(affix: str, punctuation: str, whitespace_only: bool = False) -> str:
    """Map each char to 'w' (word) or 's' (separator).  Cached: the hot
    path calls this on <=3-char tails, which repeat heavily across
    candidates (punctuation is a fixed config string, so the key is
    small)."""
    if whitespace_only:
        return "".join("s" if c in _WHITESPACE else "w" for c in affix)
    return "".join(
        "s" if (c in _WHITESPACE or c in punctuation) else "w" for c in affix
    )


def snap_start(text: str, match_string: str, offset: int) -> Optional[int]:
    """Move the start offset onto a word boundary; None when impossible."""
    prefix = non_word_prefix(match_string)
    if prefix:
        # candidate begins with a separator: start just after it
        return offset + len(prefix)
    if offset == 0:
        return 0
    if offset == 1 and text[0] not in NON_WORD_AFFIXES_1:
        return 0
    if text[offset - 1:offset] in NON_WORD_AFFIXES_1:
        return offset
    if offset > 1 and text[offset - 2:offset - 1] in NON_WORD_AFFIXES_1:
        return offset - 1
    if offset == 2 and text[0] not in NON_WORD_AFFIXES_1:
        return 0
    if offset > 2 and text[offset - 3:offset - 2] in NON_WORD_AFFIXES_1:
        return offset - 2
    return None


def snap_end(phrase_string: str, candidate_string: str, text: str,
             end_offset: int, punctuation: str) -> Optional[int]:
    """Move the end offset onto a word boundary; None when impossible."""
    tail = phrase_string[-1]
    whitespace_only = tail in punctuation or (
        len(phrase_string) > 1
        and tail in " \t\r\n"
        and phrase_string[-2] in punctuation
    )
    phrase_end = type_map(phrase_string[-3:], punctuation, whitespace_only)
    match_end = type_map(candidate_string[-3:], punctuation, whitespace_only)
    text_suffix = type_map(text[end_offset:end_offset + 3], punctuation,
                           whitespace_only)
    return _end_shift(phrase_end, match_end, text_suffix, end_offset)


def _end_shift(pe: str, me: str, ts: str, end: int) -> Optional[int]:
    """The end-offset decision table.  `pe`/`me`/`ts` are the 3-char type
    maps of phrase tail, match tail and following text; returns the adjusted
    end offset or None to reject."""
    if pe == me and (ts == "" or ts[0] == "s"):
        return end
    if pe.endswith("s") and me.endswith("s"):
        return end
    if me == "wss":
        return end - 2

    if pe == "www":
        if me == "www":
            # match ends mid-word: extend into the text's word tail
            if ts == "w" or ts.startswith("ws"):
                return end + 1
            if ts == "ww" or ts.startswith("wws"):
                return end + 2
            return None  # text continues with >= 3 word chars (or no suffix)
        if me == "wws":
            return end - 1
        if me == "wsw":
            if ts == "" or ts.startswith("s"):
                return end  # inner gap treated as a misrecognised word char
            return end - 2  # gap was real: cut back to before it
        if me == "sww":
            if ts == "" or ts.startswith("s"):
                return end
            return None
        if me == "sws":
            return end - 1
        return None  # includes "ssw"

    if pe == "wws":
        if me == "www":
            if ts == "":
                return end
            if ts.startswith("s"):
                return end + 1
            if ts.startswith("ws") and ts != "w":
                return end + 2
            return None
        if me.startswith("ws"):
            return end - 1
        if me.startswith("s"):
            return end - 2
        return None

    if pe == "sww":
        if me == "sww":
            if ts == "w" or ts.startswith("ws"):
                return end + 1
            return None
        if me == "sws":
            return end - 1
        if me == "www":
            if ts == "" or ts.startswith("s"):
                return end
            return None
        if me == "wsw":
            if ts == "" or ts.startswith("s"):
                return end
            if ts.startswith("ws"):
                return end + 1
            if ts == "ww" or ts.startswith("wws"):
                return end + 2
            return None
        if me == "ssw":
            if ts == "" or ts.startswith("s"):
                return end
            if ts == "w" or ts.startswith("ws"):
                return end + 1
            if ts == "ww" or ts.startswith("wws"):
                return end + 1
            return None
        return None

    if pe == "sws":
        if me == "www":
            if ts == "sw" or ts == "sws":
                return end + 2
            return None
        if me == "sww":
            return end - 2
        if me == "wsw":
            if ts == "":
                return end
            if ts.startswith("s"):
                return end + 1
            return end - 1
        return None

    if pe == "wsw":
        if me == "wsw":
            if ts == "w" or ts.startswith("ws"):
                return end + 1
            return None
        if me == "www":
            if ts == "" or ts == "s":
                return end
            if ts.startswith("w"):
                return None
            if ts == "sw" or ts == "sws":
                return end + 2
            return None
        if me == "sww":
            if ts == "":
                return end + 1
            if ts.startswith("s"):
                return end
            return None
        if me == "ssw":
            if ts == "" or ts.startswith("s"):
                return end
            return None
        return None

    if len(pe) < 3:
        return end if pe == me else None

    # combination not covered by the reference's table (it would raise);
    # reject the candidate instead of crashing a 1000-executor job.
    return None


def snap_span(phrase_string: str, candidate_string: str, text: str,
              start_offset: int, end_offset: int,
              punctuation: str) -> Optional[Tuple[str, int, int]]:
    """Snap a candidate span to word boundaries.

    Returns (match_string, start, end) or None when the span cannot be
    aligned (reference: match_offsets.py:221-269).
    """
    start = snap_start(text, candidate_string, start_offset)
    if start is None:
        return None
    end = snap_end(phrase_string, candidate_string, text, end_offset,
                   punctuation)
    if end is None or end <= start:
        return None
    return text[start:end], start, end


# ---------------------------------------------------------------------------
# Reference-surface aliases (match/match_offsets.py:120-296): the published
# function names, as thin shells over the snap_* kernels above.  `text` is
# the reference's text dict ({'text': ..., 'id': ...}).
# ---------------------------------------------------------------------------


def map_string(affix_string: str, punctuation: str,
               whitespace_only: bool = False, debug: int = 0) -> str:
    """Reference map_string (match_offsets.py:272-296)."""
    return type_map(affix_string, punctuation, whitespace_only)


def adjust_match_start_offset(text: dict, match_string: str,
                              match_offset: int,
                              debug: int = 0) -> Optional[int]:
    """Reference adjust_match_start_offset (match_offsets.py:120-163)."""
    return snap_start(text["text"], match_string, match_offset)


def adjust_match_end_offset(phrase_string: str, candidate_string: str,
                            text: dict, end_offset: int, punctuation: str,
                            debug: int = 0) -> Optional[int]:
    """Reference adjust_match_end_offset (match_offsets.py:166-218)."""
    return snap_end(phrase_string, candidate_string, text["text"],
                    end_offset, punctuation)


def adjust_match_offsets(phrase_string: str, candidate_string: str,
                         text: dict, candidate_start_offset: int,
                         candidate_end_offset: int,
                         punctuation: str = None,
                         debug: int = 0) -> Optional[dict]:
    """Reference adjust_match_offsets (match_offsets.py:221-269)."""
    import string as _string

    if punctuation is None:
        punctuation = _string.punctuation
    res = snap_span(phrase_string, candidate_string, text["text"],
                    candidate_start_offset, candidate_end_offset,
                    punctuation)
    if res is None:
        return None
    match_string, start, end = res
    return {"match_string": match_string, "match_start_offset": start,
            "match_end_offset": end}
