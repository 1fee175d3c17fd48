"""Word/punctuation tokenization kernel.

The reference's base tokenizer is NLTK's WordPunctTokenizer
(tokenization/token.py:416-437, lazily imported).  Its documented public
behavior is the regexp tokenizer with pattern ``\\w+|[^\\w\\s]+`` over the
text; spans are (start, end) char offsets.  This module vendors exactly
that, plus the reference's ``char_end_index`` formula
(token.py:455: ``len(doc) - (char_index + len(token) + 1)``).
"""

from __future__ import annotations

import re
from typing import Iterator, List, NamedTuple

WORDPUNCT_RE = re.compile(r"\w+|[^\w\s]+")


class TokenSpan(NamedTuple):
    string: str
    index: int            # token position in the document
    char_index: int       # start char offset
    char_end_index: int   # reference's end-distance quirk, kept for parity
    normalized: str       # lowercased form


def wordpunct_spans(text: str) -> Iterator[tuple]:
    """(token, start, end) spans using the WordPunct pattern."""
    for m in WORDPUNCT_RE.finditer(text):
        yield m.group(0), m.start(), m.end()


def tokenize(text: str, ignorecase: bool = False) -> List[TokenSpan]:
    """Tokenize a document into TokenSpans (reference Doc/Token parity)."""
    doc_len = len(text)
    out = []
    for ti, (string, start, _end) in enumerate(wordpunct_spans(text)):
        norm = string.lower() if not ignorecase else string.lower()
        out.append(TokenSpan(
            string=string,
            index=ti,
            char_index=start,
            char_end_index=doc_len - (start + len(string) + 1),
            normalized=norm,
        ))
    return out
