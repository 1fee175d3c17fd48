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
    normalized: str       # lowercased iff ignorecase, else the original string


def wordpunct_spans(text: str) -> Iterator[tuple]:
    """(token, start, end) spans using the WordPunct pattern."""
    for m in WORDPUNCT_RE.finditer(text):
        yield m.group(0), m.start(), m.end()


def tokenize(text: str, ignorecase: bool = False) -> List[TokenSpan]:
    """Tokenize a document into TokenSpans (reference Doc/Token parity)."""
    doc_len = len(text)
    out = []
    for ti, (string, start, _end) in enumerate(wordpunct_spans(text)):
        norm = string.lower() if ignorecase else string
        out.append(TokenSpan(
            string=string,
            index=ti,
            char_index=start,
            char_end_index=doc_len - (start + len(string) + 1),
            normalized=norm,
        ))
    return out


def regex_split_spans(text: str, split_pattern: str = r"\s+"):
    """RegExTokenizer split-pattern mode (reference token.py:527-538):
    tokens are the unmatched segments between split matches.  Quirk kept
    for parity: the final tail segment is yielded even when empty (the
    reference yields it unconditionally)."""
    char_index = 0
    for m in re.finditer(split_pattern, text):
        token_string = text[char_index:m.start()]
        if token_string:
            yield token_string, m.start() - len(token_string)
        char_index = m.end()
    yield text[char_index:], char_index


def regex_token_spans(text: str, token_pattern: str):
    """RegExTokenizer token-pattern mode (reference token.py:540-543)."""
    for m in re.finditer(token_pattern, text):
        yield m.group(0), m.start()


def custom_token_spans(text: str, tokenizer_func):
    """CustomTokenizer offset recovery (reference token.py:579-597): the
    user function returns token strings; offsets are recovered by a
    progressive index() scan over the remaining text, so repeated tokens
    anchor left-to-right."""
    remaining = text
    consumed = 0
    for token_string in tokenizer_func(text):
        i = remaining.index(token_string)
        yield token_string, i + consumed
        consumed += i + len(token_string)
        remaining = remaining[i + len(token_string):]


DOC_START = "<DOC>"
DOC_END = "</DOC>"


def spans_to_tokens(text: str, spans, ignorecase: bool = False,
                    include_boundary_tokens: bool = False) -> List[TokenSpan]:
    """(string, start) spans -> TokenSpans with the reference's
    char_end_index formula and optional <DOC>/</DOC> boundary tokens
    (token.py:451-463)."""
    doc_len = len(text)
    out: List[TokenSpan] = []
    # boundary tokens: the reference passes normalised_string='' but
    # Token.__init__ treats '' as falsy and falls back to the string itself
    # (token.py:112), so the normalized form IS '<DOC>'/'</DOC>'.
    if include_boundary_tokens:
        out.append(TokenSpan(DOC_START, 0, 0, doc_len, DOC_START))
    for string, start in spans:
        out.append(TokenSpan(
            string=string,
            index=len(out),
            char_index=start,
            char_end_index=doc_len - (start + len(string) + 1),
            normalized=string.lower() if ignorecase else string,
        ))
    if include_boundary_tokens:
        out.append(TokenSpan(DOC_END, len(out), doc_len, 0, DOC_END))
    return out
