"""Reference-shaped Token / Doc objects and Tokenizer classes.

Reference surface: ``fuzzy_search/tokenization/token.py`` — ``Token``
(string / normalised_string / index / char_index / char_end_index, with
``.t`` / ``.n`` / ``.i`` properties and ``lower()``), ``Doc`` (text + id +
tokens + orig/norm lookup sets), and the ``Tokenizer`` family
(WordPunct default, ``RegExTokenizer`` split/token patterns,
``CustomTokenizer``).  These are thin driver-side objects over the
repo's span kernels (`kernels/tokenize.py`), so a reference user's
pre-tokenized Docs flow into the compat searchers unchanged.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List, Optional, Union

from fuzzy_search_spark.kernels.tokenize import (
    DOC_END,
    DOC_START,
    custom_token_spans,
    regex_split_spans,
    regex_token_spans,
    spans_to_tokens,
    wordpunct_spans,
)


class Token:
    """A token with reference attribute/property names (token.py:56-197)."""

    def __init__(self, string: str, index: int, char_index: int,
                 char_end_index: int = None, doc_id: str = None,
                 normalised_string: str = None, label=None,
                 metadata: Dict = None):
        self.string = string
        self.index = index
        self.char_index = char_index
        self.char_end_index = char_end_index
        self.doc_id = doc_id
        self.metadata = metadata if metadata else {}
        # reference quirk: '' is falsy, so empty normalised_string falls
        # back to the raw string (token.py:112)
        self.normalised_string = normalised_string if normalised_string \
            else string
        if label is None:
            label = set()
        elif isinstance(label, str):
            label = {label}
        elif isinstance(label, list):
            label = set(label)
        self.label = label

    def __repr__(self):
        return (f"Token(string={self.string!r}, index={self.index}, "
                f"char_index={self.char_index})")

    def __len__(self):
        return len(self.string)

    def lower(self):
        """Lowercase the NORMALIZED string only (token.py:141-145)."""
        self.normalised_string = self.normalised_string.lower()

    def has_label(self, label_string: str) -> bool:
        """Whether the token carries the label (token.py:171-182)."""
        return label_string in self.label

    def update(self, normalised_string: str) -> "Token":
        """A NEW token with an updated normalized string; the original is
        untouched (token.py:197-211)."""
        import copy

        return Token(string=self.t, index=self.i,
                     char_index=self.char_index,
                     char_end_index=self.char_end_index,
                     normalised_string=normalised_string,
                     metadata=copy.deepcopy(self.metadata))

    @property
    def i(self) -> int:
        return self.index

    @property
    def t(self) -> str:
        return self.string

    @property
    def n(self) -> str:
        return self.normalised_string


class Doc:
    """A tokenized document (token.py:214-297): text + id + tokens with
    original/normalized lookup sets and a label index."""

    def __init__(self, text: str, doc_id: str, tokens: List[Token],
                 metadata: Dict = None):
        self.text = text
        self.id = doc_id
        self.tokens = tokens
        self.metadata = metadata if metadata else {}
        self.token_orig_set: Dict[str, List[Token]] = {}
        self.token_norm_set: Dict[str, List[Token]] = {}
        self.label_token_index = defaultdict(set)
        for token in tokens:
            for label in token.label:
                self.label_token_index[label].add(token)
            self.token_orig_set.setdefault(token.t, []).append(token)
            self.token_norm_set.setdefault(token.n, []).append(token)

    def __repr__(self):
        return f"Doc(id={self.id!r}, num_tokens={len(self.tokens)})"

    def __len__(self):
        return len(self.tokens)

    def __iter__(self):
        yield from self.tokens


def _spans_to_token_objects(text: str, spans, ignorecase: bool,
                            include_boundary_tokens: bool,
                            doc_id: str = None) -> List[Token]:
    out: List[Token] = []
    for ts in spans_to_tokens(text, spans, ignorecase=ignorecase,
                              include_boundary_tokens=include_boundary_tokens):
        out.append(Token(
            string=ts.string, index=ts.index, char_index=ts.char_index,
            char_end_index=ts.char_end_index, doc_id=doc_id,
            normalised_string=ts.normalized))
    return out


class Tokenizer:
    """The reference base tokenizer (WordPunct pattern, token.py:416-466)."""

    def __init__(self, ignorecase: bool = False,
                 include_boundary_tokens: bool = False):
        self.ignorecase = ignorecase
        self.include_boundary_tokens = include_boundary_tokens

    def _string_tokenizer(self, text: str):
        for string, start, _end in wordpunct_spans(text):
            yield string, start

    def tokenize(self, doc_text: str, doc_id: str = None) -> List[Token]:
        return _spans_to_token_objects(
            doc_text, self._string_tokenizer(doc_text),
            ignorecase=self.ignorecase,
            include_boundary_tokens=self.include_boundary_tokens,
            doc_id=doc_id)

    def tokenize_doc(self, doc_text: str, doc_id: str = None) -> Doc:
        return Doc(doc_text, doc_id, self.tokenize(doc_text, doc_id=doc_id))


class RegExTokenizer(Tokenizer):
    """Split-pattern or token-pattern regex tokenizer (token.py:505-543)."""

    def __init__(self, split_pattern: str = r"\s+",
                 token_pattern: str = None, **kwargs):
        super().__init__(**kwargs)
        self.split_pattern = split_pattern
        self.token_pattern = token_pattern

    def _string_tokenizer(self, text: str):
        if self.token_pattern:
            yield from regex_token_spans(text, self.token_pattern)
        else:
            yield from regex_split_spans(text, self.split_pattern)


class CustomTokenizer(Tokenizer):
    """User-function tokenizer with left-to-right offset recovery
    (token.py:560-597)."""

    def __init__(self, tokenizer_func: Callable[[str], List[str]], **kwargs):
        super().__init__(**kwargs)
        self.tokenizer_func = tokenizer_func

    def _string_tokenizer(self, text: str):
        yield from custom_token_spans(text, self.tokenizer_func)


def is_token_list(value) -> bool:
    """True for a non-empty list whose elements all look like Tokens
    (reference get_text_tokens' list check, token_searcher.py:271-273)."""
    return (isinstance(value, list) and len(value) > 0
            and all(isinstance(t, Token) or
                    (hasattr(t, "n") and hasattr(t, "char_index"))
                    for t in value))


def text_of(text: Union[str, Dict, "Doc", List[Token]]) -> Optional[str]:
    """The underlying plain string for any accepted text shape (reference
    get_text_string, token_searcher.py:283-301: a token list joins the
    NORMALIZED strings with single spaces)."""
    if isinstance(text, Doc):
        return text.text
    if is_token_list(text):
        return " ".join(t.n for t in text)
    if isinstance(text, str):
        return text
    if isinstance(text, dict):
        return text["text"]
    raise TypeError(
        f'invalid text type {type(text)}, must be string, Doc or a '
        f'dictionary with "text" and "id" properties')


__all__ = [
    "DOC_END", "DOC_START", "CustomTokenizer", "Doc", "RegExTokenizer",
    "Token", "Tokenizer", "is_token_list", "text_of",
]
