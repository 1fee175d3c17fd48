"""Drop-in compatibility facade over the reference library's public API.

A user of `fuzzy_search` can switch imports and keep their code:

    from fuzzy_search_spark.compat import FuzzyPhraseSearcher
    searcher = FuzzyPhraseSearcher(phrase_list=[...], config={...})
    for m in searcher.find_matches({'text': ..., 'id': ...}):
        print(m.phrase.phrase_string, m.string, m.offset, m.levenshtein_similarity)

The facade exposes the reference's constructor shapes, `find_matches` /
`search_text` entry points and PhraseMatch-style result objects (phrase /
variant wrappers with `.phrase_string`, `.string`, `.offset`, `.end`,
`.label`, the three scores, and `.json()`), backed by this engine's
compiled models and kernels.  For cluster-scale use, the same models feed
`spark.job.match_documents` directly.
"""

from __future__ import annotations

from typing import List, Optional, Union

from fuzzy_search_spark.doc import (  # noqa: F401  (re-exported surface)
    CustomTokenizer,
    Doc,
    RegExTokenizer,
    Token,
    Tokenizer,
)
from fuzzy_search_spark.config import PUBLISHED_DEFAULT_CONFIG
from fuzzy_search_spark.matcher import Match, find_matches
from fuzzy_search_spark.model import CompiledModel, compile_model
from fuzzy_search_spark.phrase_model import (  # noqa: F401  (re-exported)
    Phrase,
    PhraseModel,
)
from fuzzy_search_spark.token_matcher import (
    TokenModel,
    compile_token_model,
    find_token_matches,
)

#: the reference's published defaults (`fuzzy_search.default_config`)
default_config = dict(PUBLISHED_DEFAULT_CONFIG)


def _phrases_arg(phrase_list, phrase_model):
    """Reference constructors accept phrase strings/dicts OR a PhraseModel;
    normalize to the dict list the engine compiler takes."""
    if phrase_list is not None:
        return phrase_list
    if isinstance(phrase_model, PhraseModel):
        return phrase_model.to_model_dicts()
    return phrase_model or []


class PhraseWrapper:
    """Minimal stand-in for the reference's Phrase objects on results."""

    __slots__ = ("phrase_string", "label")

    def __init__(self, phrase_string: str, label=None):
        self.phrase_string = phrase_string
        self.label = label

    def __repr__(self):
        return f"Phrase({self.phrase_string!r})"


class PhraseMatchResult:
    """Reference PhraseMatch-shaped result (phrase_match.py:56-152)."""

    def __init__(self, m: Match, text_id: Optional[str], ignorecase: bool):
        self.phrase = PhraseWrapper(m.phrase, m.label)
        self.variant = PhraseWrapper(m.variant, m.label)
        self.string = m.string
        self.offset = m.offset
        self.end = m.end
        self.label = m.label
        self.text_id = text_id
        self.ignorecase = ignorecase
        self.character_overlap = m.char_match
        self.ngram_overlap = m.ngram_match
        self.levenshtein_similarity = m.levenshtein_similarity

    def __repr__(self):
        return (f"PhraseMatch(phrase: {self.phrase.phrase_string!r}, "
                f"variant: {self.variant.phrase_string!r}, "
                f"string: {self.string!r}, offset: {self.offset}, "
                f"levenshtein_similarity: {self.levenshtein_similarity})")

    def json(self) -> dict:
        return {
            "type": "PhraseMatch",
            "phrase": self.phrase.phrase_string,
            "variant": self.variant.phrase_string,
            "string": self.string,
            "offset": self.offset,
            "label": self.label,
            "ignorecase": self.ignorecase,
            "text_id": self.text_id,
            "match_scores": {
                "char_match": self.character_overlap,
                "ngram_match": self.ngram_overlap,
                "levenshtein_similarity": self.levenshtein_similarity,
            },
        }


def _text_dict(text: Union[str, dict, "Doc", list]) -> dict:
    """Accept the reference's full input range (phrase_searcher.py:29-46 +
    token_searcher.py:259-301): str, {'text','id'} dict, Doc, or a list of
    Token objects (joined on their normalized strings)."""
    from fuzzy_search_spark.doc import Doc, is_token_list

    if isinstance(text, str):
        return {"text": text, "id": None}
    if isinstance(text, Doc):
        return {"text": text.text, "id": text.id, "tokens": text.tokens}
    if is_token_list(text):
        return {"text": " ".join(t.n for t in text), "id": None}
    if isinstance(text, dict):
        return {"text": text["text"], "id": text.get("id")}
    raise TypeError(
        f"text must be str, dict (with 'text' and 'id' properties), Doc "
        f"or List[Token], not {type(text)}")


class FuzzyPhraseSearcher:
    """Reference FuzzyPhraseSearcher-compatible entry point."""

    def __init__(self, phrase_list: Optional[List] = None,
                 phrase_model: Union[List[dict], PhraseModel, None] = None,
                 config: Optional[dict] = None):
        phrases = _phrases_arg(phrase_list, phrase_model)
        self.config = config or {}
        self._phrases = phrases
        self.model: CompiledModel = compile_model(phrases, config)

    def configure(self, config: dict) -> None:
        """Re-apply configuration over the current phrases (reference
        searcher.py:101-143: config keys overlay, phrases re-indexed)."""
        self.config = dict(self.config, **(config or {}))
        self.model = compile_model(self._phrases, self.config)

    def index_phrase_model(self, phrase_model: Union[List[dict], PhraseModel],
                           config: Optional[dict] = None) -> None:
        """Replace the phrase model (reference searcher.py:145-166)."""
        if config:
            self.config = dict(self.config, **config)
        self._phrases = _phrases_arg(None, phrase_model)
        self.model = compile_model(self._phrases, self.config)

    def index_phrases(self, phrases: List) -> None:
        """Replace the phrases (reference searcher.py:168-201)."""
        self._phrases = phrases
        self.model = compile_model(phrases, self.config)

    def find_matches(self, text: Union[str, dict, "Doc", list],
                     **_overrides) -> List[PhraseMatchResult]:
        doc = _text_dict(text)
        return [
            PhraseMatchResult(m, doc["id"], self.model.config.ignorecase)
            for m in find_matches(doc["text"], self.model)
        ]


class FuzzyTokenSearcher:
    """Reference FuzzyTokenSearcher-compatible entry point."""

    def __init__(self, phrase_list: Optional[List] = None,
                 phrase_model: Union[List[dict], PhraseModel, None] = None,
                 config: Optional[dict] = None,
                 vocabulary: Optional[List[str]] = None):
        phrases = _phrases_arg(phrase_list, phrase_model)
        self.model: TokenModel = compile_token_model(phrases, config,
                                                     vocabulary)

    def find_matches(self, text: Union[str, dict, "Doc", list]
                     ) -> List[PhraseMatchResult]:
        from fuzzy_search_spark.doc import is_token_list

        pre_tokenized = None
        if is_token_list(text):
            pre_tokenized = text
        doc = _text_dict(text)
        if pre_tokenized is None:
            pre_tokenized = doc.get("tokens")  # Doc input carries its own
        return [
            PhraseMatchResult(m, doc["id"], False)
            for m in find_token_matches(doc["text"], self.model,
                                        tokens=pre_tokenized)
        ]


class FuzzyContextSearcher(FuzzyPhraseSearcher):
    """Reference FuzzyContextSearcher-compatible entry point."""

    def __init__(self, config: Optional[dict] = None, **kwargs):
        super().__init__(config=config, **kwargs)
        self.context_size = (config or {}).get("context_size", 100)

    def find_matches(self, text: Union[str, dict],
                     prefix_size: Optional[int] = None,
                     suffix_size: Optional[int] = None, **_overrides):
        from fuzzy_search_spark.context import find_matches_with_context

        doc = _text_dict(text)
        out = []
        for ctx in find_matches_with_context(
                doc["text"], self.model, context_size=self.context_size,
                prefix_size=prefix_size, suffix_size=suffix_size):
            result = PhraseMatchResult(ctx["match"], doc["id"],
                                       self.model.config.ignorecase)
            result.context = ctx["context"]
            result.context_start = ctx["context_start"]
            result.context_end = ctx["context_end"]
            result.prefix = ctx["prefix"]
            result.suffix = ctx["suffix"]
            out.append(result)
        return out


class FuzzyTemplateSearcher(FuzzyPhraseSearcher):
    """Reference FuzzyTemplateSearcher-compatible entry point.

    Takes the phrase model (dicts with labels) plus the template JSON and
    returns TemplateMatch objects from `search_text`."""

    def __init__(self, phrases: List[dict], template_json: Union[list, dict],
                 config: Optional[dict] = None, ignore_unknown: bool = True):
        from fuzzy_search_spark.template import parse_template

        # the reference searches with overlapping matches allowed on this
        # path (context_searcher.py:70)
        merged = dict(config or {})
        merged.setdefault("allow_overlapping_matches", True)
        super().__init__(phrase_list=phrases, config=merged)
        labels = set()
        for p in phrases:
            label = p.get("label") if isinstance(p, dict) else None
            if isinstance(label, str):
                labels.add(label)
            elif label:
                labels.update(label)
        self.template = parse_template(template_json, known_labels=labels,
                                       ignore_unknown=ignore_unknown)

    def search_text(self, text: Union[str, dict]):
        from fuzzy_search_spark.template import find_template_matches

        doc = _text_dict(text)
        matches = find_matches(doc["text"], self.model)
        return find_template_matches(matches, self.template)


def make_searcher(phrases, config=None) -> FuzzyPhraseSearcher:
    """Reference fuzzy_search.make_searcher (fuzzy_search/__init__.py:17-29):
    build a PhraseModel, then a searcher around it."""
    phrase_model = PhraseModel(phrases, config=config)
    return FuzzyPhraseSearcher(phrase_model=phrase_model, config=config)


#: reference alias — `from fuzzy_search import PhraseMatch`
PhraseMatch = PhraseMatchResult
