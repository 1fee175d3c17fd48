"""PhraseModel / Phrase registry facade (reference
``phrase/phrase_model.py:80-766`` and ``phrase/phrase.py:29-233``).

The distributed engine compiles phrase dicts straight into the broadcast
model (`model.compile_model`); this module restores the reference's
*mutable registry* surface for drop-in users who build models
incrementally (add/remove phrases, variants, distractors, labels,
custom metadata) before searching — including the word/token lookup
indexes the reference's searchers read (word_in_phrase, token_in_phrase,
per-token min/max offsets, phrase_token_max_start/end_offset).  The
reference's OWN test file for this class passes against the facade
(tests/test_reference_suite_dropin.py).

Design note (not a port): the reference spreads state over ~20 parallel
defaultdicts built in OO plumbing; here one entry record per phrase
string carries the registry state and the indexes are built by two small
shared helpers.  Skipgram indexing lives in the compiled engine model,
not here.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Set, Union


def is_phrase_dict(d) -> bool:
    """Reference ``is_phrase_dict`` (phrase_model.py:46-77): a dict with a
    string 'phrase' property."""
    return isinstance(d, dict) and isinstance(d.get("phrase"), str)


class Phrase:
    """A phrase with label/metadata/offset/token properties
    (phrase.py:29-233).

    The skipgram internals of the reference Phrase belong to the engine's
    compiled model; this object carries the registry-facing state.  Like
    the reference, ``label`` holds the raw value (string or list) with
    ``label_set``/``label_list`` views, max offsets validate to
    non-negative ints, and passing ``tokenizer=`` tokenizes the phrase
    and builds a normalized-term -> token-position index."""

    def __init__(self, phrase: Union[str, Dict], ngram_size: int = 2,
                 skip_size: int = 2, tokenizer=None, tokens=None):
        from collections import defaultdict

        if isinstance(phrase, str):
            phrase = {"phrase": phrase}
        if not is_phrase_dict(phrase):
            raise TypeError("phrase must be a string or a phrase dict "
                            "with a 'phrase' property")
        self.phrase_string: str = phrase["phrase"]
        self.ngram_size = ngram_size
        self.skip_size = skip_size
        # reference metadata semantics (phrase.py:101,110-112): starts from
        # an explicit 'metadata' dict if present, and a dict with any key
        # beyond 'phrase' merges the WHOLE input dict in
        self.metadata: Dict = dict(phrase.get("metadata", {}))
        self.label = None
        self.label_set: Set[str] = set()
        self.label_list: List[str] = []
        self.max_start_offset: int = -1
        self.max_start_end: int = -1
        self.max_end_offset: int = -1
        self.max_end_start: int = -1
        self.tokens = tokens
        self.token_index: Dict[str, List[int]] = defaultdict(list)
        if "label" in phrase:
            self.set_label(phrase["label"])
        if len(phrase.keys()) > 1:
            self.add_metadata(phrase)
        if tokens is None and tokenizer is not None:
            self.tokens = tokenizer.tokenize(self.phrase_string)
            for ti, token in enumerate(self.tokens):
                self.token_index[token.n].append(ti)
        # skipgram-window thresholds (reference phrase.py:36,76-78); the
        # skipgram indexes themselves build lazily on first access —
        # registry-only phrases never pay for them
        self.early_threshold = 3
        self.late_threshold = len(self.phrase_string) - 3 - ngram_size
        self.within_range_threshold = 3

    _SKIPGRAM_LAZY = frozenset({
        "skipgrams", "skipgram_set", "skipgram_index", "skipgram_freq",
        "early_skipgram_index", "late_skipgram_index", "skipgrams_lower",
        "skipgram_index_lower", "skipgram_freq_lower",
        "early_skipgram_index_lower", "late_skipgram_index_lower",
        "num_skipgrams",
    })

    def __getattr__(self, name):
        if name in type(self)._SKIPGRAM_LAZY:
            self._build_skipgram_internals()
            return self.__dict__[name]
        raise AttributeError(name)

    def _build_skipgram_internals(self) -> None:
        """Reference Phrase skipgram state (phrase.py:80-99,131-140),
        built on demand: occurrence list/set/index/frequency plus the
        early/late window indexes, in cased and lowercased variants."""
        from collections import Counter, defaultdict

        from fuzzy_search_spark.kernels.skipgrams import text2skipgrams

        for suffix, source in (("", self.phrase_string),
                               ("_lower", self.phrase_string.lower())):
            sg = list(text2skipgrams(source, self.ngram_size,
                                     self.skip_size))
            idx = defaultdict(list)
            for s in sg:
                idx[s.string].append(s)
            d = self.__dict__
            d["skipgrams" + suffix] = sg
            d["skipgram_index" + suffix] = idx
            d["skipgram_freq" + suffix] = Counter(s.string for s in sg)
            d["early_skipgram_index" + suffix] = {
                s.string: s for s in sg
                if s.start_offset < self.early_threshold}
            d["late_skipgram_index" + suffix] = {
                s.string: s for s in sg
                if s.start_offset + s.length > self.late_threshold}
        self.__dict__["skipgram_set"] = {
            s.string for s in self.__dict__["skipgrams"]}
        self.__dict__["num_skipgrams"] = len(self.__dict__["skipgrams"])

    def __repr__(self):
        return f'Phrase(phrase_string="{self.phrase_string}")'

    def __len__(self):
        return len(self.phrase_string)

    def set_label(self, label: Union[str, List[str]]):
        """Store the raw label plus set/list views; non-string labels are
        rejected with ValueError (reference phrase.py:155-169)."""
        ok = isinstance(label, str) or (
            isinstance(label, list)
            and all(isinstance(x, str) for x in label))
        if not ok:
            raise ValueError(
                "phrase label must be a single string or a list of "
                "strings:", label)
        self.label = label
        if isinstance(label, str):
            self.label_set = {label}
            self.label_list = [label]
        else:
            self.label_set = set(label)
            self.label_list = list(label)

    def add_metadata(self, metadata_dict: Dict) -> None:
        """Merge key/value metadata, applying label and max-offset keys
        (reference phrase.py:184-200)."""
        for key, value in metadata_dict.items():
            self.metadata[key] = value
            if key == "label":
                self.set_label(value)
            elif key == "max_start_offset":
                self.add_max_start_offset(value)
            elif key == "max_end_offset":
                self.add_max_end_offset(value)

    def add_max_start_offset(self, max_start_offset: int) -> None:
        if not isinstance(max_start_offset, int):
            raise TypeError("max_start_offset must be a positive integer")
        if max_start_offset < 0:
            raise ValueError("max_start_offset must be positive")
        self.max_start_offset = max_start_offset
        self.max_start_end = max_start_offset + len(self.phrase_string)

    def add_max_end_offset(self, max_end_offset: int) -> None:
        if not isinstance(max_end_offset, int):
            raise TypeError("max_end_offset must be a positive integer")
        if max_end_offset < 0:
            raise ValueError("max_end_offset must be positive")
        self.max_end_offset = max_end_offset
        self.max_end_start = max_end_offset - len(self.phrase_string)

    def has_label(self, label_string: str) -> bool:
        return label_string in self.label_set

    def has_max_start_offset(self) -> bool:
        return self.max_start_offset is not None and self.max_start_offset >= 0

    def has_max_end_offset(self) -> bool:
        return self.max_end_offset is not None and self.max_end_offset >= 0

    @property
    def name(self) -> str:
        return self.phrase_string


def as_phrase_object(phrase: Union[str, Dict, Phrase], ngram_size: int = 2,
                     skip_size: int = 2, tokenizer=None) -> Phrase:
    """Reference ``as_phrase_object`` (phrase_model.py:16-43)."""
    if isinstance(phrase, Phrase):
        return phrase
    return Phrase(phrase, ngram_size=ngram_size, skip_size=skip_size,
                  tokenizer=tokenizer)


class PhraseModel:
    """Mutable phrase registry with the reference's public surface
    (phrase_model.py:80-766): phrases, variants, distractors, labels,
    custom metadata and the word/token lookup indexes, round-trippable
    via ``.json``."""

    def __init__(self, phrases: Optional[List] = None,
                 variants: Optional[List[Dict]] = None,
                 phrase_labels: Optional[List[Dict]] = None,
                 distractors: Optional[List[Dict]] = None,
                 model: Optional[List[Dict]] = None,
                 custom: Optional[List[Dict]] = None,
                 config: Optional[Dict] = None,
                 tokenizer=None):
        config = config or {}
        self.ngram_size = config.get("ngram_size", 2)
        self.skip_size = config.get("skip_size", 2)
        if tokenizer is None:
            from fuzzy_search_spark.doc import Tokenizer

            tokenizer = Tokenizer()
        self.tokenizer = tokenizer
        self.phrase_index: Dict[str, Phrase] = {}
        self.variant_index: Dict[str, Phrase] = {}
        self.distractor_index: Dict[str, Phrase] = {}
        self.phrase_string_map: Dict[str, Phrase] = {}
        self.phrase_type: Dict[str, Set[str]] = defaultdict(set)
        self.phrase_length_index: Dict[int, set] = defaultdict(set)
        self.variant_length_index: Dict[int, set] = defaultdict(set)
        self.has_variants: Dict[str, Set[str]] = defaultdict(set)
        self.is_variant_of: Dict[str, str] = {}
        self.has_distractors: Dict[str, Set[str]] = defaultdict(set)
        self.is_distractor_of: Dict[str, Set[str]] = defaultdict(set)
        self.has_labels: Dict[str, Set[str]] = defaultdict(set)
        self.is_label_of: Dict[str, Set[str]] = defaultdict(set)
        self.custom: Dict[str, Dict] = {}
        self.word_in_phrase: Dict[str, Set[str]] = defaultdict(set)
        self.first_word_in_phrase: Dict[str, Dict[str, int]] = defaultdict(dict)
        self.token_in_phrase: Dict[str, Set[str]] = defaultdict(set)
        self.first_token_in_phrase: Dict[str, Dict[str, int]] = defaultdict(dict)
        self.min_token_offset_in_phrase: Dict[str, Dict[str, int]] = \
            defaultdict(dict)
        self.max_token_offset_in_phrase: Dict[str, Dict[str, int]] = \
            defaultdict(dict)
        self.phrase_token_max_start_offset: Dict[str, int] = {}
        self.phrase_token_max_end_offset: Dict[str, int] = {}
        if phrases:
            self.add_phrases(phrases)
        if variants:
            self.add_variants(variants)
        if distractors:
            self.add_distractors(distractors)
        if phrase_labels:
            self.add_labels(phrase_labels)
        if model:
            self.add_model(model)
        if custom:
            self.add_custom(custom)
        self.set_phrase_token_max_start_offsets()
        self.set_phrase_token_max_end_offsets()

    def __repr__(self):
        import json as _json

        return f"PhraseModel({_json.dumps(self.json, indent=2)})"

    def __len__(self):
        return len(self.phrase_index)

    def __contains__(self, phrase) -> bool:
        return self.has_phrase(phrase)

    def _as_phrase(self, phrase) -> Phrase:
        return as_phrase_object(phrase, self.ngram_size, self.skip_size,
                                tokenizer=self.tokenizer)

    # -- shared index helpers --------------------------------------------

    def _index_phrase_words(self, phrase: Phrase) -> None:
        """Word lookup indexes for the exact-match path (reference
        phrase_model.py:689-700)."""
        for wi, word in enumerate(re.finditer(r"\w+", phrase.phrase_string)):
            if wi == 0:
                self.first_word_in_phrase[word.group(0)][
                    phrase.phrase_string] = word.start()
            self.word_in_phrase[word.group(0)].add(phrase.phrase_string)

    def _index_phrase_tokens(self, phrase: Phrase) -> None:
        """Token lookup indexes for the token searcher (reference
        phrase_model.py:750-761)."""
        if self.tokenizer is None:
            return
        phrase.tokens = self.tokenizer.tokenize(phrase.phrase_string,
                                                doc_id=phrase.phrase_string)
        for ti, token in enumerate(phrase.tokens):
            if ti == 0:
                self.first_token_in_phrase[token.n][phrase.phrase_string] = \
                    token.char_index
            if phrase.phrase_string not in \
                    self.min_token_offset_in_phrase[token.n]:
                self.min_token_offset_in_phrase[token.n][
                    phrase.phrase_string] = token.char_index
            self.max_token_offset_in_phrase[token.n][phrase.phrase_string] = \
                token.char_index
            self.token_in_phrase[token.n].add(phrase.phrase_string)

    # -- building ---------------------------------------------------------

    def add_model(self, model: List[Union[str, Dict]]) -> None:
        """One call for full phrase dicts (phrase_model.py:165-178)."""
        self.add_phrases(model)
        self.add_variants(model)
        self.add_distractors(model)
        self.add_labels(model)
        self.add_custom(model)

    def add_phrase(self, phrase: Phrase) -> None:
        self.phrase_string_map[phrase.phrase_string] = phrase
        self.phrase_type[phrase.phrase_string].add("phrase")
        self.phrase_index[phrase.phrase_string] = phrase
        self.phrase_length_index[len(phrase.phrase_string)].add(
            phrase.phrase_string)
        self._index_phrase_words(phrase)
        self._index_phrase_tokens(phrase)
        if phrase.label_set:
            self._register_labels(phrase.phrase_string, phrase.label_set)

    def add_phrases(self, phrases: Iterable[Union[str, Dict, Phrase]]) -> None:
        """Add phrases; full dict entries also register their variants /
        distractors / labels / custom keys (phrase_model.py:349-369)."""
        phrases = list(phrases)
        for p in phrases:
            self.add_phrase(self._as_phrase(p))
        phrase_dicts = [p for p in phrases if isinstance(p, dict)]
        if phrase_dicts:
            self.add_variants(phrase_dicts)
            self.add_distractors(phrase_dicts)
            self.add_custom(phrase_dicts)
            self.add_labels(phrase_dicts)

    def add_variant(self, variant_phrase: Phrase, main_phrase: Phrase):
        if variant_phrase.phrase_string not in self.phrase_string_map:
            self.phrase_string_map[variant_phrase.phrase_string] = \
                variant_phrase
        self.variant_index[variant_phrase.phrase_string] = variant_phrase
        self.is_variant_of[variant_phrase.phrase_string] = \
            main_phrase.phrase_string
        self.has_variants[main_phrase.phrase_string].add(
            variant_phrase.phrase_string)
        self.phrase_type[variant_phrase.phrase_string].add("variant")
        self.variant_length_index[len(variant_phrase.phrase_string)].add(
            variant_phrase.phrase_string)
        self._index_phrase_words(variant_phrase)
        self._index_phrase_tokens(variant_phrase)

    def add_variants(self, variants: Iterable[Union[Dict, Phrase]],
                     add_new_phrases: bool = True) -> None:
        """Register 'variants' lists of known phrases; each variant phrase
        inherits the main's metadata, including labels and max offsets
        (phrase_model.py:425-450)."""
        for entry in variants:
            # NB the reference threads the ENTRY-derived phrase object
            # through (its metadata carries the variants list), not the
            # already-registered object (phrase_model.py:437-450)
            main = self._as_phrase(entry)
            if main.phrase_string not in self.phrase_index:
                if not add_new_phrases:
                    continue
                self.add_phrase(main)
            for v in main.metadata.get("variants", []):
                variant = self._as_phrase(v)
                variant.add_metadata(main.metadata)
                self.add_variant(variant, main)

    def add_distractor(self, distractor_phrase: Phrase, main_phrase: Phrase):
        if distractor_phrase.phrase_string not in self.phrase_string_map:
            self.phrase_string_map[distractor_phrase.phrase_string] = \
                distractor_phrase
        self.distractor_index[distractor_phrase.phrase_string] = \
            distractor_phrase
        self.is_distractor_of[distractor_phrase.phrase_string].add(
            main_phrase.phrase_string)
        self.has_distractors[main_phrase.phrase_string].add(
            distractor_phrase.phrase_string)
        self.phrase_type[distractor_phrase.phrase_string].add("distractor")
        self._index_phrase_words(distractor_phrase)
        self._index_phrase_tokens(distractor_phrase)

    def add_distractors(self, distractors: Iterable[Union[Dict, Phrase]],
                        add_new_phrases: bool = True) -> None:
        """Same shape as add_variants for 'distractors' lists
        (phrase_model.py:519-544)."""
        for entry in distractors:
            main = self._as_phrase(entry)
            if main.phrase_string not in self.phrase_index:
                if not add_new_phrases:
                    continue
                self.add_phrase(main)
            for d in main.metadata.get("distractors", []):
                distractor = self._as_phrase(d)
                distractor.add_metadata(main.metadata)
                self.add_distractor(distractor, main)

    def _register_labels(self, phrase_string: str, labels: Set[str]):
        self.has_labels[phrase_string].update(labels)
        for lb in labels:
            self.is_label_of[lb].add(phrase_string)

    def add_labels(self, phrase_labels: Iterable[Union[Dict, Phrase]]) -> None:
        for entry in phrase_labels:
            if isinstance(entry, Phrase):
                if entry.label_set:
                    self._register_labels(entry.phrase_string,
                                          entry.label_set)
                continue
            if not isinstance(entry, dict) or "label" not in entry:
                continue
            label = entry["label"]
            labels = {label} if isinstance(label, str) else set(label)
            self._register_labels(entry["phrase"], labels)
            if entry["phrase"] in self.phrase_index:
                p = self.phrase_index[entry["phrase"]]
                p.set_label(sorted(p.label_set | labels))

    def add_custom(self, custom: Iterable[Union[Dict, Phrase]]) -> None:
        """Attach each entry's full metadata dict as custom properties of a
        REGISTERED phrase (reference phrase_model.py:635-648: the custom
        record is a copy of Phrase.metadata, replacing any previous one;
        unknown phrases are skipped)."""
        import copy

        for entry in custom:
            phrase = self._as_phrase(entry)
            if phrase.phrase_string not in self.phrase_index:
                continue
            self.custom[phrase.phrase_string] = copy.deepcopy(phrase.metadata)

    # -- token-level max-offset derivation (phrase_model.py:773-817) ------

    def set_phrase_token_max_start_offsets(self):
        """A token gets a max start offset only when EVERY phrase it occurs
        in carries one; the value is the loosest bound."""
        for token in self.token_in_phrase:
            with_max = without_max = False
            max_start = -1
            for phrase_string in self.token_in_phrase[token]:
                phrase = self.get_phrase(phrase_string)
                if phrase is None:
                    continue
                if phrase.has_max_start_offset():
                    with_max = True
                    bound = phrase.max_start_offset + \
                        self.max_token_offset_in_phrase[token][phrase_string]
                    if bound > max_start:
                        max_start = bound
                else:
                    without_max = True
            if with_max and not without_max:
                self.phrase_token_max_start_offset[token] = max_start

    def set_phrase_token_max_end_offsets(self):
        for token in self.token_in_phrase:
            with_max = without_max = False
            max_end = -1
            for phrase_string in self.token_in_phrase[token]:
                phrase = self.get_phrase(phrase_string)
                if phrase is None:
                    continue
                if phrase.has_max_end_offset():
                    with_max = True
                    bound = phrase.max_end_offset + \
                        self.min_token_offset_in_phrase[token][phrase_string]
                    if bound > max_end:
                        max_end = bound
                else:
                    without_max = True
            if with_max and not without_max:
                self.phrase_token_max_end_offset[token] = max_end

    # -- removal ----------------------------------------------------------

    def remove_phrase(self, phrase: Union[str, Dict, Phrase]) -> None:
        """Remove a main phrase and its variant/distractor links (reference
        phrase_model.py:265-299: ValueError if unknown; label and custom
        registries are deliberately left as-is, exactly like the
        reference — ``.json`` only reads registered phrases)."""
        ps = as_phrase_object(phrase).phrase_string
        if ps not in self.phrase_index:
            raise ValueError(f"{ps} is not registered as a main phrase")
        del self.phrase_index[ps]
        self.phrase_type[ps].discard("phrase")
        self.phrase_length_index[len(ps)].discard(ps)
        for v in list(self.has_variants.pop(ps, set())):
            self.variant_index.pop(v, None)
            self.is_variant_of.pop(v, None)
            self.phrase_type[v].discard("variant")
        for d in list(self.has_distractors.pop(ps, set())):
            mains = self.is_distractor_of.get(d)
            if mains is not None:
                mains.discard(ps)
                if not mains:
                    self.is_distractor_of.pop(d, None)
                    self.distractor_index.pop(d, None)
                    self.phrase_type[d].discard("distractor")

    def remove_phrases(self, phrases: Iterable[Union[str, Dict, Phrase]]):
        for p in phrases:
            ps = as_phrase_object(p).phrase_string
            if ps not in self.phrase_index:
                raise KeyError(f"Unknown phrase: {ps}")
            self.remove_phrase(ps)

    # -- lookup -----------------------------------------------------------

    @property
    def json(self) -> List[Dict]:
        """Round-trippable model JSON (phrase_model.py:180-196): phrase
        entries with their variants / label / custom properties."""
        out = []
        for phrase in self.phrase_index:
            entry: Dict = {"phrase": phrase}
            if self.has_variants.get(phrase):
                entry["variants"] = list(self.has_variants[phrase])
            if self.has_labels.get(phrase):
                entry["label"] = list(self.has_labels[phrase])
            if phrase in self.custom:
                entry["custom"] = self.custom[phrase]
            out.append(entry)
        return out

    def to_model_dicts(self) -> List[Dict]:
        """Compile-ready phrase dicts for the engine (`model.compile_model`):
        like ``.json`` but original top-level properties (max_start_offset,
        metadata, ...) stay top-level instead of nesting under 'custom',
        matching what the reference searcher reads off its Phrase objects."""
        out = []
        for phrase_string, phrase in self.phrase_index.items():
            entry = dict(phrase.metadata)
            entry["phrase"] = phrase_string
            variants = set(entry.get("variants", [])) \
                | self.has_variants.get(phrase_string, set())
            if variants:
                entry["variants"] = sorted(variants)
            distractors = set(entry.get("distractors", [])) \
                | self.has_distractors.get(phrase_string, set())
            if distractors:
                entry["distractors"] = sorted(distractors)
            labels = set(phrase.label_set) \
                | self.has_labels.get(phrase_string, set())
            if labels:
                entry["label"] = (sorted(labels)[0] if len(labels) == 1
                                  else sorted(labels))
            out.append(entry)
        return out

    def get_phrases(self) -> List[Phrase]:
        return list(self.phrase_index.values())

    def get_phrase(self, phrase_string: str) -> Optional[Phrase]:
        return (self.phrase_index.get(phrase_string)
                or self.variant_index.get(phrase_string)
                or self.distractor_index.get(phrase_string))

    def has_phrase(self, phrase: Union[str, Dict, Phrase]) -> bool:
        ps = as_phrase_object(phrase).phrase_string
        return ps in self.phrase_index

    def has_token(self, token) -> bool:
        """Whether any registered phrase contains the token (by its
        normalized string; reference phrase_model.py:763-771)."""
        n = token if isinstance(token, str) else token.n
        return n in self.token_in_phrase

    def get_phrases_by_max_length(self, max_length: int,
                                  include_variants: bool = False):
        """Phrases no longer than ``max_length`` (generator like the
        reference, phrase_model.py:387-404)."""
        for phrase_length in sorted(self.phrase_length_index):
            if phrase_length > max_length:
                break
            for phrase_string in self.phrase_length_index[phrase_length]:
                if phrase_string in self.phrase_index:
                    yield self.phrase_index[phrase_string]
            if include_variants:
                for phrase_string in self.variant_length_index.get(
                        phrase_length, ()):
                    yield self.variant_index[phrase_string]

    def variant_of(self, variant: Union[str, Phrase]) -> Optional[Phrase]:
        vs = variant.phrase_string if isinstance(variant, Phrase) else variant
        main = self.is_variant_of.get(vs)
        return self.phrase_index.get(main) if main else None

    def variants(self, phrase: Union[str, Phrase]) -> Optional[List[Phrase]]:
        ps = phrase.phrase_string if isinstance(phrase, Phrase) else phrase
        if ps not in self.has_variants:
            return None
        return [self.variant_index[v]
                for v in sorted(self.has_variants.get(ps, set()))]

    def get_variants(self, phrases: Optional[List[str]] = None) -> List[Dict]:
        names = phrases if phrases is not None else list(self.phrase_index)
        return [{"phrase": n,
                 "variants": sorted(self.has_variants.get(n, set()))}
                for n in names if n in self.phrase_index]

    def is_label(self, label: str) -> bool:
        return label in self.is_label_of and bool(self.is_label_of[label])

    def has_label(self, phrase_string: str) -> bool:
        return bool(self.has_labels.get(phrase_string))

    def get_labels(self, phrase: Union[str, Phrase]) -> Set[str]:
        ps = phrase.phrase_string if isinstance(phrase, Phrase) else phrase
        return set(self.has_labels.get(ps, set()))

    def has_custom(self, phrase_string: str, custom_property: str) -> bool:
        return phrase_string in self.custom and \
            custom_property in self.custom[phrase_string]

    def get(self, phrase_string: str, custom_property: str):
        """Reference error contract (phrase_model.py:673-688): KeyError for
        an unknown phrase, ValueError for an unknown property."""
        if phrase_string not in self.phrase_index:
            raise KeyError("Unknown phrase_string")
        if not self.has_custom(phrase_string, custom_property):
            raise ValueError("Unknown custom property")
        return self.custom[phrase_string][custom_property]
