"""PhraseModel / Phrase registry facade (reference
``phrase/phrase_model.py:80-766`` and ``phrase/phrase.py:29-120``).

The distributed engine compiles phrase dicts straight into the broadcast
model (`model.compile_model`); this module restores the reference's
*mutable registry* surface for drop-in users who build models
incrementally (add/remove phrases, variants, distractors, labels,
custom metadata) before searching.  It is a driver-side object; pass it
to ``compat.FuzzyPhraseSearcher(phrase_model=...)`` (or call ``.json``)
to search.

Design note (not a port): the reference spreads state over ~20 parallel
defaultdicts; here one entry record per phrase string carries the same
information, and the public methods present the reference's views of it.
Skipgram indexing lives in the compiled engine model, not here.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Set, Union


def is_phrase_dict(d) -> bool:
    """Reference ``is_phrase_dict`` (phrase_model.py:46-77): a dict with a
    string 'phrase' property."""
    return isinstance(d, dict) and isinstance(d.get("phrase"), str)


class Phrase:
    """A phrase with label/metadata/offset properties (phrase.py:29-233).

    The skipgram internals of the reference Phrase belong to the engine's
    compiled model; this object carries the registry-facing state."""

    def __init__(self, phrase: Union[str, Dict], ngram_size: int = 2,
                 skip_size: int = 2):
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
        if len(phrase.keys()) > 1:
            self.metadata.update(phrase)
        self.label: Set[str] = set()
        if "label" in phrase:
            self.set_label(phrase["label"])
        self.max_start_offset: int = phrase.get("max_start_offset", -1)
        self.max_end_offset: int = phrase.get("max_end_offset", -1)

    def __repr__(self):
        return f'Phrase(phrase_string="{self.phrase_string}")'

    def __len__(self):
        return len(self.phrase_string)

    def set_label(self, label: Union[str, List[str]]):
        if isinstance(label, str):
            self.label = {label}
        elif isinstance(label, list) and all(isinstance(x, str)
                                             for x in label):
            self.label = set(label)
        else:
            raise TypeError("label must be a string or list of strings")

    def has_label(self, label_string: str) -> bool:
        return label_string in self.label

    def has_max_start_offset(self) -> bool:
        return self.max_start_offset != -1

    def has_max_end_offset(self) -> bool:
        return self.max_end_offset != -1

    @property
    def name(self) -> str:
        return self.phrase_string


def as_phrase_object(phrase: Union[str, Dict, Phrase], ngram_size: int = 2,
                     skip_size: int = 2) -> Phrase:
    """Reference ``as_phrase_object`` (phrase_model.py:16-43)."""
    if isinstance(phrase, Phrase):
        return phrase
    return Phrase(phrase, ngram_size=ngram_size, skip_size=skip_size)


class PhraseModel:
    """Mutable phrase registry with the reference's public surface
    (phrase_model.py:80-766): phrases, variants, distractors, labels and
    custom metadata, round-trippable via ``.json``."""

    def __init__(self, phrases: Optional[List] = None,
                 variants: Optional[List[Dict]] = None,
                 phrase_labels: Optional[List[Dict]] = None,
                 distractors: Optional[List[Dict]] = None,
                 model: Optional[List[Dict]] = None,
                 custom: Optional[List[Dict]] = None,
                 config: Optional[Dict] = None):
        config = config or {}
        self.ngram_size = config.get("ngram_size", 2)
        self.skip_size = config.get("skip_size", 2)
        self.phrase_index: Dict[str, Phrase] = {}
        self.variant_index: Dict[str, Phrase] = {}
        self.distractor_index: Dict[str, Phrase] = {}
        self.has_variants: Dict[str, Set[str]] = {}
        self.is_variant_of: Dict[str, str] = {}
        self.has_distractors: Dict[str, Set[str]] = {}
        self.is_distractor_of: Dict[str, Set[str]] = {}
        self.has_labels: Dict[str, Set[str]] = {}
        self.is_label_of: Dict[str, Set[str]] = {}
        self.custom: Dict[str, Dict] = {}
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

    def __repr__(self):
        import json as _json

        return f"PhraseModel({_json.dumps(self.json, indent=2)})"

    def __len__(self):
        return len(self.phrase_index)

    def __contains__(self, phrase) -> bool:
        return self.has_phrase(phrase)

    # -- building ---------------------------------------------------------

    def add_model(self, model: List[Union[str, Dict]]) -> None:
        """One call for full phrase dicts (phrase_model.py:165-178)."""
        self.add_phrases(model)
        self.add_variants(model)
        self.add_distractors(model)
        self.add_labels(model)
        self.add_custom(model)

    def add_phrase(self, phrase: Phrase) -> None:
        self.phrase_index[phrase.phrase_string] = phrase
        if phrase.label:
            self._register_labels(phrase.phrase_string, phrase.label)

    def add_phrases(self, phrases: Iterable[Union[str, Dict, Phrase]]) -> None:
        for p in phrases:
            self.add_phrase(as_phrase_object(p, self.ngram_size,
                                             self.skip_size))

    def add_variant(self, variant_phrase: Phrase, main_phrase: Phrase):
        self.variant_index[variant_phrase.phrase_string] = variant_phrase
        self.is_variant_of[variant_phrase.phrase_string] = \
            main_phrase.phrase_string
        self.has_variants.setdefault(main_phrase.phrase_string, set()) \
            .add(variant_phrase.phrase_string)

    def add_variants(self, variants: Iterable[Union[Dict, Phrase]],
                     add_new_phrases: bool = True) -> None:
        """Register 'variants' lists of known phrases
        (phrase_model.py:425-450; with ``add_new_phrases`` unknown main
        phrases are added first, mirroring the reference flag)."""
        for entry in variants:
            if not isinstance(entry, dict) or "variants" not in entry:
                continue
            main_string = entry["phrase"]
            if main_string not in self.phrase_index:
                if not add_new_phrases:
                    continue
                self.add_phrases([main_string])
            main = self.phrase_index[main_string]
            for v in entry["variants"]:
                self.add_variant(as_phrase_object(v, self.ngram_size,
                                                  self.skip_size), main)

    def add_distractor(self, distractor_phrase: Phrase, main_phrase: Phrase):
        self.distractor_index[distractor_phrase.phrase_string] = \
            distractor_phrase
        self.is_distractor_of.setdefault(
            distractor_phrase.phrase_string, set()) \
            .add(main_phrase.phrase_string)
        self.has_distractors.setdefault(main_phrase.phrase_string, set()) \
            .add(distractor_phrase.phrase_string)

    def add_distractors(self, distractors: Iterable[Union[Dict, Phrase]],
                        add_new_phrases: bool = True) -> None:
        for entry in distractors:
            if not isinstance(entry, dict) or "distractors" not in entry:
                continue
            main_string = entry["phrase"]
            if main_string not in self.phrase_index:
                if not add_new_phrases:
                    continue
                self.add_phrases([main_string])
            main = self.phrase_index[main_string]
            for d in entry["distractors"]:
                self.add_distractor(as_phrase_object(d, self.ngram_size,
                                                     self.skip_size), main)

    def _register_labels(self, phrase_string: str, labels: Set[str]):
        self.has_labels.setdefault(phrase_string, set()).update(labels)
        for lb in labels:
            self.is_label_of.setdefault(lb, set()).add(phrase_string)

    def add_labels(self, phrase_labels: Iterable[Union[Dict, Phrase]]) -> None:
        for entry in phrase_labels:
            if isinstance(entry, Phrase):
                if entry.label:
                    self._register_labels(entry.phrase_string, entry.label)
                continue
            if not isinstance(entry, dict) or "label" not in entry:
                continue
            label = entry["label"]
            labels = {label} if isinstance(label, str) else set(label)
            self._register_labels(entry["phrase"], labels)
            if entry["phrase"] in self.phrase_index:
                self.phrase_index[entry["phrase"]].label |= labels

    def add_custom(self, custom: Iterable[Union[Dict, Phrase]]) -> None:
        """Attach each entry's full metadata dict as custom properties of a
        REGISTERED phrase (reference phrase_model.py:635-648: the custom
        record is a copy of Phrase.metadata, replacing any previous one;
        unknown phrases are skipped)."""
        import copy

        for entry in custom:
            phrase = as_phrase_object(entry, self.ngram_size, self.skip_size)
            if phrase.phrase_string not in self.phrase_index:
                continue
            self.custom[phrase.phrase_string] = copy.deepcopy(phrase.metadata)

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
        for v in self.has_variants.pop(ps, set()):
            self.variant_index.pop(v, None)
            self.is_variant_of.pop(v, None)
        for d in self.has_distractors.pop(ps, set()):
            mains = self.is_distractor_of.get(d)
            if mains is not None:
                mains.discard(ps)
                if not mains:
                    self.is_distractor_of.pop(d, None)
                    self.distractor_index.pop(d, None)

    def remove_phrases(self, phrases: Iterable[Union[str, Dict, Phrase]]):
        for p in phrases:
            self.remove_phrase(p)

    # -- lookup -----------------------------------------------------------

    @property
    def json(self) -> List[Dict]:
        """Round-trippable model JSON (phrase_model.py:180-196): phrase
        entries with their variants / label / custom properties."""
        out = []
        for phrase in self.phrase_index:
            entry: Dict = {"phrase": phrase}
            if phrase in self.has_variants and self.has_variants[phrase]:
                entry["variants"] = list(self.has_variants[phrase])
            if phrase in self.has_labels and self.has_labels[phrase]:
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
            labels = set(phrase.label) \
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

    def get_phrases_by_max_length(self, max_length: int) -> List[Phrase]:
        return [p for s, p in self.phrase_index.items()
                if len(s) <= max_length]

    def variant_of(self, variant: Union[str, Phrase]) -> Optional[Phrase]:
        vs = variant.phrase_string if isinstance(variant, Phrase) else variant
        main = self.is_variant_of.get(vs)
        return self.phrase_index.get(main) if main else None

    def variants(self, phrase: Union[str, Phrase]) -> Optional[List[Phrase]]:
        ps = phrase.phrase_string if isinstance(phrase, Phrase) else phrase
        if ps not in self.phrase_index:
            return None
        return [self.variant_index[v]
                for v in sorted(self.has_variants.get(ps, set()))]

    def get_variants(self, phrases: Optional[List[str]] = None) -> List[Dict]:
        names = phrases if phrases is not None else list(self.phrase_index)
        return [{"phrase": n,
                 "variants": sorted(self.has_variants.get(n, set()))}
                for n in names if n in self.phrase_index]

    def is_label(self, label: str) -> bool:
        return label in self.is_label_of

    def has_label(self, phrase_string: str) -> bool:
        return bool(self.has_labels.get(phrase_string))

    def get_labels(self, phrase: Union[str, Phrase]) -> Set[str]:
        ps = phrase.phrase_string if isinstance(phrase, Phrase) else phrase
        return set(self.has_labels.get(ps, set()))

    def has_custom(self, phrase_string: str, custom_property: str) -> bool:
        return custom_property in self.custom.get(phrase_string, {})

    def get(self, phrase_string: str, custom_property: str):
        """Reference error contract (phrase_model.py:673-688): KeyError for
        an unknown phrase, ValueError for an unknown property."""
        if phrase_string not in self.phrase_index:
            raise KeyError("Unknown phrase_string")
        if not self.has_custom(phrase_string, custom_property):
            raise ValueError("Unknown custom property")
        return self.custom[phrase_string][custom_property]
