"""Search configuration.

The reference library has a two-layer default quirk (see SURVEY.md §1.2):
`fuzzy_search.search.searcher.FuzzySearcher.__init__` hardcodes one set of
defaults (/root/reference/fuzzy_search/search/searcher.py:50-58) and the
published `default_config` dict (search/config.py:10-39) is *only* applied for
keys the caller passes explicitly.  The effective defaults — what an
unconfigured searcher actually uses — are therefore the hardcoded ones below.
We reproduce exactly that behavior: `effective_config(user)` = these defaults
overlaid with the user's keys.
"""

from __future__ import annotations

import string
from dataclasses import dataclass, field, replace
from typing import Optional


@dataclass(frozen=True)
class SearchConfig:
    """Effective searcher configuration (flat, broadcast-friendly)."""

    char_match_threshold: float = 0.5
    ngram_threshold: float = 0.5
    skipgram_threshold: float = 0.2
    levenshtein_threshold: float = 0.5
    max_length_variance: int = 1
    use_word_boundaries: bool = True
    ignorecase: bool = False
    ngram_size: int = 2
    skip_size: int = 2
    include_variants: bool = False
    filter_distractors: bool = False
    skip_exact_matching: bool = False
    allow_overlapping_matches: bool = False
    punctuation: str = string.punctuation
    # early/late thresholds are Phrase-construction constants in the
    # reference (phrase/phrase.py:36) and not part of its config dict;
    # they are kept here so a compiled model is fully self-describing.
    early_threshold: int = 3
    late_threshold: int = 3

    def with_overrides(self, overrides: Optional[dict]) -> "SearchConfig":
        if not overrides:
            return self
        known = {k: v for k, v in overrides.items() if k in _FIELD_NAMES}
        return replace(self, **known)


_FIELD_NAMES = {f for f in SearchConfig.__dataclass_fields__}

#: The reference's *published* defaults (search/config.py) — exposed for
#: callers who want to mimic `fuzzy_search.default_config`, e.g. when a user
#: passes the published dict explicitly.
PUBLISHED_DEFAULT_CONFIG = {
    "char_match_threshold": 0.6,
    "ngram_threshold": 0.5,
    "levenshtein_threshold": 0.6,
    "skipgram_threshold": 0.2,
    "ignorecase": False,
    "use_word_boundaries": False,
    "include_variants": False,
    "filter_distractors": False,
    "max_length_variance": 1,
    "ngram_size": 2,
    "skip_size": 2,
    "skip_exact_matching": False,
    "allow_overlapping_matches": False,
    "punctuation": string.punctuation,
    "debug": False,
}

DEFAULT_CONFIG = SearchConfig()


def effective_config(user_config: Optional[dict] = None) -> SearchConfig:
    """Overlay user keys on the reference's *effective* (hardcoded) defaults."""
    return DEFAULT_CONFIG.with_overrides(user_config)
