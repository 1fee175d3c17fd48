"""Regex entity-pattern extraction (reference pattern/fuzzy_patterns.py).

The reference ships Dutch person-name / date / place patterns and
combinators over them; extraction here is a `regexp_extract_all` column op
(JVM-side).  Patterns are reconstructed from the documented semantics:
capitalized-word name runs with Dutch tussenvoegsels and generational
suffixes, Dutch weekday/month/date/time forms, and `in|tot <Place>`.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAP_WORD = r"[A-Z][\w-]+"
_TUSSENVOEGSEL = r"(?: van| de| der| den)*"
_GENERATION = r"(?: de jonge| de oude| junior| senior)?"

DUTCH_PERSON_NAME = (
    rf"{_CAP_WORD}(?: {_CAP_WORD})*{_TUSSENVOEGSEL}(?: {_CAP_WORD})+"
    rf"{_GENERATION}"
)

DUTCH_WEEKDAY = r"(?:maandag|dinsdag|woensdag|donderdag|vrijdag|zaterdag|zondag)"
DUTCH_MONTH = (
    r"(?:jan(?:uari|\.)?|feb(?:ruari|\.)?|maart|mrt|apr(?:il|\.)?|mei|"
    r"jun(?:i)?|jul(?:i)?|aug(?:ustus|\.)?|sep(?:t\.?|tember)?|"
    r"okt(?:ober|\.)?|nov(?:ember|\.)?|dec(?:ember|\.)?)"
)
DUTCH_DAY_MONTH = rf"\d{{1,2}} {DUTCH_MONTH}"
DUTCH_YEAR = r"\d{4}"
DUTCH_TIME = (
    r"\b(?:\d{1,2}|een|twee|drie|vier|vijf|zes|zeven|acht|negen|tien|elf|"
    r"twaalf) uu?ren\b"
)
DUTCH_DAY_PART = r"'s (?:avonds|middags|ochtends)"
DUTCH_IN_PLACE = rf"(?:in|tot) {_CAP_WORD}"
DUTCH_WEEKDAY_DAY_MONTH = rf"{DUTCH_WEEKDAY},? (?:de |den )?{DUTCH_DAY_MONTH}"

PATTERN_DEFINITIONS: Dict[str, Dict[str, str]] = {
    "person_name": {"pattern": DUTCH_PERSON_NAME, "type": "dutch_person_name"},
    "day_month": {"pattern": DUTCH_DAY_MONTH, "type": "dutch_date"},
    "weekday_day_month": {"pattern": DUTCH_WEEKDAY_DAY_MONTH,
                          "type": "dutch_date"},
    "year": {"pattern": DUTCH_YEAR, "type": "dutch_date"},
    "time": {"pattern": DUTCH_TIME, "type": "dutch_date"},
    "day_part": {"pattern": DUTCH_DAY_PART, "type": "dutch_date"},
    "in_place": {"pattern": DUTCH_IN_PLACE, "type": "dutch_place"},
}


# ---------------------------------------------------------------------------
# Context combinators (reference pattern/fuzzy_patterns.py:114-231)
# ---------------------------------------------------------------------------


def escape_string(string: str) -> str:
    """Escape regex metacharacters so a context string embeds literally
    (reference fuzzy_patterns.py:238-252 — the reference's own list, NOT
    re.escape: it also escapes '/' and skips ',' and '-')."""
    for ch in ("\\", "/", "[", "]", "(", ")", "{", "}", "*", "?", "+",
               ".", "|", "!", "^", "$"):
        string = string.replace(ch, "\\" + ch)
    return string


def pattern_comma_then_context(name: str, pattern_definition: Dict,
                               context_string: str) -> Dict:
    """<pattern> ?, ?<context> (reference fuzzy_patterns.py:114-129)."""
    return {
        "name": name + "_comma_then_context",
        "pattern": pattern_definition["pattern"] + " ?, ?" + context_string,
        "group_indices": pattern_definition.get("group_indices"),
        "type": pattern_definition.get("type"),
    }


def context_then_pattern(name: str, pattern_definition: Dict,
                         context_string: str) -> Dict:
    """<context>,? <pattern> (reference fuzzy_patterns.py:132-145)."""
    return {
        "name": "context_then_" + name,
        "pattern": context_string + ",? " + pattern_definition["pattern"],
        "group_indices": pattern_definition.get("group_indices"),
        "type": pattern_definition.get("type"),
    }


def pattern_before_context(name: str, pattern_definition: Dict,
                           context_string: str, max_distance: int = 10) -> Dict:
    """<pattern>.{max_distance}<context> with the reference's literal
    ``".{d}".format(d=...)`` interpolation (fuzzy_patterns.py:148-162) —
    which yields ``.10`` (one char then the digits), NOT ``.{10}``.  Kept
    byte-identical for parity; :func:`pattern_near_context` is the
    intended-semantics variant."""
    return {
        "name": name + "_before_context",
        "pattern": pattern_definition["pattern"]
        + ".{d}".format(d=max_distance) + context_string,
        "group_indices": pattern_definition.get("group_indices"),
        "type": pattern_definition.get("type"),
    }


def context_before_pattern(name: str, pattern_definition: Dict,
                           context_string: str, max_distance: int = 10) -> Dict:
    """<context>.{max_distance}<pattern>, same interpolation quirk as
    :func:`pattern_before_context` (fuzzy_patterns.py:165-181)."""
    return {
        "name": "context_before_" + name,
        "pattern": context_string + ".{d}".format(d=max_distance)
        + pattern_definition["pattern"],
        "group_indices": pattern_definition.get("group_indices"),
        "type": pattern_definition.get("type"),
    }


def pattern_near_context(name: str, pattern_definition: Dict,
                         context_string: str, max_distance: int = 10) -> Dict:
    """Corrected-semantics combinator: pattern then UP TO ``max_distance``
    characters then context (what the reference's docstring describes;
    its implementation interpolates the bound literally — see
    :func:`pattern_before_context`)."""
    return {
        "name": name + "_near_context",
        "pattern": pattern_definition["pattern"]
        + ".{0,%d}" % max_distance + context_string,
        "group_indices": pattern_definition.get("group_indices"),
        "type": pattern_definition.get("type"),
    }


def context_near_pattern(name: str, pattern_definition: Dict,
                         context_string: str, max_distance: int = 10) -> Dict:
    """Corrected-semantics mirror of :func:`context_before_pattern`."""
    return {
        "name": "context_near_" + name,
        "pattern": context_string + ".{0,%d}" % max_distance
        + pattern_definition["pattern"],
        "group_indices": pattern_definition.get("group_indices"),
        "type": pattern_definition.get("type"),
    }


CONTEXT_PATTERNS: Dict[str, Dict] = {
    "person_name": {
        "pattern_comma_then_context": pattern_comma_then_context,
        "context_then_pattern": context_then_pattern,
    },
    "distance": {
        "pattern_before_context": pattern_before_context,
        "context_before_pattern": context_before_pattern,
    },
    "all": {
        "pattern_comma_then_context": pattern_comma_then_context,
        "context_then_pattern": context_then_pattern,
        "pattern_before_context": pattern_before_context,
        "context_before_pattern": context_before_pattern,
    },
}


def list_context_pattern_types(context_type: str = None) -> List[str]:
    """Names of the context combinators registered for a context type
    (reference fuzzy_patterns.py:71-85)."""
    context_type = context_type or "all"
    if context_type not in CONTEXT_PATTERNS:
        raise KeyError("Unknown context type")
    return list(CONTEXT_PATTERNS[context_type])


def get_context_patterns(context_type: str = None) -> Dict:
    """The combinator-function dict for a context type (reference
    fuzzy_patterns.py:199-215)."""
    context_type = context_type or "all"
    if context_type not in CONTEXT_PATTERNS:
        raise KeyError("Unknown context type")
    return CONTEXT_PATTERNS[context_type]


def list_pattern_names(name_only: bool = True,
                       pattern_type: str = None) -> List[str]:
    """Registered pattern names, optionally filtered by type
    (``name_only`` is unused in the reference too — kept for drop-in API
    compatibility, fuzzy_patterns.py:88-100)."""
    return [n for n, spec in PATTERN_DEFINITIONS.items()
            if pattern_type is None or spec.get("type") == pattern_type]


def list_pattern_definitions(pattern_type: str = None):
    """Registered definitions: a filtered list when ``pattern_type`` is
    given, else the whole dict (reference fuzzy_patterns.py:103-113)."""
    if pattern_type:
        return [spec for spec in PATTERN_DEFINITIONS.values()
                if spec.get("type") == pattern_type]
    return PATTERN_DEFINITIONS


def get_search_patterns(pattern_type: str = None) -> Dict[str, Dict]:
    """Registered pattern definitions as a dict, optionally filtered."""
    return {n: spec for n, spec in PATTERN_DEFINITIONS.items()
            if pattern_type is None or spec.get("type") == pattern_type}


def make_search_context_patterns(context_string: str,
                                 pattern_names: List[str],
                                 context_patterns: Dict = None,
                                 pattern_definitions: Dict = None) -> List[Dict]:
    """Cross product of combinators x named patterns around one context
    string (reference fuzzy_patterns.py:254-266); the context string is
    escaped once up front."""
    context_patterns = context_patterns or CONTEXT_PATTERNS["all"]
    pattern_definitions = pattern_definitions or PATTERN_DEFINITIONS
    context_string = escape_string(context_string)
    out = []
    for combinator in context_patterns.values():
        for pattern_name in pattern_names:
            out.append(combinator(pattern_name,
                                  pattern_definitions[pattern_name],
                                  context_string))
    return out


def extract_context_patterns(df: DataFrame, context_string: str,
                             pattern_names: List[str],
                             text_col: str = "text", id_col: str = "url",
                             context_type: str = None,
                             pattern_definitions: Dict = None) -> DataFrame:
    """Distributed patterns-in-context extraction: build the combined
    patterns driver-side (tiny), then ONE regexp_extract_all projection per
    combined pattern — same single-scan union shape as
    :func:`extract_patterns`."""
    combined = make_search_context_patterns(
        context_string, pattern_names,
        get_context_patterns(context_type),
        pattern_definitions)
    patterns = {
        spec["name"]: {"pattern": spec["pattern"],
                       "type": spec.get("type") or "context"}
        for spec in combined
    }
    return extract_patterns(df, text_col=text_col, patterns=patterns,
                            id_col=id_col)


def extract_patterns(df: DataFrame, text_col: str = "text",
                     patterns: Dict[str, Dict[str, str]] = None,
                     id_col: str = "url") -> DataFrame:
    """All pattern hits per document: (id, pattern_name, pattern_type,
    match).  One regexp_extract_all per pattern, unioned and exploded."""
    patterns = patterns or PATTERN_DEFINITIONS
    # ONE scan: every pattern's hits compute in the same projection as an
    # array of (name, type, matches) structs, then a double explode — a
    # per-pattern unionAll would re-scan the documents table once per
    # pattern (N passes over 100 TB for an N-pattern library)
    per_pattern = F.array(*[
        F.struct(
            F.lit(name).alias("pattern_name"),
            F.lit(spec["type"]).alias("pattern_type"),
            F.regexp_extract_all(F.col(text_col), F.lit(spec["pattern"]), 0)
            .alias("matches"),
        )
        for name, spec in patterns.items()
    ])
    return (
        df.select(F.col(id_col), F.explode(per_pattern).alias("p"))
        .select(id_col, "p.pattern_name", "p.pattern_type",
                F.explode("p.matches").alias("match"))
    )
