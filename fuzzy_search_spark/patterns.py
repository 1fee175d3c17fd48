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


def extract_patterns(df: DataFrame, text_col: str = "text",
                     patterns: Dict[str, Dict[str, str]] = None,
                     id_col: str = "url") -> DataFrame:
    """All pattern hits per document: (id, pattern_name, pattern_type,
    match).  One regexp_extract_all per pattern, unioned and exploded."""
    patterns = patterns or PATTERN_DEFINITIONS
    parts: List[DataFrame] = []
    for name, spec in patterns.items():
        hits = F.regexp_extract_all(F.col(text_col), F.lit(spec["pattern"]), 0)
        parts.append(
            df.select(
                F.col(id_col),
                F.lit(name).alias("pattern_name"),
                F.lit(spec["type"]).alias("pattern_type"),
                F.explode(hits).alias("match"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
