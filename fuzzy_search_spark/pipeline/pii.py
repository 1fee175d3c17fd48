"""PII detection and redaction over text columns.

A training-data pipeline pass the reference library has no analog for
(builder-brief scope): count and redact personally-identifiable spans —
emails, international-format phone numbers, IPv4 addresses — with pure
JVM-side regex column expressions (no Python in the hot path).

The patterns deliberately stay inside the regex subset shared by Java's
engine (Spark) and RE2 (the DuckDB oracle): character classes, bounded
repetition, non-capturing groups, ``\\b`` — no lookaround, no
backreferences.  Redaction applies the three patterns in a fixed order
(email, ipv4, phone) so both engines produce byte-identical redacted
text.

Scale shape: a single narrow projection per document — no shuffle, no
state; at 100 TB this fuses into whatever scan already reads the text
column (whole-stage codegen, predicate/column pruning unaffected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: shared Java/RE2 subset; see module docstring.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
#: international format only (leading ``+``): 8+ chars of digits /
#: separators between the first and last digit.  Requiring the ``+``
#: keeps false positives near zero on numeric-heavy corpora; local
#: formats are a documented non-goal of this heuristic.
PHONE_RE = r"\+[0-9][0-9() .-]{6,}[0-9]"

REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def pii_scan(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text", redact: bool = True) -> DataFrame:
    """Per-document PII counts and (optionally) the redacted text.

    Counts are computed on the ORIGINAL text independently per pattern;
    redaction is sequential in ``REDACTIONS`` order.
    """
    txt = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(txt, F.lit(EMAIL_RE), F.lit(0)))
    n_ipv4 = F.size(F.regexp_extract_all(txt, F.lit(IPV4_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(txt, F.lit(PHONE_RE), F.lit(0)))
    cols = [
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
        (n_emails + n_ipv4 + n_phones).alias("n_pii"),
    ]
    if redact:
        red = txt
        for pat, repl in REDACTIONS:
            red = F.regexp_replace(red, pat, repl)
        cols.append(red.alias("redacted_text"))
    return df.select(*cols)
