"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All JVM-side column expressions (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "was", "that"],
    "nl": ["de", "het", "een", "van", "den", "der", "met", "voor"],
    "de": ["der", "die", "das", "und", "nicht", "ein", "ist", "zu"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "et"],
    "es": ["el", "la", "los", "las", "que", "es", "una", "por"],
}


def token_stats(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document token statistics: total tokens, distinct tokens,
    type/token ratio, mean token length."""
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"\w+"), 0)
    return df.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.round(F.size(F.array_distinct(words)) /
                F.greatest(F.size(words), F.lit(1)), 6).alias("ttr"),
        F.round(
            F.aggregate(words, F.lit(0).cast("double"),
                        lambda acc, w: acc + F.length(w)) /
            F.greatest(F.size(words), F.lit(1)), 6).alias("mean_token_len"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features: length, alpha ratio, punct
    ratio, whitespace ratio, plus a composite keep/drop signal."""
    txt = F.col(text_col)
    n = F.greatest(F.length(txt), F.lit(1))
    alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(txt, r"[^0-9]", ""))
    space = F.length(F.regexp_replace(txt, r"[^ \t\n]", ""))
    punct = F.length(txt) - alpha - digit - space
    out = df.select(
        F.col(id_col),
        F.length(txt).alias("n_chars"),
        F.round(alpha / n, 6).alias("alpha_ratio"),
        F.round(digit / n, 6).alias("digit_ratio"),
        F.round(punct / n, 6).alias("punct_ratio"),
        F.round(space / n, 6).alias("space_ratio"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_chars") >= 100)
        & (F.col("alpha_ratio") >= 0.6)
        & (F.col("punct_ratio") <= 0.1),
    )


def language_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-vote language classifier: (id, lang_guess, vote counts).

    Deterministic tie-break: highest vote count, then language code order.
    """
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    votes = [
        F.size(F.filter(words, lambda w: w.isin(*sw))).alias(f"votes_{lang}")
        for lang, sw in LANG_STOPWORDS.items()
    ]
    scored = df.select(F.col(id_col), *votes)
    best = F.greatest(*[F.col(f"votes_{lang}") for lang in LANG_STOPWORDS])
    guess = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_STOPWORDS):
        guess = guess.when(F.col(f"votes_{lang}") == best, F.lit(lang))
    return scored.withColumn("lang_guess", guess)


def fingerprints(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-text md5, normalized-text md5 (casefold +
    whitespace collapse), and a winnowing-style fingerprint = min md5 over
    5-word shingles (robust to local edits)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    words = F.split(norm, " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - 5, F.lit(0)))
    shingle_hashes = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, 5))))
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("md5_exact"),
        F.md5(norm).alias("md5_normalized"),
        F.array_min(shingle_hashes).alias("winnow_min"),
    )
