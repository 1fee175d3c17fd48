"""Match context windows (the reference's FuzzyContextSearcher, §2.6).

Attaching ±N chars of context to matches is pure column algebra on Spark —
a broadcast-friendly join of the matches table back to the documents table
plus two substrings (JVM-side, whole-stage codegen).  Re-searching inside a
context window reuses the ordinary matcher over the context strings.
"""

from __future__ import annotations

from typing import List, Optional

from fuzzy_search_spark.matcher import Match, find_matches
from fuzzy_search_spark.model import CompiledModel

DEFAULT_CONTEXT_SIZE = 100


def add_match_context(match: Match, text: str,
                      prefix_size: int = DEFAULT_CONTEXT_SIZE,
                      suffix_size: int = DEFAULT_CONTEXT_SIZE) -> dict:
    """Context window around one match (reference phrase_match.py:300-375)."""
    context_start = max(match.offset - prefix_size, 0)
    context_end = min(match.end + suffix_size, len(text))
    return {
        "match": match,
        "context": text[context_start:context_end],
        "context_start": context_start,
        "context_end": context_end,
        "prefix": text[context_start:match.offset],
        "suffix": text[match.end:context_end],
    }


def find_matches_with_context(text: str, model: CompiledModel,
                              context_size: int = DEFAULT_CONTEXT_SIZE,
                              prefix_size: Optional[int] = None,
                              suffix_size: Optional[int] = None) -> List[dict]:
    """FuzzyContextSearcher.find_matches — NB the reference defaults to
    allow_overlapping_matches=True on this path (context_searcher.py:70)."""
    from dataclasses import replace

    cfg = replace(model.config, allow_overlapping_matches=True)
    overlapping_model = replace_config(model, cfg)
    matches = find_matches(text, overlapping_model)
    pre = prefix_size if prefix_size is not None else context_size
    suf = suffix_size if suffix_size is not None else context_size
    return [add_match_context(m, text, pre, suf) for m in matches]


def find_matches_in_context(match_in_context: dict, model: CompiledModel) -> List[Match]:
    """Re-search a match's context window; offsets re-based to the source
    text (reference context_searcher.py:105-134)."""
    rebased = []
    for ctx in find_matches_with_context(match_in_context["context"], model):
        m = ctx["match"]
        m.offset += match_in_context["context_start"]
        m.end += match_in_context["context_start"]
        rebased.append(m)
    return rebased


def replace_config(model: CompiledModel, cfg) -> CompiledModel:
    """Shallow model copy with a different (compatible) search config.
    Gram structures depend only on ngram/skip/ignorecase, which must not
    change here."""
    import copy

    if (cfg.ngram_size, cfg.skip_size, cfg.ignorecase) != (
            model.config.ngram_size, model.config.skip_size,
            model.config.ignorecase):
        raise ValueError("gram-shape config changed; recompile the model")
    clone = copy.copy(model)
    clone.config = cfg
    return clone


def attach_context_columns(matches_df, docs_df, url_col: str = "url",
                           text_col: str = "text",
                           context_size: int = DEFAULT_CONTEXT_SIZE):
    """Spark-native context attachment: join matches back to documents and
    derive prefix/suffix/context via substring arithmetic (no UDFs)."""
    from pyspark.sql import functions as F

    docs = docs_df.select(F.col(url_col), F.col(text_col).alias("_doc_text"))
    joined = matches_df.join(docs, url_col)
    ctx_start = F.greatest(F.col("offset") - context_size, F.lit(0))
    ctx_end = F.least(F.col("end") + context_size, F.length("_doc_text"))
    return (
        joined
        .withColumn("context_start", ctx_start)
        .withColumn("context_end", ctx_end)
        .withColumn("context", F.expr(
            f"substring(_doc_text, context_start + 1, "
            f"context_end - context_start)"))
        .withColumn("prefix", F.expr(
            "substring(_doc_text, context_start + 1, offset - context_start)"))
        .withColumn("suffix", F.expr(
            "substring(_doc_text, `end` + 1, context_end - `end`)"))
        .drop("_doc_text")
    )
