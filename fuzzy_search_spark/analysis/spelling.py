"""Spelling-shift detection between two corpora (reference
analysis/spelling_compare.py, §2.7).

Words are classified by the relative change of their frequency fraction
from corpus 1 to corpus 2 (reference compute_percentage_diff,
freq.py:357-378): 'disappear'/'decrease' (drops) and 'emerge'/'increase'
(jumps).  Dropped words are then linked to similar risen words — the
reference uses an external word-embedding model for that similarity; this
engine substitutes the skipgram-cosine similarity it already computes
relationally (documented divergence: the embedding model is an external
artifact, not part of the library).

All set up as DataFrame algebra: two hash aggregations, one outer join, a
length-banded similarity join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_fractions(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-word corpus fraction, fully lazy: the corpus total is a
    one-row aggregate broadcast-cross-joined back in, NOT a driver-side
    ``.head()`` — the whole computation stays one DAG (Catalyst reuses the
    word-count exchange between the two branches), so callers can compose
    it without triggering eager jobs."""
    words = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
                  .alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    )
    total = words.agg(
        F.coalesce(F.sum("freq"), F.lit(1)).alias("_total"))
    return (words.crossJoin(F.broadcast(total))
            .withColumn("frac", F.col("freq") / F.col("_total"))
            .drop("_total"))


def frequency_change(corpus1: DataFrame, corpus2: DataFrame,
                     text_col: str = "text", min_freq: int = 5,
                     increase_threshold: float = 0.5,
                     emerge_threshold: float = 5.0,
                     decrease_threshold: float = 0.5,
                     disappear_threshold: float = 5.0) -> DataFrame:
    """Per-word change levels between two corpora with the reference's
    dual-direction semantics (spelling_compare.py:240-259): pct_diff_1 is
    corpus 1's fraction relative to corpus 2 (unbounded — NULL here — when
    the word vanished from corpus 2), pct_diff_2 the reverse.  Drops are
    classified first: disappear (pd1 > 5), decrease (pd1 > 0.5), then
    jumps: emerge (pd2 > 5), increase (pd2 > 0.5); else stable.  NB the
    reference crosses the threshold names between the two directions —
    behavior, not names, is what's replicated."""
    f1 = word_fractions(corpus1, text_col).select(
        "word", F.col("freq").alias("freq_1"), F.col("frac").alias("frac_1"))
    f2 = word_fractions(corpus2, text_col).select(
        "word", F.col("freq").alias("freq_2"), F.col("frac").alias("frac_2"))
    joined = (
        f1.join(f2, "word", "outer")
        .fillna(0, ["freq_1", "freq_2"])
        .fillna(0.0, ["frac_1", "frac_2"])
        .filter((F.col("freq_1") >= min_freq) | (F.col("freq_2") >= min_freq))
    )
    pd1 = F.when(F.col("frac_2") > 0,
                 (F.col("frac_1") - F.col("frac_2")) / F.col("frac_2"))
    pd2 = F.when(F.col("frac_1") > 0,
                 (F.col("frac_2") - F.col("frac_1")) / F.col("frac_1"))
    gone2 = (F.col("frac_2") == 0) & (F.col("frac_1") > 0)  # pd1 = +inf
    gone1 = (F.col("frac_1") == 0) & (F.col("frac_2") > 0)  # pd2 = +inf
    level = (
        F.when(gone2 | (pd1 > emerge_threshold), F.lit("disappear"))
        .when(pd1 > increase_threshold, F.lit("decrease"))
        .when(gone1 | (pd2 > disappear_threshold), F.lit("emerge"))
        .when(pd2 > decrease_threshold, F.lit("increase"))
        .otherwise(F.lit("stable"))
    )
    return joined.select(
        "word", "freq_1", "freq_2",
        F.round("frac_1", 9).alias("frac_1"),
        F.round("frac_2", 9).alias("frac_2"),
        F.round(pd1, 6).alias("pct_diff_1"),
        F.round(pd2, 6).alias("pct_diff_2"),
        level.alias("change_level"),
    )


def spelling_shifts(corpus1: DataFrame, corpus2: DataFrame,
                    text_col: str = "text", min_freq: int = 5,
                    similarity_threshold: float = 0.5,
                    max_length_diff: int = 2,
                    similarity_df: DataFrame = None) -> DataFrame:
    """Link dropped words to similar risen words: (drop_word, jump_word,
    drop_level, jump_level, similarity, change_type) where change_type is
    'replace' for disappeared words and 'shift' for decreased ones.

    ``similarity_df`` restores the reference's trained-embedding linking
    (spelling_compare.py:200-259, where drop->jump similarity comes from
    an external word2vec model): pass (term_a, term_b, similarity) pairs
    — e.g. embedding cosines — and they replace the built-in
    skipgram-cosine computation.  Pairs are looked up in both
    orientations (similarity is symmetric)."""
    from fuzzy_search_spark.analysis.similarity import char_skipgram_counts

    # no cache: drops/jumps branch from the same aggregation subtree, which
    # Catalyst's exchange reuse shares within the single returned DAG
    changes = frequency_change(corpus1, corpus2, text_col, min_freq)
    drops = changes.filter(
        F.col("change_level").isin("decrease", "disappear")).select(
        F.col("word").alias("drop_word"),
        F.col("change_level").alias("drop_level"))
    jumps = changes.filter(
        F.col("change_level").isin("increase", "emerge")).select(
        F.col("word").alias("jump_word"),
        F.col("change_level").alias("jump_level"))
    if similarity_df is not None:
        both = similarity_df.select(
            F.col("term_a").alias("drop_word"),
            F.col("term_b").alias("jump_word"), "similarity"
        ).unionAll(similarity_df.select(
            F.col("term_b").alias("drop_word"),
            F.col("term_a").alias("jump_word"), "similarity"))
        sims = (
            drops.join(both, "drop_word").join(jumps, "jump_word")
            .filter(F.abs(F.length("drop_word") - F.length("jump_word"))
                    <= max_length_diff)
            .filter(F.col("similarity") > similarity_threshold)
            .groupBy("drop_word", "jump_word", "drop_level", "jump_level")
            .agg(F.max("similarity").alias("similarity"))
        )
        change_type = F.when(F.col("drop_level") == "disappear", "replace") \
            .otherwise("shift")
        return sims.select("drop_word", "jump_word", "drop_level",
                           "jump_level", "similarity",
                           change_type.alias("change_type"))
    terms = drops.select(F.col("drop_word").alias("term")).unionAll(
        jumps.select(F.col("jump_word").alias("term"))).distinct()
    grams = char_skipgram_counts(terms, "term", ngram_size=3, skip_size=0)
    norms = grams.groupBy("term").agg(
        F.sqrt(F.sum(F.col("freq") * F.col("freq"))).alias("norm"))
    # the +/-d length band is part of the JOIN KEY (side B replicated into
    # the 2d+1 neighboring length keys), not a post-join predicate — a hot
    # gram's candidates split across term lengths instead of fanning out
    # quadratically inside one shuffle key (same shape as
    # analysis/similarity.skipgram_similarity_topk_bucketed)
    ga = grams.select(F.col("term").alias("drop_word"), "gram",
                      F.col("freq").alias("fa"),
                      F.length("term").alias("len_key"))
    gb = grams.select(
        F.col("term").alias("jump_word"), "gram",
        F.col("freq").alias("fb"),
        F.explode(F.sequence(
            F.length("term") - max_length_diff,
            F.length("term") + max_length_diff)).alias("len_key"))
    sims = (
        drops.join(ga, "drop_word")
        .join(gb.join(jumps, "jump_word"), ["gram", "len_key"])
        .groupBy("drop_word", "jump_word", "drop_level", "jump_level")
        .agg(F.sum(F.col("fa") * F.col("fb")).alias("dot"))
        .join(norms.select(F.col("term").alias("drop_word"),
                           F.col("norm").alias("norm_a")), "drop_word")
        .join(norms.select(F.col("term").alias("jump_word"),
                           F.col("norm").alias("norm_b")), "jump_word")
        .withColumn("similarity",
                    F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6))
        .filter(F.col("similarity") > similarity_threshold)
    )
    change_type = F.when(F.col("drop_level") == "disappear", "replace") \
        .otherwise("shift")
    return sims.select("drop_word", "jump_word", "drop_level", "jump_level",
                       "similarity", change_type.alias("change_type"))
