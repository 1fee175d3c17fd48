"""Term-similarity analytics (reference analysis/similarity.py, §2.7),
re-expressed as native DataFrame algebra.

- ``skipgram_similarity_topk``: the reference's SkipgramSimilarity (sparse
  skipgram-count cosine within a term-length band, top-k) becomes
  gram-explode -> band self-join -> hash-aggregate dot product -> window
  top-k.  The length-band predicate (|len(a)-len(b)| <= d) is the join
  prune that keeps the candidate set linear-ish, mirroring the reference's
  length buckets.
- ``close_term_pairs``: KeywordList candidate pairs — a band join on term
  length plus an edit-distance filter (built-in levenshtein).
- ``word_cooccurrence``: SkipCooccurrence — position-window pair counts.
- ``begin_end_similarity``: edit similarity of first/last k chars.

Everything is JVM-side column algebra (gram generation included), so the
same computations run bit-identically on the DuckDB correctness oracle.
"""

from __future__ import annotations

from itertools import combinations
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def char_skipgram_counts(df: DataFrame, term_col: str = "term",
                         ngram_size: int = 3,
                         skip_size: int = 0) -> DataFrame:
    """(term, gram, freq) skipgram counts per term, matching the reference
    generator's semantics: windows at every start, combinations of
    ngram_size-1 positions after the first within ngram_size+skip_size,
    whole-term gram when len(term) <= ngram_size.  Count vectors (not
    offsets) feed the cosine, so per-start combination order is
    irrelevant."""
    term = F.col(term_col)
    n = F.length(term)
    combos = list(combinations(range(1, ngram_size + skip_size),
                               ngram_size - 1))
    per_combo = []
    for combo in combos:
        last = combo[-1]
        grams = F.transform(
            F.sequence(F.lit(1), n - last),
            lambda i: F.concat(
                term.substr(i, F.lit(1)),
                *[F.col(term_col).substr(i + off, F.lit(1)) for off in combo],
            ),
        )
        # sequence(1, x) runs descending for x < 1 — guard each combo
        per_combo.append(F.when(n > last, grams).otherwise(
            F.array().cast("array<string>")))
    all_grams = F.when(
        n <= ngram_size, F.array(term)
    ).otherwise(F.flatten(F.array(*per_combo)))
    return (
        df.select(term, F.explode(all_grams).alias("gram"))
        .groupBy(term_col, "gram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def skipgram_similarity_topk(terms_df: DataFrame, term_col: str = "term",
                             k: int = 5, ngram_size: int = 3,
                             skip_size: int = 0,
                             max_length_diff: int = 2) -> DataFrame:
    """Top-k most similar indexed terms per term, by skipgram-count cosine
    within the +/- max_length_diff length band (self-similarity excluded).

    Output: (term, similar_term, cosine, rank)."""
    grams = char_skipgram_counts(terms_df, term_col, ngram_size, skip_size)
    norms = grams.groupBy(term_col).agg(
        F.sqrt(F.sum(F.col("freq") * F.col("freq"))).alias("norm"))
    a = grams.select(F.col(term_col).alias("term_a"), "gram",
                     F.col("freq").alias("freq_a"))
    b = grams.select(F.col(term_col).alias("term_b"), "gram",
                     F.col("freq").alias("freq_b"))
    dots = (
        a.join(b, "gram")
        .filter(
            (F.col("term_a") != F.col("term_b"))
            & (F.abs(F.length("term_a") - F.length("term_b"))
               <= max_length_diff)
        )
        .groupBy("term_a", "term_b")
        .agg(F.sum(F.col("freq_a") * F.col("freq_b")).alias("dot"))
    )
    na = norms.select(F.col(term_col).alias("term_a"),
                      F.col("norm").alias("norm_a"))
    nb = norms.select(F.col(term_col).alias("term_b"),
                      F.col("norm").alias("norm_b"))
    cos = (
        dots.join(na, "term_a").join(nb, "term_b")
        .select(
            F.col("term_a").alias("term"),
            F.col("term_b").alias("similar_term"),
            F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6)
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("cosine"), "similar_term")
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def skipgram_similarity_topk_bucketed(terms_df: DataFrame,
                                      term_col: str = "term",
                                      k: int = 5, ngram_size: int = 3,
                                      skip_size: int = 0,
                                      max_length_diff: int = 2) -> DataFrame:
    """Identical output to :func:`skipgram_similarity_topk`, but the
    length band is part of the JOIN KEY instead of a post-join predicate
    — mirroring the reference's per-length index buckets
    (similarity.py:316-330).

    Why: joining on raw gram equality fans a hot gram (think "the" inside
    a web-corpus vocabulary) out quadratically within one join key.  Here
    side B's gram rows are replicated into the 2*max_length_diff+1
    neighboring length keys and the join runs on (gram, length) — a hot
    gram's candidates split across term lengths, so per-key fanout is
    bounded by the per-length gram frequency and the shuffle key spreads
    (constant-factor 2d+1 replication buys quadratic-fanout relief).  The
    pair set is exactly the band predicate, so dot products, cosines and
    ranks are unchanged."""
    grams = char_skipgram_counts(terms_df, term_col, ngram_size, skip_size)
    norms = grams.groupBy(term_col).agg(
        F.sqrt(F.sum(F.col("freq") * F.col("freq"))).alias("norm"))
    a = grams.select(F.col(term_col).alias("term_a"), "gram",
                     F.col("freq").alias("freq_a"),
                     F.length(term_col).alias("len_key"))
    b = grams.select(
        F.col(term_col).alias("term_b"), "gram",
        F.col("freq").alias("freq_b"),
        F.explode(F.sequence(
            F.length(term_col) - max_length_diff,
            F.length(term_col) + max_length_diff)).alias("len_key"))
    dots = (
        a.join(b, ["gram", "len_key"])
        .filter(F.col("term_a") != F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.sum(F.col("freq_a") * F.col("freq_b")).alias("dot"))
    )
    na = norms.select(F.col(term_col).alias("term_a"),
                      F.col("norm").alias("norm_a"))
    nb = norms.select(F.col(term_col).alias("term_b"),
                      F.col("norm").alias("norm_b"))
    cos = (
        dots.join(na, "term_a").join(nb, "term_b")
        .select(
            F.col("term_a").alias("term"),
            F.col("term_b").alias("similar_term"),
            F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6)
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("cosine"), "similar_term")
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def close_term_pairs(terms_df: DataFrame, term_col: str = "term",
                     max_distance: int = 2,
                     max_length_diff: Optional[int] = None) -> DataFrame:
    """Candidate close-term pairs: length-band self-join + edit-distance
    filter (reference KeywordList, similarity.py:161-272)."""
    if max_length_diff is None:
        max_length_diff = max_distance
    a = terms_df.select(F.col(term_col).alias("term_a"))
    b = terms_df.select(F.col(term_col).alias("term_b"))
    return (
        a.join(b, F.col("term_a") < F.col("term_b"))
        .filter(F.abs(F.length("term_a") - F.length("term_b"))
                <= max_length_diff)
        .withColumn("distance", F.levenshtein("term_a", "term_b"))
        .filter(F.col("distance") <= max_distance)
    )


def word_cooccurrence(df: DataFrame, text_col: str = "text",
                      window: int = 2, min_freq: int = 2) -> DataFrame:
    """Ordered word-pair counts within a skip window (reference
    SkipCooccurrence, similarity.py:96-158): (w1, w2, freq) for pairs at
    position distance 1..window."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    size = F.size(words)
    # one zip over a shifted view per distance d — linear, vs the
    # per-element slice(words, i+2, window) which allocates a window-sized
    # array for every position
    per_distance = []
    for d in range(1, window + 1):
        shifted = F.slice(words, d + 1, F.greatest(size - d, F.lit(1)))
        zipped = F.zip_with(
            words, shifted,
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
        # the zip pads the tail with nulls; drop those pairs
        per_distance.append(
            F.filter(zipped, lambda s: s.getField("w2").isNotNull()))
    pairs = (F.concat(*per_distance) if len(per_distance) > 1
             else per_distance[0])
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .filter((F.length("w1") > 0) & (F.length("w2") > 0))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )


def begin_end_similarity(pairs_df: DataFrame, col_a: str = "term_a",
                         col_b: str = "term_b", k: int = 3) -> DataFrame:
    """Levenshtein similarity of the first and last k chars of term pairs
    (reference similarity.py:51-93)."""
    pre_a = F.substring(F.col(col_a), 1, k)
    pre_b = F.substring(F.col(col_b), 1, k)
    suf_a = F.substring(F.col(col_a), -k, k)
    suf_b = F.substring(F.col(col_b), -k, k)

    def sim(x, y):
        denom = F.greatest(F.length(x), F.length(y))
        return F.round(1 - F.levenshtein(x, y) / denom, 6)

    return pairs_df.withColumn("begin_similarity", sim(pre_a, pre_b)) \
                   .withColumn("end_similarity", sim(suf_a, suf_b))
