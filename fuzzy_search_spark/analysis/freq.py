"""Word-ngram frequency and contrastive statistics.

Reference semantics (analysis/freq.py): word ngrams of orders 1..max over
``<s>``/``</s>``-padded token streams, Counter-backed; log-likelihood ratio
(G2) between two corpora with directional sign.  Here these are hash
aggregations — Catalyst does partial (map-side) aggregation automatically,
so the shuffle carries only distinct (n, gram) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENT_START = "<s>"
SENT_END = "</s>"


def _ngram_array(text_col: str, n: int, pad: bool):
    """Column of all order-n word ngrams of a text column.

    Built as a chain of zip_with over shifted views of the word array —
    one linear pass — rather than a per-index slice+join (which allocates
    an n-element array per output gram and measures ~4x slower)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    if pad:
        words = F.concat(F.array(F.lit(SENT_START)), words,
                         F.array(F.lit(SENT_END)))
    size = F.size(words)
    grams = words
    for j in range(1, n):
        shifted = F.slice(words, j + 1, F.greatest(size - j, F.lit(1)))
        grams = F.zip_with(grams, shifted,
                           lambda a, b: F.concat(a, F.lit(" "), b))
    if n == 1:
        return grams
    # the zip pads the tail with nulls (concat(null) -> null); only the
    # first size-n+1 entries are real grams
    return F.when(size >= n,
                  F.slice(grams, 1, size - (n - 1))).otherwise(F.array())


def word_ngram_counts(df: DataFrame, text_col: str = "text",
                      max_n: int = 2, pad: bool = False,
                      orders=None) -> DataFrame:
    """Counts of word ngrams: (n, gram, freq).

    ``orders`` restricts to specific orders (default: every order
    1..max_n); ``pad`` adds the reference's sentence-boundary markers."""
    orders = list(orders) if orders is not None else list(range(1, max_n + 1))
    # ONE scan: all orders' gram arrays tag their order inline and explode
    # from the same projection (a per-order unionAll re-reads the corpus
    # once per order).  NB the tagger must be built by a factory: a
    # two-parameter lambda handed to F.transform would receive the array
    # INDEX as its second argument, shadowing a `n=n` default.
    def _tag(order: int):
        return lambda g: F.struct(F.lit(order).alias("n"), g.alias("gram"))

    arrays = [F.transform(_ngram_array(text_col, n, pad), _tag(n))
              for n in orders]
    tagged = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
    return (
        df.select(F.explode(tagged).alias("t"))
        .select("t.n", "t.gram")
        .filter(F.length("gram") > 0)
        .groupBy("n", "gram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def top_ngrams(df: DataFrame, text_col: str = "text", n: int = 2,
               k: int = 50) -> DataFrame:
    """Top-k ngrams of one order, deterministic order (freq desc, gram)."""
    counts = word_ngram_counts(df, text_col, orders=[n])
    return (counts.select("gram", "freq")
            .orderBy(F.desc("freq"), F.col("gram")).limit(k))


def ngram_probabilities(df: DataFrame, text_col: str = "text",
                        max_n: int = 2, smoothing_k: float = 1.0) -> DataFrame:
    """Per-ngram MLE / add-k (Laplace) / conditional probabilities
    (reference analysis/freq.py:184-283):

    - ``p_mle``            freq / total ngram tokens of that order
    - ``p_laplace``        (freq + 1) / (total + unigram vocab size)
    - ``p_conditional``    freq / freq(head) — the last token given its
                           preceding tokens (order-1 uses the unigram total)
    - ``p_cond_laplace``   (freq + k) / (freq(head) + k * vocab)
    """
    # fully lazy: order totals and the unigram vocab size are tiny
    # aggregates broadcast-joined back in (no driver collect); all four
    # consumers branch from the same (n, gram) aggregation exchange, which
    # Catalyst reuses within the single returned DAG
    counts = word_ngram_counts(df, text_col, max_n=max_n)
    order_totals = counts.groupBy("n").agg(
        F.sum("freq").alias("order_total"))
    uni = counts.filter(F.col("n") == 1).agg(
        F.coalesce(F.sum("freq"), F.lit(0)).alias("_uni_total"),
        F.count(F.lit(1)).alias("_vocab_size"))
    heads = counts.select(
        F.col("gram").alias("head"), F.col("freq").alias("head_freq"),
        (F.col("n") + 1).alias("n"))
    head_expr = F.when(
        F.col("n") == 1, F.col("_uni_total")
    ).otherwise(F.col("head_freq"))
    head_key = F.when(
        F.col("n") > 1,
        F.expr("array_join(slice(split(gram, ' '), 1, n - 1), ' ')"),
    )
    joined = (
        counts.withColumn("head", head_key)
        .join(heads, ["head", "n"], "left")
        .join(F.broadcast(order_totals), "n")
        .crossJoin(F.broadcast(uni))
    )
    k = F.lit(float(smoothing_k))
    vocab_size = F.col("_vocab_size")
    return joined.select(
        "n", "gram", "freq",
        F.round(F.col("freq") / F.col("order_total"), 9).alias("p_mle"),
        F.round((F.col("freq") + 1) / (F.col("order_total") + vocab_size), 9)
        .alias("p_laplace"),
        F.round(F.when(head_expr > 0, F.col("freq") / head_expr)
                .otherwise(F.lit(0.0)), 9).alias("p_conditional"),
        F.round((F.col("freq") + k) / (head_expr + k * vocab_size), 9)
        .alias("p_cond_laplace"),
    )


def log_likelihood_ratio(target: DataFrame, reference: DataFrame,
                         text_col: str = "text", n: int = 1,
                         min_freq: int = 5) -> DataFrame:
    """Contrastive keyword extraction via G2 log-likelihood ratio
    (reference: analysis/freq.py:286-354): positive llr = overused in the
    target corpus, negative = underused."""
    flagged = target.select(
        F.lit(True).alias("_is_t"), F.col(text_col).alias(text_col)
    ).unionAll(reference.select(
        F.lit(False).alias("_is_t"), F.col(text_col).alias(text_col)))
    joined = (
        flagged.select("_is_t",
                       F.explode(_ngram_array(text_col, n, False))
                       .alias("gram"))
        .filter(F.length("gram") > 0)
        .groupBy("gram")
        .agg(F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("freq_t"),
             F.sum(F.when(F.col("_is_t"), 0).otherwise(1)).alias("freq_r"))
    )
    # fully lazy: corpus totals are a one-row aggregate broadcast back in;
    # the totals branch and the output branch share the per-gram
    # aggregation exchange via Catalyst exchange reuse (no persist, no
    # driver-side .head() action)
    totals = joined.agg(
        F.coalesce(F.sum("freq_t"), F.lit(0)).cast("double").alias("_ta"),
        F.coalesce(F.sum("freq_r"), F.lit(0)).cast("double").alias("_tb"))
    a, b = F.col("freq_t").cast("double"), F.col("freq_r").cast("double")
    ta, tb = F.col("_ta"), F.col("_tb")
    e1 = ta * (a + b) / (ta + tb)
    e2 = tb * (a + b) / (ta + tb)
    term1 = F.when(a > 0, a * F.log(a / e1)).otherwise(F.lit(0.0))
    term2 = F.when(b > 0, b * F.log(b / e2)).otherwise(F.lit(0.0))
    llr = F.lit(2.0) * (term1 + term2)
    signed = F.when(a / ta >= b / tb, llr).otherwise(-llr)
    return (
        joined.filter((F.col("freq_t") + F.col("freq_r")) >= min_freq)
        .crossJoin(F.broadcast(totals))
        .select("gram", "freq_t", "freq_r", F.round(signed, 6).alias("llr"))
    )


def tfidf_topk(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 5) -> DataFrame:
    """Per-document TF-IDF keywords: the top ``k`` terms of each
    document by smoothed TF-IDF — the per-doc complement of the
    corpus-level LLR keyword list (llr_keywords compares corpora;
    this labels individual documents).

    ``score = tf * (ln((N + 1) / (df + 1)) + 1)`` (sklearn-style
    smoothing), ranked per document by ``(round(score, 6) DESC, term
    ASC)`` — the ROUNDED score ranks, so sub-1e-6 libm differences
    between engines cannot flip the cut (the DuckDB oracle ranks the
    same way).

    Scale shape: one scan -> explode -> (doc, term) count HashAggregate
    whose exchange BOTH consumers reuse at runtime (the
    document-frequency rollup and the scoring join — same
    exchange-alignment pins as boilerplate_ratio), a broadcast one-row
    corpus count, and a per-DOCUMENT row_number window (bounded by
    document vocabulary, never corpus-wide).
    """
    from pyspark.sql import Window

    pairs = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
                  .alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        # exchange-alignment pins (see boilerplate_ratio): keep both
        # consumers' subtrees canonically equal so the explode runs once
        .filter(F.col("term").isNotNull() & F.col("doc_id").isNotNull())
    )
    dfreq = (pairs.filter(F.col("tf") >= 1)
             .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    scored = (
        pairs.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * (F.log((F.col("n") + 1.0)
                                         / (F.col("df") + 1.0)) + 1.0), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )
