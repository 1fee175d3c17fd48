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


def word_ngram_counts(df: DataFrame, text_col: str = "text",
                      max_n: int = 2, pad: bool = False) -> DataFrame:
    """Counts of word ngrams of every order 1..max_n: (n, gram, freq).

    ``pad`` adds the reference's sentence-boundary markers."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    if pad:
        words = F.concat(F.array(F.lit(SENT_START)), words,
                         F.array(F.lit(SENT_END)))
    grams_per_order = []
    for n in range(1, max_n + 1):
        size = F.size(words)
        idx = F.sequence(F.lit(0), F.greatest(size - n, F.lit(0)))
        grams = F.when(size >= n, F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
        ).otherwise(F.array())
        grams_per_order.append(
            df.select(F.lit(n).alias("n"), F.explode(grams).alias("gram")))
    exploded = grams_per_order[0]
    for extra in grams_per_order[1:]:
        exploded = exploded.unionAll(extra)
    return (
        exploded.filter(F.length("gram") > 0)
        .groupBy("n", "gram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def top_ngrams(df: DataFrame, text_col: str = "text", n: int = 2,
               k: int = 50) -> DataFrame:
    """Top-k ngrams of one order, deterministic order (freq desc, gram)."""
    counts = word_ngram_counts(df, text_col, max_n=n).filter(F.col("n") == n)
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
    counts = word_ngram_counts(df, text_col, max_n=max_n)
    totals = {
        r["n"]: r["total"]
        for r in counts.groupBy("n").agg(F.sum("freq").alias("total")).collect()
    }
    vocab_size = counts.filter(F.col("n") == 1).count()
    total_map = F.create_map(*[
        x for n, t in sorted(totals.items()) for x in (F.lit(n), F.lit(t))
    ])
    heads = counts.select(
        F.col("gram").alias("head"), F.col("freq").alias("head_freq"),
        (F.col("n") + 1).alias("n"))
    head_expr = F.when(
        F.col("n") == 1, F.lit(totals.get(1, 0))
    ).otherwise(F.col("head_freq"))
    head_key = F.when(
        F.col("n") > 1,
        F.expr("array_join(slice(split(gram, ' '), 1, n - 1), ' ')"),
    )
    joined = (
        counts.withColumn("head", head_key)
        .join(heads, ["head", "n"], "left")
        .withColumn("order_total", total_map[F.col("n")])
    )
    k = F.lit(float(smoothing_k))
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
    t = (word_ngram_counts(target, text_col, max_n=n)
         .filter(F.col("n") == n)
         .select("gram", F.col("freq").alias("freq_t")))
    r = (word_ngram_counts(reference, text_col, max_n=n)
         .filter(F.col("n") == n)
         .select("gram", F.col("freq").alias("freq_r")))
    joined = t.join(r, "gram", "outer").fillna(0, ["freq_t", "freq_r"])
    total_t = joined.agg(F.sum("freq_t")).head()[0] or 0
    total_r = joined.agg(F.sum("freq_r")).head()[0] or 0
    a, b = F.col("freq_t").cast("double"), F.col("freq_r").cast("double")
    ta, tb = F.lit(float(total_t)), F.lit(float(total_r))
    e1 = ta * (a + b) / (ta + tb)
    e2 = tb * (a + b) / (ta + tb)
    term1 = F.when(a > 0, a * F.log(a / e1)).otherwise(F.lit(0.0))
    term2 = F.when(b > 0, b * F.log(b / e2)).otherwise(F.lit(0.0))
    llr = F.lit(2.0) * (term1 + term2)
    signed = F.when(a / ta >= b / tb, llr).otherwise(-llr)
    return (
        joined.filter((F.col("freq_t") + F.col("freq_r")) >= min_freq)
        .select("gram", "freq_t", "freq_r", F.round(signed, 6).alias("llr"))
    )
