"""Language-model quality scoring: Stupid-Backoff bigram log-probability
per document (the CCNet-style perplexity filter, Wenzek et al. 2020;
backoff scheme from Brants et al. 2007, "Large Language Models in Machine
Translation").

A web-scale pipeline scores every page with an n-gram LM trained on a
trusted corpus and drops the high-perplexity tail.  This module trains the
LM distributed (two hash aggregations over the token stream) and scores
documents with two key-joins — no model file, no Python in the hot path:

* ``train_bigram_lm`` — unigram counts, bigram counts with their context
  counts pre-attached (so scoring needs no third join), and a one-row
  totals frame.  Documents are padded with a ``<s>`` sentinel whose
  context count is the training-document count.
* ``score_documents`` — per token ``t_i`` (i >= 1 in the padded stream):
  ``c(w1,w2)/c(w1)`` if the bigram was seen, else
  ``alpha * (c(w2)+1)/(T+V+1)`` (add-one unigram with one reserved
  OOV slot), else ``alpha/(T+V+1)``.  Per-token log10 scores are rounded
  to 1e-6 and summed as INTEGER micro-units, which makes the document sum
  exact and independent of row order / partitioning — the property the
  cross-engine oracle (and any re-run on a different cluster size) needs.
  Plain float summation would be IEEE-order-dependent.

Scale shape: training is two partial-aggregated groupBys (map-side
combine); scoring joins the exploded gram stream against the count
tables with a TWO-TIER SKEW GUARD: the top ``hot_k`` grams by count (the
head of the Zipf curve — "the", "of the" — which at web scale would
funnel a large fraction of the stream through a handful of shuffle
partitions and can exceed any broadcast threshold as part of the full
table) are broadcast and joined map-side, and only the rows that miss
the hot tier shuffle against the full table — a stream whose keys are by
construction tail grams, so the residual shuffle is skew-free.  AQE
skew-join splitting remains as backstop for the tail.  The reference
library has no LM layer (builder-brief scope: training-data pipeline
operators).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = r"\w+"
BOS = "<s>"


def _tokens(text_col: str):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE),
                                F.lit(0))


def _padded_pairs(text_col: str):
    """``<s>``-padded adjacent pairs as ``'w1 w2'`` string keys, built via
    zip_with over shifted slices (no per-index slicing, no window)."""
    p = F.concat(F.array(F.lit(BOS)), _tokens(text_col))
    n = F.size(p)
    return F.zip_with(F.slice(p, 1, n - 1), F.slice(p, 2, n - 1),
                      lambda a, b: F.concat_ws(" ", a, b))


def _two_tier_left(stream: DataFrame, table: DataFrame, key: str,
                   hot_k: int) -> DataFrame:
    """LEFT join ``stream`` against a count ``table`` on ``key`` with the
    hot tier broadcast: the ``hot_k`` highest-count keys (ties broken by
    key, so the tier is deterministic) join map-side; only rows that miss
    the hot tier — tail keys by construction — shuffle against the full
    table.  Exactly left-join semantics: every stream row appears once,
    unmatched rows keep null payloads.  ``hot_k=0`` disables the guard
    and degrades to the plain shuffle join."""
    if hot_k <= 0:
        return stream.join(table, key, "left")
    payload = [c for c in table.columns if c != key]
    count_col = payload[0]
    hot = (table.orderBy(F.col(count_col).desc(), F.col(key))
           .limit(hot_k)
           .withColumn("_hot", F.lit(True)))
    h = stream.join(F.broadcast(hot), key, "left")
    hit = h.filter(F.col("_hot").isNotNull()).drop("_hot")
    miss = (h.filter(F.col("_hot").isNull())
            .drop("_hot", *payload)
            .join(table, key, "left"))
    return hit.unionByName(miss)


def train_bigram_lm(docs: DataFrame, text_col: str = "text"
                    ) -> Tuple[DataFrame, DataFrame, DataFrame]:
    """Train the bigram LM.  Returns ``(unigrams, bigrams, totals)``:
    ``unigrams(w, c)``, ``bigrams(g, c12, c1)`` keyed by the ``'w1 w2'``
    pair string with the context count attached, and a one-row
    ``totals(train_tokens, vocab_size, n_docs)``."""
    toks = docs.select(F.explode(_tokens(text_col)).alias("w"))
    unigrams = toks.groupBy("w").agg(F.count("*").alias("c"))

    pairs = docs.select(F.explode(_padded_pairs(text_col)).alias("g"))
    big = pairs.groupBy("g").agg(F.count("*").alias("c12"))

    n_docs = docs.select(F.count("*").alias("n_docs"))
    w1 = F.split(F.col("g"), " ", 2).getItem(0)
    bigrams = (big.withColumn("w1", w1)
               .join(unigrams.withColumnRenamed("w", "w1")
                     .withColumnRenamed("c", "uc"), "w1", "left")
               .crossJoin(F.broadcast(n_docs))
               .select("g", "c12",
                       F.coalesce("uc", "n_docs").alias("c1")))

    totals = (unigrams.agg(F.sum("c").alias("train_tokens"),
                           F.count("*").alias("vocab_size"))
              .crossJoin(F.broadcast(n_docs)))
    return unigrams, bigrams, totals


def score_documents(docs: DataFrame, unigrams: DataFrame,
                    bigrams: DataFrame, totals: DataFrame,
                    alpha: float = 0.4, id_col: str = "doc_id",
                    text_col: str = "text",
                    hot_k: int = 10_000) -> DataFrame:
    """Score every document under the trained LM.

    Returns ``(id, n_scored, sum_logp_micro, avg_logp, perplexity)`` where
    ``sum_logp_micro`` is the exact integer sum of per-token
    ``round(log10(p) * 1e6)`` (order-independent), ``avg_logp`` its mean
    (0.0 for empty documents) and ``perplexity = 10^-avg_logp``.

    Both count-table joins run through the two-tier skew guard
    (``hot_k`` hottest keys broadcast, tail shuffled; 0 disables)."""
    pairs = docs.select(F.col(id_col),
                        F.explode(_padded_pairs(text_col)).alias("g"))
    w2 = F.split(F.col("g"), " ", 2).getItem(1)
    scored = (_two_tier_left(pairs, bigrams, "g", hot_k)
              .withColumn("w2", w2))
    scored = (_two_tier_left(scored,
                             unigrams.withColumnRenamed("w", "w2")
                             .withColumnRenamed("c", "c2"), "w2", hot_k)
              .crossJoin(F.broadcast(totals)))
    denom = F.col("train_tokens") + F.col("vocab_size") + F.lit(1.0)
    logp = (F.when(F.col("c12").isNotNull(),
                   F.log10(F.col("c12") / F.col("c1")))
            .when(F.col("c2").isNotNull(),
                  F.log10(F.lit(alpha) * (F.col("c2") + 1) / denom))
            .otherwise(F.log10(F.lit(alpha) / denom)))
    micro = F.round(logp * 1e6).cast("long")
    per_doc = (scored.groupBy(id_col)
               .agg(F.count("*").alias("n_scored"),
                    F.sum(micro).alias("sum_logp_micro")))
    # Round the mean in INTEGER micro units (scale-0 round of one exact
    # division), not with round(x, 6): scaled rounding of a value sitting
    # on a .5*1e-6 boundary takes engine-specific decimal paths, while
    # scale-0 half-away-from-zero on the same IEEE quotient is identical
    # everywhere.
    avg_micro = F.when(
        F.col("n_scored") > 0,
        F.round(F.col("sum_logp_micro") / F.col("n_scored")).cast("long")
    ).otherwise(F.lit(0))
    avg = avg_micro / 1e6
    out = (docs.select(id_col)
           .join(per_doc, id_col, "left")
           .select(id_col,
                   F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
                   F.coalesce("sum_logp_micro", F.lit(0))
                   .alias("sum_logp_micro"),
                   avg.alias("avg_logp")))
    return out.withColumn(
        "perplexity", F.round(F.pow(F.lit(10.0), -F.col("avg_logp")), 4))


def perplexity_tiers(scored: DataFrame, langs: DataFrame, n_tiers: int = 3,
                     id_col: str = "doc_id", lang_col: str = "lang_guess",
                     tier_names=("head", "middle", "tail")) -> DataFrame:
    """CCNet-style per-language perplexity tiers (Wenzek et al. 2020:
    split each language's documents into head/middle/tail by LM
    perplexity; the head third is the cleanest training data).

    ``scored`` is :func:`score_documents` output (needs ``n_scored``,
    ``sum_logp_micro``); ``langs`` maps ``id_col`` -> ``lang_col``.
    Ranking key is the exact integer micro-unit mean (higher log-prob =
    lower perplexity = better), tie-broken by id, so the ordering — and
    therefore every tier boundary — is engine- and partitioning-
    invariant: no float comparisons anywhere.  ``tier_idx = floor(
    n_tiers * (rank-1) / n_lang)`` gives equal-count tiers (first tiers
    get the remainder), named via ``tier_names`` when ``n_tiers``
    matches.

    Returns ``(id, lang, avg_logp_micro, lang_rank, n_lang, tier_idx,
    tier)``.

    Scale shape: the window carries only (id, lang, 1 long) — bodies
    never shuffle — but ``partitionBy(lang)`` serializes each language
    into one task, which skews at web scale where one language is half
    the corpus.  The 100-TB variant replaces the window with per-language
    score-histogram cutoffs (two aggregation passes, fully parallel) at
    the cost of boundary exactness; CCNet itself computes cutoffs from a
    sample for the same reason.  This exact-rank form is the correctness
    anchor the sampled variant is validated against."""
    from pyspark.sql import Window

    avg_micro = F.when(
        F.col("n_scored") > 0,
        F.round(F.col("sum_logp_micro") / F.col("n_scored")).cast("long")
    ).otherwise(F.lit(0)).alias("avg_logp_micro")
    slim = (scored.select(F.col(id_col), avg_micro)
            .join(langs.select(F.col(id_col), F.col(lang_col).alias("lang")),
                  id_col))
    w = Window.partitionBy("lang").orderBy(
        F.desc("avg_logp_micro"), F.col(id_col))
    wn = Window.partitionBy("lang")
    ranked = (slim
              .withColumn("lang_rank", F.row_number().over(w))
              .withColumn("n_lang", F.count("*").over(wn))
              .withColumn("tier_idx",
                          F.floor(F.lit(n_tiers) * (F.col("lang_rank") - 1)
                                  / F.col("n_lang")).cast("int")))
    if len(tier_names) == n_tiers:
        tier = None
        for i, name in enumerate(tier_names):
            case = F.when(F.col("tier_idx") == i, F.lit(name))
            tier = case if tier is None else tier.when(
                F.col("tier_idx") == i, F.lit(name))
        ranked = ranked.withColumn("tier", tier)
    else:
        ranked = ranked.withColumn(
            "tier", F.concat(F.lit("tier_"), F.col("tier_idx")))
    return ranked.select(id_col, "lang", "avg_logp_micro", "lang_rank",
                         "n_lang", "tier_idx", "tier")


def perplexity_tiers_by_cutoffs(scored: DataFrame, langs: DataFrame,
                                n_tiers: int = 3, id_col: str = "doc_id",
                                lang_col: str = "lang_guess",
                                accuracy: int = 1_000_000,
                                tier_names=("head", "middle", "tail")
                                ) -> DataFrame:
    """The skew-safe 100-TB variant of :func:`perplexity_tiers`: instead
    of a per-language rank window (one task per language — fatal when
    one language is half a web corpus), compute per-language score
    CUTOFFS with one parallel aggregation (``percentile_approx`` over
    the integer micro scores), broadcast the tiny (n_langs x n_tiers-1)
    cutoff table, and bucket each document by comparison.  This is what
    CCNet itself does (cutoffs from a sample).  The cutoff contract is
    weaker than the rank contract: assignment is monotone in score
    within a language and tier sizes are near-equal (off by sketch
    rank-rounding and by ties sitting exactly on a cutoff, which all
    land in the better tier) — :func:`perplexity_tiers` is the exact
    anchor the validation test measures that boundary drift against.

    Returns ``(id, lang, avg_logp_micro, tier_idx, tier)`` — no ranks:
    ranks are exactly what the cutoff formulation avoids computing."""
    avg_micro = F.when(
        F.col("n_scored") > 0,
        F.round(F.col("sum_logp_micro") / F.col("n_scored")).cast("long")
    ).otherwise(F.lit(0)).alias("avg_logp_micro")
    slim = (scored.select(F.col(id_col), avg_micro)
            .join(langs.select(F.col(id_col), F.col(lang_col).alias("lang")),
                  id_col))
    # tier k's lower bound is the (1 - (k+1)/n_tiers) quantile of the
    # scores (higher score = better tier); with integer micro scores the
    # sketch returns an exact member value at this accuracy until a
    # language exceeds ~accuracy documents
    probs = [1.0 - (k + 1) / n_tiers for k in range(n_tiers - 1)]
    cuts = slim.groupBy("lang").agg(
        F.percentile_approx("avg_logp_micro", probs, accuracy)
        .alias("_cuts"))
    tier_idx = F.lit(n_tiers - 1)
    for k in range(n_tiers - 2, -1, -1):
        tier_idx = F.when(
            F.col("avg_logp_micro") >= F.element_at("_cuts", k + 1),
            F.lit(k)).otherwise(tier_idx)
    out = (slim.join(F.broadcast(cuts), "lang")
           .withColumn("tier_idx", tier_idx.cast("int")))
    if len(tier_names) == n_tiers:
        tier = None
        for i, name in enumerate(tier_names):
            case = F.when(F.col("tier_idx") == i, F.lit(name))
            tier = case if tier is None else tier.when(
                F.col("tier_idx") == i, F.lit(name))
        out = out.withColumn("tier", tier)
    else:
        out = out.withColumn(
            "tier", F.concat(F.lit("tier_"), F.col("tier_idx")))
    return out.select(id_col, "lang", "avg_logp_micro", "tier_idx", "tier")


def _padded2_arrays(text_col: str):
    """Double-<s>-padded token array (trigram padding)."""
    return F.concat(F.array(F.lit(BOS), F.lit(BOS)), _tokens(text_col))


def _grams_from(padded, n: int):
    """'w1 .. wn' string keys over a padded array via zip_with shifts."""
    size = F.size(padded)
    out = F.slice(padded, 1, size - (n - 1))
    for k in range(1, n):
        out = F.zip_with(out, F.slice(padded, 1 + k, size - (n - 1)),
                         lambda a, b: F.concat_ws(" ", a, b))
    return out


def train_trigram_lm(docs: DataFrame, text_col: str = "text"):
    """Trigram Stupid-Backoff LM (one step closer to CCNet's 5-gram
    filter, same distributed machinery as :func:`train_bigram_lm`):
    returns ``(unigrams, bigrams, trigrams, totals)`` where every n-gram
    table carries its context count (``bigrams(g2, c12, c1)`` keyed by
    'w1 w2'; ``trigrams(g3, c123, c12)`` keyed by 'w1 w2 w3'), padding
    is a double ``<s>`` so the first real token scores under the
    '<s> <s>' context, and BOS context counts equal the training
    document count."""
    padded = _padded2_arrays(text_col)

    toks = docs.select(F.explode(_tokens(text_col)).alias("w"))
    unigrams = toks.groupBy("w").agg(F.count("*").alias("c"))

    # bigram counts over the DOUBLE-padded stream: '<s> <s>' and
    # '<s> w' contexts both exist for the trigram numerators
    bi = (docs.select(F.explode(_grams_from(padded, 2)).alias("g"))
          .groupBy("g").agg(F.count("*").alias("c12")))
    tri = (docs.select(F.explode(_grams_from(padded, 3)).alias("g"))
           .groupBy("g").agg(F.count("*").alias("c123")))

    n_docs = docs.select(F.count("*").alias("n_docs"))
    w1 = F.split(F.col("g"), " ", 2).getItem(0)
    bigrams = (bi.withColumn("w1", w1)
               .join(unigrams.withColumnRenamed("w", "w1")
                     .withColumnRenamed("c", "uc"), "w1", "left")
               .crossJoin(F.broadcast(n_docs))
               .select("g", "c12",
                       F.coalesce("uc", "n_docs").alias("c1")))
    # trigram context = leading bigram; '<s> <s>' context count = n_docs
    ctx = F.concat_ws(" ", F.split(F.col("g"), " ", 3).getItem(0),
                      F.split(F.col("g"), " ", 3).getItem(1))
    trigrams = (tri.withColumn("ctx", ctx)
                .join(bi.select(F.col("g").alias("ctx"),
                                F.col("c12").alias("cc")), "ctx", "left")
                .crossJoin(F.broadcast(n_docs))
                .select("g", "c123",
                        F.coalesce("cc", "n_docs").alias("c12")))

    totals = (unigrams.agg(F.sum("c").alias("train_tokens"),
                           F.count("*").alias("vocab_size"))
              .crossJoin(F.broadcast(n_docs)))
    return unigrams, bigrams, trigrams, totals


def score_documents_trigram(docs: DataFrame, unigrams: DataFrame,
                            bigrams: DataFrame, trigrams: DataFrame,
                            totals: DataFrame, alpha: float = 0.4,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            hot_k: int = 10_000) -> DataFrame:
    """Per-document trigram Stupid-Backoff scores: for token ``w3`` with
    context ``w1 w2``: ``c123/c12``, else ``alpha * (c23/c2)``, else
    ``alpha^2 * (c(w3)+1)/(T+V+1)`` (recursive backoff — unseen mass
    decays one alpha per shortened context).  Same exact integer
    micro-unit accumulation as the bigram scorer; all three count-table
    joins run through the two-tier skew guard (``hot_k`` hottest keys
    broadcast, tail shuffled; 0 disables)."""
    padded = _padded2_arrays(text_col)
    tris = docs.select(F.col(id_col),
                       F.explode(_grams_from(padded, 3)).alias("g"))
    parts = F.split(F.col("g"), " ", 3)
    g2 = F.concat_ws(" ", parts.getItem(1), parts.getItem(2))
    w3 = parts.getItem(2)
    scored = (_two_tier_left(tris, trigrams, "g", hot_k)
              .withColumn("g2", g2))
    scored = (_two_tier_left(scored,
                             bigrams.select(F.col("g").alias("g2"),
                                            F.col("c12").alias("c23"),
                                            F.col("c1").alias("c2")),
                             "g2", hot_k)
              .withColumn("w3", w3))
    scored = (_two_tier_left(scored,
                             unigrams.withColumnRenamed("w", "w3")
                             .withColumnRenamed("c", "c3"), "w3", hot_k)
              .crossJoin(F.broadcast(totals)))
    denom = F.col("train_tokens") + F.col("vocab_size") + F.lit(1.0)
    logp = (F.when(F.col("c123").isNotNull(),
                   F.log10(F.col("c123") / F.col("c12")))
            .when(F.col("c23").isNotNull(),
                  F.log10(F.lit(alpha) * F.col("c23") / F.col("c2")))
            .when(F.col("c3").isNotNull(),
                  F.log10(F.lit(alpha * alpha) * (F.col("c3") + 1)
                          / denom))
            .otherwise(F.log10(F.lit(alpha * alpha) / denom)))
    micro = F.round(logp * 1e6).cast("long")
    per_doc = (scored.groupBy(id_col)
               .agg(F.count("*").alias("n_scored"),
                    F.sum(micro).alias("sum_logp_micro")))
    avg_micro = F.when(
        F.col("n_scored") > 0,
        F.round(F.col("sum_logp_micro") / F.col("n_scored")).cast("long")
    ).otherwise(F.lit(0))
    avg = avg_micro / 1e6
    out = (docs.select(id_col)
           .join(per_doc, id_col, "left")
           .select(id_col,
                   F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
                   F.coalesce("sum_logp_micro", F.lit(0))
                   .alias("sum_logp_micro"),
                   avg.alias("avg_logp")))
    return out.withColumn(
        "perplexity", F.round(F.pow(F.lit(10.0), -F.col("avg_logp")), 4))
