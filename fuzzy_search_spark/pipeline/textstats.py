"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All JVM-side column expressions (no Python UDFs).
"""

from __future__ import annotations

from typing import Iterator

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


def quality_exprs(text_col: str = "text"):
    """(feature columns, keep expression) for the quality gate — exposed
    as raw expressions so composite pipelines (corpus_clean) can fold them
    into one projection pass instead of re-scanning an expensive lineage
    per derived table."""
    txt = F.col(text_col)
    n = F.greatest(F.length(txt), F.lit(1))
    alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(txt, r"[^0-9]", ""))
    space = F.length(F.regexp_replace(txt, r"[^ \t\n]", ""))
    punct = F.length(txt) - alpha - digit - space
    cols = [
        F.length(txt).alias("n_chars"),
        F.round(alpha / n, 6).alias("alpha_ratio"),
        F.round(digit / n, 6).alias("digit_ratio"),
        F.round(punct / n, 6).alias("punct_ratio"),
        F.round(space / n, 6).alias("space_ratio"),
    ]
    # the gate compares the ROUNDED ratios (boundary docs at e.g.
    # alpha_ratio 0.5999996 keep their historical keep=true)
    keep = (
        (F.length(txt) >= 100)
        & (F.round(alpha / n, 6) >= 0.6)
        & (F.round(punct / n, 6) <= 0.1)
    )
    return cols, keep


def quality_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features: length, alpha ratio, punct
    ratio, whitespace ratio, plus a composite keep/drop signal."""
    cols, keep = quality_exprs(text_col)
    return df.select(F.col(id_col), *cols, keep.alias("keep"))


#: Gopher rule stopwords (Rae et al. 2021, appendix A1.1: "the, be, to,
#: of, and, that, have, with" — a doc must contain at least 2).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   max_bullet_ratio: float = 0.9,
                   max_ellipsis_ratio: float = 0.3,
                   min_alpha_ratio: float = 0.8,
                   min_stopwords: int = 2) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021 "Scaling Language
    Models: ... Gopher", appendix A1.1) — the canonical word-level
    filter every LLM data pipeline applies after the char-level one
    (:func:`quality_scores` is the char-level companion):

    word count in [50, 100k]; mean word length in [3, 10]; hash/ellipsis
    symbol-to-word ratio <= 0.1; <= 90% of lines starting with a bullet;
    <= 30% of lines ending with an ellipsis; >= 80% of words containing
    an alphabetic character; >= 2 of the 8 listed stopwords present.

    Emits one row per document with the seven measured features, the
    per-rule booleans, and the composite ``keep``.  Pure column algebra
    over one text column — a shuffle-free projection that fuses into
    the scan; regexes stay in the Java/RE2 common subset so the DuckDB
    oracle runs the same patterns."""
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    lines = F.filter(F.split(t, r"\n"),
                     lambda ln: F.length(F.trim(ln)) > 0)
    n_words = F.size(words)
    n_lines = F.size(lines)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    nl = F.greatest(n_lines, F.lit(1)).cast("double")
    mean_wl = F.round(
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)) / nw, 6)
    symbol_ratio = F.round(F.size(F.filter(
        words, lambda w: w.contains("#") | w.contains("...")
        | w.contains("…"))) / nw, 6)
    bullet_ratio = F.round(F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike("^[\\u2022\\-\\*]"))) / nl, 6)
    ellipsis_ratio = F.round(F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike("(\\.\\.\\.|\\u2026)$"))) / nl,
        6)
    alpha_ratio = F.round(F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]"))) / nw, 6)
    lower_words = F.transform(words, F.lower)
    n_stop = sum(
        (F.array_contains(lower_words, s).cast("int")
         for s in GOPHER_STOPWORDS),
        F.lit(0))
    rules = {
        "rule_word_count": (n_words >= min_words)
        & (n_words <= max_words),
        "rule_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "rule_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "rule_bullet_lines": bullet_ratio <= max_bullet_ratio,
        "rule_ellipsis_lines": ellipsis_ratio <= max_ellipsis_ratio,
        "rule_alpha_words": alpha_ratio >= min_alpha_ratio,
        "rule_stopwords": n_stop >= min_stopwords,
    }
    keep = None
    for cond in rules.values():
        keep = cond if keep is None else keep & cond
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        n_stop.alias("n_stopwords"),
        *[cond.alias(name) for name, cond in rules.items()],
        keep.alias("keep"))


def c4_filters(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               min_words_per_line: int = 5,
               min_sentences: int = 3) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020 "Exploring the
    Limits of Transfer Learning...", section 2.2): retain only lines
    that end in a terminal punctuation mark, contain at least 5 words,
    and do not contain the word "javascript"; then drop any page with
    fewer than 3 sentences, any page containing "lorem ipsum", and any
    page containing a curly brace.

    Emits ``(id, n_lines, n_lines_kept, clean_text, n_sentences,
    has_lorem_ipsum, has_curly_brace, keep)``: the line-filtered rebuild
    plus the page-level flags — callers filter on ``keep`` and swap
    ``clean_text`` in.  Sentence count is the terminal-punctuation split
    count of the KEPT text (the published heuristic counts sentences
    after line filtering).

    Pure shuffle-free column algebra over one text column; every regex
    is in the Java/RE2 common subset, so the DuckDB oracle runs the
    identical patterns."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, r"\n"),
                     lambda ln: F.length(F.trim(ln)) > 0)

    def _kept(ln):
        trimmed = F.trim(ln)
        words = F.filter(F.split(trimmed, r"\s+"),
                         lambda w: F.length(w) > 0)
        return (trimmed.rlike("[.!?\"']$")
                & (F.size(words) >= min_words_per_line)
                & ~F.lower(trimmed).contains("javascript"))

    kept = F.filter(lines, _kept)
    clean = F.array_join(kept, "\n")
    n_sentences = F.when(
        F.length(clean) == 0, F.lit(0)).otherwise(
        F.size(F.filter(F.split(clean, "[.!?]"),
                        lambda s: F.length(F.trim(s)) > 0)))
    lorem = F.lower(t).contains("lorem ipsum")
    curly = t.contains("{")
    keep = (n_sentences >= min_sentences) & ~lorem & ~curly
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        clean.alias("clean_text"),
        n_sentences.cast("int").alias("n_sentences"),
        lorem.alias("has_lorem_ipsum"),
        curly.alias("has_curly_brace"),
        keep.alias("keep"))


def language_exprs(text_col: str = "text"):
    """(vote columns, lang_guess expression) for the stopword-vote
    language heuristic, as raw expressions (see :func:`quality_exprs`)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    votes = {
        lang: F.size(F.filter(words, lambda w: w.isin(*sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = F.greatest(*votes.values())
    guess = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_STOPWORDS):
        guess = guess.when(votes[lang] == best, F.lit(lang))
    cols = [v.alias(f"votes_{lang}") for lang, v in votes.items()]
    return cols, guess


def language_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-vote language classifier: (id, lang_guess, vote counts).

    Deterministic tie-break: highest vote count, then language code order.
    """
    cols, guess = language_exprs(text_col)
    return df.select(F.col(id_col), *cols, guess.alias("lang_guess"))


def _span_grams(df: DataFrame, id_col: str, text_col: str,
                k: int) -> DataFrame:
    """(doc_id, gram) rows of all k-token word grams, built with the
    linear zip_with chain from analysis.freq (same lower + ``\\s+`` token
    stream, so the DuckDB oracle mirrors the existing ngram oracles)."""
    from fuzzy_search_spark.analysis.freq import _ngram_array

    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(_ngram_array(text_col, k, pad=False))
                  .alias("gram"))
        .filter(F.length("gram") > 0)
    )


def duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 8,
                    min_docs: int = 2) -> DataFrame:
    """Cross-document repeated substrings: every k-token span whose text
    occurs in >= ``min_docs`` distinct documents, with document and
    occurrence counts — the substring-level dedup primitive (boilerplate
    headers/footers, licence blocks, templated paragraphs) that
    document-level MinHash misses when duplicated passages sit inside
    otherwise-distinct pages.

    Scale shape: one scan -> explode k-grams (linear zip_with build) ->
    a single hash aggregation keyed by the md5-uniform 60-bit span hash
    (the gram string rides along in the key for reporting; counts stay
    HashAggregate).  countDistinct is planner-expanded with map-side
    partial aggregation, so the shuffle carries (hash, gram, doc) partials
    only for grams, never raw documents.
    """
    from fuzzy_search_spark.pipeline.dedup import _hash60

    grams = _span_grams(df, id_col, text_col, k)
    return (
        grams
        .groupBy(_hash60(F.col("gram")).alias("span_hash"), F.col("gram"))
        .agg(F.countDistinct("doc_id").alias("n_docs"),
             F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_docs") >= min_docs)
    )


def cross_doc_spans(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 8,
                    min_docs: int = 2) -> DataFrame:
    """Per-document POSITIONAL cross-corpus duplication (the ExactSubstr
    view of Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better", §4.2, re-expressed window-hash-first): every maximal
    token range of a document covered by k-token windows whose text also
    occurs in >= ``min_docs`` distinct documents, as merged (tok_start,
    tok_end) spans with the covering window count.  ``duplicate_spans``
    reports WHICH spans are corpus-duplicated; this reports WHERE they
    sit in each document, merged into maximal ranges — the output a
    surgical span-removal pass consumes.  Suffix-array ExactSubstr finds
    duplicates of any length >= k; fixed-k window hashing finds the same
    ranges whenever the duplicated run is >= k tokens (shorter runs are
    below the dedup threshold by construction), at the cost of one scan
    + two hash exchanges instead of a distributed suffix sort.

    Scale shape: scan -> posexplode k-gram windows (linear zip_with
    build) -> 60-bit md5 window keys; the flagged-window set is ONE
    hash aggregation keyed by window hash (countDistinct planner-expands
    to two-level partial aggregation, so hot boilerplate windows combine
    map-side); membership is a left-semi join on the hash (the flagged
    set is the small side — AQE broadcasts it when it fits); span
    merging is a per-document window (gaps-and-islands: a window starting
    <= k after the previous one overlaps or abuts it, runs sort only
    within each document's rows).  Token positions, not char offsets:
    identical tokenization to every other word-gram op (lower + \\s+
    split), so the DuckDB oracle mirrors the pipeline verbatim."""
    from pyspark.sql import Window

    from fuzzy_search_spark.analysis.freq import _ngram_array
    from fuzzy_search_spark.pipeline.dedup import _hash60

    # the explicit repartition is a shared-exchange barrier, not load
    # balancing: both consumers below (the flag aggregation and the
    # membership probe) need the windows hash-partitioned by span_hash,
    # and with the isNotNull predicates pinned on the barrier (the join
    # would push them into only the probe branch) the two subtrees
    # canonicalize equal, so the scan + explode materializes ONCE and the
    # second consumer is a ReusedExchange (same trick as
    # strip_duplicate_paragraphs; guarded by the plan-shape test).
    wins = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(_ngram_array(text_col, k, pad=False))
                  .alias("pos", "gram"))
        .filter(F.length("gram") > 0)
        .select("doc_id", "pos", _hash60(F.col("gram")).alias("span_hash"))
        .filter(F.col("span_hash").isNotNull() & F.col("doc_id").isNotNull())
        .repartition("span_hash")
    )
    # the `_mpos` rider aggregate keeps `pos` alive below the shared
    # exchange (column pruning would otherwise drop it from this branch
    # only and the subtrees would stop canonicalizing equal); min(), not
    # count() — count(col) is rewritten to count(1) and prunes anyway
    flagged = (
        wins.groupBy("span_hash")
        .agg(F.countDistinct("doc_id").alias("_nd"),
             F.min("pos").alias("_mpos"))
        .filter((F.col("_nd") >= min_docs) & (F.col("_mpos") >= 0))
        .select("span_hash", F.lit(1).alias("_dup"))
    )
    # left join + flag filter rather than leftsemi: flagged is unique per
    # span_hash (no row multiplication), and the outer join keeps the
    # probe branch consuming the SAME repartition exchange (EnsureRequirements
    # replaces a user repartition under a semi-join, breaking the reuse)
    dup = (wins.join(flagged, "span_hash", "left")
           .filter(F.col("_dup").isNotNull())
           .select("doc_id", "pos"))
    byq = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        dup.withColumn("_prev", F.lag("pos").over(byq))
        .withColumn("_new",
                    F.when(F.col("_prev").isNull()
                           | (F.col("pos") - F.col("_prev") > k),
                           F.lit(1)).otherwise(F.lit(0)))
        .withColumn("_isl", F.sum("_new").over(byq))
    )
    return (
        isl.groupBy("doc_id", "_isl")
        .agg(F.min("pos").alias("_start"), F.max("pos").alias("_maxpos"),
             F.count(F.lit(1)).alias("_nw"))
        .select("doc_id",
                F.col("_start").cast("long").alias("tok_start"),
                (F.col("_maxpos") + k).cast("long").alias("tok_end"),
                F.col("_nw").cast("long").alias("n_windows"))
    )


def strip_cross_doc_spans(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 8,
                          min_docs: int = 2) -> DataFrame:
    """Apply :func:`cross_doc_spans` as a TRANSFORMATION: drop every token
    covered by a cross-corpus duplicated k-token window and reassemble
    the remainder in order — the ExactSubstr removal pass itself (Lee et
    al. 2021 cut the duplicated substring out of the training text rather
    than dropping the document; this is that surgical cut, token-aligned).

    Returns (doc_id, n_tokens, n_removed, clean_text) for EVERY input
    row.  ``clean_text`` is whitespace-normalized (tokens rejoined with
    single spaces) for all rows, touched or not, so output text is
    uniformly normalized — same contract DuckDB can mirror exactly.

    Scale shape: the span side is :func:`cross_doc_spans` rolled up to a
    per-doc span array (bounded by document size); the apply side joins
    it back doc-keyed and drops covered tokens with a higher-order
    filter-by-index over the word array — pure JVM column algebra, no
    explode and no Python on the rebuild.  The corpus is scanned twice
    (detect + apply), the inherent diamond of self-referential cleanup;
    at production scale persist/checkpoint the span table between the
    two passes."""
    spans = cross_doc_spans(df, id_col, text_col, k=k, min_docs=min_docs)
    span_arrays = (
        spans.groupBy("doc_id")
        .agg(F.collect_list(F.struct("tok_start", "tok_end"))
             .alias("_spans"))
    )
    words = F.split(F.col(text_col), r"\s+")
    joined = (
        df.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
        .join(span_arrays, "doc_id", "left")
        .withColumn("_spans", F.coalesce(F.col("_spans"), F.array()))
    )
    # NB the two-parameter higher-order lambda receives the array INDEX
    # as its second argument — here that convention is load-bearing.
    kept = F.filter(
        F.col("_w"),
        lambda w, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["tok_start"]) & (i < s["tok_end"])))
    return joined.select(
        "doc_id",
        F.size("_w").cast("long").alias("n_tokens"),
        (F.size("_w") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def boilerplate_ratio(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 8,
                      min_docs: int = 2) -> DataFrame:
    """Per-document boilerplate exposure: of the document's k-token spans,
    how many also appear in >= ``min_docs`` distinct documents (itself
    included), as a count and ratio.  The standard gate for "mostly
    templated page" in a training-data cleanup pass.

    Scale shape: the exploded gram stream is first rolled up to distinct
    (doc, span_hash) pairs with occurrence weights — ONE exchange whose
    subtree both branches share at runtime (AQE ReusedExchange), so the
    corpus is scanned and exploded exactly once and every later shuffle
    carries pair rows, never raw occurrences.  The duplicated-span set is
    then a pair-count hash-agg (count == countDistinct by construction),
    the membership probe a span-keyed join, and the finish a per-doc
    hash-agg over numeric keys.
    """
    from fuzzy_search_spark.pipeline.dedup import _hash60

    # The two always-true predicates below are exchange-alignment pins,
    # not semantics: the join would push isnotnull(span_hash) into only
    # the build branch, and column pruning would drop the count buffer
    # from only the dup branch — either divergence makes the two copies
    # of the pair-aggregation subtree non-identical, so AQE cannot reuse
    # the exchange and the corpus explode runs twice.  With them pinned
    # on both branches the subtrees canonicalize equal and the explode
    # materializes once (guarded by test_dup_span_ops_hash_aggregate_only).
    pairs = (
        _span_grams(df, id_col, text_col, k)
        .groupBy("doc_id", _hash60(F.col("gram")).alias("span_hash"))
        .agg(F.count(F.lit(1)).alias("_n_occ"))
        .filter(F.col("span_hash").isNotNull())
    )
    dup = (pairs.filter(F.col("_n_occ") >= 1)
           .groupBy("span_hash")
           .agg(F.count(F.lit(1)).alias("_nd"))
           .filter(F.col("_nd") >= min_docs)
           .select("span_hash", F.lit(1).alias("_dup")))
    return (
        pairs.join(dup, "span_hash", "left")
        .groupBy("doc_id")
        .agg(F.sum("_n_occ").alias("n_spans"),
             F.sum(F.when(F.col("_dup").isNotNull(), F.col("_n_occ"))
                   .otherwise(F.lit(0))).alias("n_dup_spans"))
        .withColumn("dup_ratio", F.round(
            F.col("n_dup_spans") / F.greatest(F.col("n_spans"), F.lit(1)), 6))
    )


#: GPT-2-style pre-tokenizer, restricted to the Java/RE2-shared ASCII
#: subset (contractions first — alternation is leftmost-first in both
#: engines — then space-prefixed letter runs, digit runs, punctuation
#: runs).  The byte-level original uses \p{L}/\p{N}; ASCII classes keep
#: the DuckDB oracle byte-identical.
SUBWORD_TOKEN_RE = r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def regex_token_stats(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """BPE-ish regex token counting: whitespace word count, GPT-2-style
    pre-token count, and their ratio (pre-tokens per word — >1 when
    punctuation/contractions/digits split off).  Pure column algebra, no
    shuffle; fuses into the scan."""
    txt = F.col(text_col)
    words = F.split(txt, r"\s+")
    pre = F.regexp_extract_all(txt, F.lit(SUBWORD_TOKEN_RE), F.lit(0))
    return df.select(
        F.col(id_col),
        F.size(words).alias("n_ws_tokens"),
        F.size(pre).alias("n_subword_tokens"),
        F.round(F.size(pre) / F.greatest(F.size(words), F.lit(1)), 6)
        .alias("subword_ratio"),
    )


def repetition_signals(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       top_orders=(2, 3), dup_orders=(5, 10)) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", table A1 — the repetition-filter family):
    for each ``n`` in ``top_orders`` the fraction of n-gram positions
    occupied by the single most frequent n-gram (``top{n}_frac``), and for
    each ``n`` in ``dup_orders`` the fraction of n-gram positions whose
    gram occurs more than once in the document (``dup{n}_frac``).  High
    values flag templated/spammy pages that document-level dedup keeps.

    Token stream matches the word-ngram operators (lower + ``\\s+``), so
    the DuckDB oracle mirrors the existing freq CTEs.  Scale shape: ONE
    scan (all orders' gram arrays tag their order inline and explode from
    the same projection), then two hash aggregations — (doc, n, gram-hash)
    counts with map-side partials, then a per-doc conditional rollup over
    numeric keys.  Nothing is per-document-global except the per-doc
    groups themselves; no windows, no driver collection.
    """
    from fuzzy_search_spark.analysis.freq import _ngram_array
    from fuzzy_search_spark.pipeline.dedup import _hash60

    orders = sorted(set(top_orders) | set(dup_orders))

    def _tag(order: int):
        return lambda g: F.struct(F.lit(order).alias("n"), g.alias("gram"))

    arrays = [F.transform(_ngram_array(text_col, n, pad=False), _tag(n))
              for n in orders]
    tagged = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
    counts = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tagged).alias("t"))
        .select("doc_id", "t.n", "t.gram")
        .filter(F.length("gram") > 0)
        .groupBy("doc_id", "n", _hash60(F.col("gram")).alias("gh"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        *[F.sum(F.when(F.col("n") == n, F.col("c"))).alias(f"_g{n}")
          for n in orders],
        *[F.max(F.when(F.col("n") == n, F.col("c"))).alias(f"_m{n}")
          for n in top_orders],
        *[F.sum(F.when((F.col("n") == n) & (F.col("c") > 1), F.col("c")))
          .alias(f"_d{n}") for n in dup_orders],
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.lower(F.col(text_col)), r"\s+")).alias("n_tokens"))
    out = base.join(per_doc, "doc_id", "left")
    cols = [F.col("doc_id"), F.col("n_tokens")]
    for n in top_orders:
        cols.append(F.round(F.coalesce(
            F.col(f"_m{n}") / F.col(f"_g{n}"), F.lit(0.0)), 6)
            .alias(f"top{n}_frac"))
    for n in dup_orders:
        cols.append(F.round(F.coalesce(
            F.col(f"_d{n}") / F.col(f"_g{n}"), F.lit(0.0)), 6)
            .alias(f"dup{n}_frac"))
    return out.select(*cols)


def decontaminate(df: DataFrame, bench_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 8) -> DataFrame:
    """Benchmark decontamination scan: flag every training document that
    shares at least one k-token word gram with a (small) benchmark/eval
    corpus — the standard pre-training hygiene pass that keeps test-set
    passages out of the training mix.

    Returns (doc_id, n_bench_spans, contaminated) for EVERY document of
    ``df``: ``n_bench_spans`` counts the distinct contaminated spans.

    Scale shape: benchmark suites are tiny relative to a 100-TB corpus, so
    the distinct benchmark span-hash set is broadcast and the probe is a
    map-side hash join against the exploded corpus grams — the corpus is
    scanned once and never shuffled on gram keys; the only exchange is the
    per-doc count rollup (doc-keyed, map-side partials).
    """
    from fuzzy_search_spark.pipeline.dedup import _hash60

    bench = (_span_grams(bench_df, id_col, text_col, k)
             .select(_hash60(F.col("gram")).alias("span_hash"))
             .distinct())
    grams = (_span_grams(df, id_col, text_col, k)
             .select("doc_id", _hash60(F.col("gram")).alias("span_hash"))
             .distinct())
    hits = (grams.join(F.broadcast(bench), "span_hash")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bench_spans")))
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bench_spans", F.lit(0)).alias("n_bench_spans"),
        (F.coalesce("n_bench_spans", F.lit(0)) > 0).alias("contaminated"))


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


def strip_duplicate_paragraphs(df: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text", sep: str = "\n\n",
                               min_docs: int = 2) -> DataFrame:
    """Cross-document paragraph dedup as a TRANSFORMATION: remove every
    paragraph whose exact text occurs in >= ``min_docs`` distinct
    documents and reassemble the remainder in order — the
    RefinedWeb/C4-style line- or paragraph-level cleanup that strips
    navigation chrome, cookie banners and licence blocks while keeping
    the unique prose around them.  ``sep`` is the paragraph delimiter
    (use ``"\\n"`` for line-level dedup).

    Returns (doc_id, n_paras, n_kept, clean_text) for EVERY input row;
    documents whose paragraphs are all removed keep an empty
    ``clean_text``.

    Scale shape: one scan -> posexplode paragraphs -> md5 span hash ->
    an explicit ``repartition(phash)`` barrier whose exchange BOTH
    consumers (the duplicated-paragraph aggregation and the keep join)
    reuse at runtime, so the corpus explodes exactly once; the rebuild is
    a per-doc hash-agg (collect_list is bounded by single-document size).
    The `_mpos`/`_mlen` rider aggregates and the always-true filter arms
    consuming them are exchange-alignment pins, not semantics: without
    them Catalyst prunes pos/para below the shared exchange in only one
    branch and the subtrees stop canonicalizing equal (same trick as
    :func:`boilerplate_ratio`, guarded by the plan-shape test).
    """
    import re as _re

    from fuzzy_search_spark.pipeline.dedup import _hash60

    paras = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1))
                  .alias("pos", "para"))
        .filter(F.length("para") > 0)
        .withColumn("phash", _hash60(F.col("para")))
        # isNotNull pins (incl. doc_id, which the totality left-join at
        # the end would otherwise push into just one branch) — see the
        # exchange-alignment note above
        .filter(F.col("phash").isNotNull() & F.col("doc_id").isNotNull())
        .repartition("phash")
    )
    dup = (paras.groupBy("phash")
           .agg(F.countDistinct("doc_id").alias("_nd"),
                F.min("pos").alias("_mpos"),
                F.min(F.length("para")).alias("_mlen"))
           .filter((F.col("_nd") >= min_docs)
                   & (F.col("_mpos") >= 0) & (F.col("_mlen") >= 1))
           .select("phash", F.lit(1).alias("_dup")))
    keep_struct = F.when(F.col("_dup").isNull(), F.struct("pos", "para"))
    rebuilt = (
        paras.join(dup, "phash", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_paras"),
             F.sum(F.when(F.col("_dup").isNull(), 1).otherwise(0))
             .alias("n_kept"),
             F.array_join(
                 F.transform(F.array_sort(F.collect_list(keep_struct)),
                             lambda s: s["para"]),
                 sep).alias("clean_text"))
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"))


def fix_mojibake(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Detect and repair the dominant web mojibake class: UTF-8 bytes that
    were decoded once as Latin-1 ("café" -> "cafÃ©"), the ftfy core
    heuristic.  A string is repaired iff (a) every char is <= U+00FF (so
    a single Latin-1 re-encode is lossless and cannot throw under Spark
    4's strict codecs), (b) the re-encoded bytes are VALID UTF-8
    (``is_valid_utf8``), and (c) decoding them changes — and therefore
    strictly shortens — the string.  Genuine Latin-1 text ("naïve") fails
    (b) and passes through untouched; text with chars beyond Latin-1
    fails (a).  Pure column algebra, one projection, no shuffle.

    Returns ``(id, was_mojibake, text_fixed)``."""
    t = F.col(text_col)
    latin1_only = t.rlike("^[\\x00-\\u00FF]*$")
    lat = F.encode(t, "ISO-8859-1")
    cand = F.when(latin1_only,
                  F.when(F.expr(f"is_valid_utf8(encode({text_col}, "
                                "'ISO-8859-1'))"),
                         F.decode(lat, "UTF-8")).otherwise(t)
                  ).otherwise(t)
    fixed = F.when((cand != t) & (F.length(cand) < F.length(t)), cand) \
        .otherwise(t)
    return df.select(
        F.col(id_col),
        # coalesce: (fixed != t) null-propagates for NULL text, and a
        # NULL flag would silently drop those rows from filter(~flag).
        F.coalesce(fixed != t, F.lit(False)).alias("was_mojibake"),
        fixed.alias("text_fixed"))


def normalize_nfc(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Unicode NFC normalization — the canonical-equivalence collapse
    every hash-keyed stage (exact dedup, paragraph dedup, URL keys,
    decontamination) needs: "café" composed and "cafe" + U+0301 are the
    same text but different bytes, so without NFC they hash apart and
    duplicates survive.

    Spark has no built-in Unicode-normalization expression, so this is an
    Arrow-batched mapInPandas over ``unicodedata`` (the one stdlib NFC);
    it stays a narrow map — no shuffle — and the per-row cost is a table
    lookup pass.  Returns ``(id, changed, text_nfc)``; ``changed`` makes
    the op auditable (fraction of non-NFC docs is a corpus-quality
    signal).  DuckDB's ``nfc_normalize`` implements the same Unicode
    algorithm, so the driver oracle checks real normalization output,
    not a synthetic stand-in."""
    import unicodedata

    import pandas as pd

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            texts = pdf[text_col]
            nfc = texts.map(
                lambda s: unicodedata.normalize("NFC", s)
                if s is not None else None)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "changed": nfc.ne(texts) & texts.notna(),
                "text_nfc": nfc,
            })

    # schema follows the caller's id column (name AND type) instead of
    # hardcoding doc_id/long, which silently renamed + cast foreign ids.
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, changed boolean, text_nfc string"
    return df.select(id_col, text_col).mapInPandas(process, schema)


def corpus_profile(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   lang_col: str = "lang") -> DataFrame:
    """One-row corpus profile — the dashboard numbers a pipeline logs per
    snapshot: document count, token totals, exact length quantiles
    (interpolated ``percentile``, identical semantics to SQL
    ``quantile_cont``), distinct languages and the majority-language
    share.  One scan, two hash aggregations (per-doc token counts fold
    into the global aggregate map-side); no window, no collect.  The
    majority-language argmax is a struct max — Spark plans it
    sort-based, but only over the per-language count rows the
    HashAggregate already reduced to (same shape as anchor_text_index's
    min_by)."""
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"\w+"), 0)
    per_doc = df.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.col(lang_col))
    top_lang = (per_doc.groupBy(lang_col).count()
                .agg(F.max(F.struct(F.col("count"), F.col(lang_col)))
                     .alias("m"))
                .select(F.col("m.count").alias("top_lang_docs"),
                        F.col("m." + lang_col).alias("top_lang")))
    agg = per_doc.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
        F.expr("percentile(n_tokens, 0.5)").alias("p50_tokens"),
        F.expr("percentile(n_tokens, 0.9)").alias("p90_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct(lang_col).alias("n_langs"))
    out = agg.crossJoin(F.broadcast(top_lang))
    return out.select(
        "docs", "total_tokens", "mean_tokens", "p50_tokens", "p90_tokens",
        "total_chars", "n_langs", "top_lang",
        F.round(F.col("top_lang_docs") / F.col("docs"), 6)
        .alias("top_lang_share"))


def host_quality_rollup(df: DataFrame, host_col: str = "host",
                        keep_col: str = "keep", id_col: str = "doc_id",
                        min_host_docs: int = 1,
                        keep_rate_num: int = 1,
                        keep_rate_den: int = 2) -> DataFrame:
    """Site-level quality gate (the CCNet/RefinedWeb-style aggregation
    step applied after a per-document filter such as
    :func:`gopher_quality`): per-host document and kept-document counts,
    and a ``host_keep`` flag set when the host has at least
    ``min_host_docs`` documents AND its keep rate reaches
    ``keep_rate_num / keep_rate_den`` — joined back onto every document.
    Spam/boilerplate farms fail per-document filters in bulk, so the
    host-level rate is the cheap signal that drops the whole site.

    The rate test is the integer cross-multiplication
    ``host_kept * den >= host_docs * num`` — no float rate ever exists,
    so the result is exactly hash-comparable cross-engine.

    Scale shape: one hash aggregation keyed by host (hosts << documents,
    near-uniform across the web) and a join back on the same key whose
    build side is one row per host — broadcast-eligible at any corpus
    size where the host set fits an executor (10^8 hosts x ~40 bytes is
    the realistic web upper bound; beyond that AQE falls back to a
    sort-merge join on an unskewed key).  No window functions.
    """
    stats = (df.groupBy(host_col)
             .agg(F.count(F.lit(1)).alias("host_docs"),
                  F.sum(F.col(keep_col).cast("long")).alias("host_kept")))
    flag = ((F.col("host_docs") >= F.lit(int(min_host_docs))) &
            (F.col("host_kept") * F.lit(int(keep_rate_den)) >=
             F.col("host_docs") * F.lit(int(keep_rate_num))))
    return (df.join(stats, host_col)
            .select(F.col(id_col), F.col(host_col),
                    F.col("host_docs").cast("long").alias("host_docs"),
                    F.col("host_kept").cast("long").alias("host_kept"),
                    flag.alias("host_keep")))
