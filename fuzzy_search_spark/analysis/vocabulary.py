"""Vocabulary: bidirectional term <-> integer-id mapping.

Reference surface: ``fuzzy_search/tokenization/vocabulary.py:8-125`` — a
driver-side dict pair (term_id / id_term) with insertion-order ids, plus
``add_terms`` / ``has_term`` / ``term2id`` / ``id2term``.

Two layers here:

* :class:`Vocabulary` — the drop-in driver-side object with the reference's
  exact API (insertion-order ids, optional ignorecase, Token-aware input).
* :func:`vocabulary_table` — the distributed build: a DataFrame of
  ``(term_id, term, freq)`` with deterministic dense ids in lexicographic
  term order.  Insertion order is not reproducible in a distributed scan,
  so lexicographic rank is the stable id scheme (documented divergence; the
  mapping is still bijective, which is all the reference's callers need).

Scale note: dense global ranks are assigned via prefix buckets — a
window PARTITIONED by the term's leading characters plus a running-sum
offset over the tiny per-bucket-count table — instead of a
``Window.orderBy`` with no partition key, which would funnel every
distinct term of a web corpus through ONE task.  All JVM-side (no RDD /
Python pass), deterministic, single shuffle over the terms.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Union

from pyspark.sql import DataFrame, functions as F

try:  # TokenSpan is the repo's Token analog; accept it like the reference
    from fuzzy_search_spark.kernels.tokenize import TokenSpan
except ImportError:  # pragma: no cover
    TokenSpan = None  # type: ignore[assignment]

TermLike = Union[str, "TokenSpan"]


def _term_str(term: TermLike) -> str:
    """A term may be a str, the repo's TokenSpan, or any reference-style
    Token object exposing ``.n`` / ``.normalised_string`` (token.py:147)."""
    if isinstance(term, str):
        return term
    if TokenSpan is not None and isinstance(term, TokenSpan):
        return term.normalized
    for attr in ("n", "normalised_string", "normalized", "string"):
        val = getattr(term, attr, None)
        if isinstance(val, str):
            return val
    raise TypeError(f"cannot read a term string from {type(term)!r}")


class Vocabulary:
    """Driver-side bidirectional term map (reference vocabulary.py:8-125).

    Ids are assigned in first-seen order starting at 0, exactly like the
    reference; ``ignorecase`` lowercases on both add and lookup.
    """

    def __init__(self, terms: Optional[Iterable[TermLike]] = None,
                 ignorecase: bool = False):
        self.term_id: dict = {}
        self.id_term: dict = {}
        self.term_freq: dict = {}
        self.ignorecase = ignorecase
        if terms is not None:
            self.add_terms(list(terms))

    def __repr__(self):
        return f'{self.__class__.__name__}(vocabulary_size="{len(self.term_id)}")'

    def __len__(self):
        return len(self.term_id)

    def __contains__(self, item):
        return self.has_term(item)

    def __iter__(self):
        yield from self.term_id

    def reset_index(self):
        self.term_id = {}
        self.id_term = {}
        self.term_freq = {}

    def add_terms(self, terms: Union[TermLike, List[TermLike]],
                  reset_index: bool = False):
        if reset_index:
            self.reset_index()
        if isinstance(terms, str) or (
                TokenSpan is not None and isinstance(terms, TokenSpan)):
            terms = [terms]
        for term in terms:
            s = _term_str(term)
            s = s.lower() if self.ignorecase else s
            if s not in self.term_id:
                tid = len(self.term_id)
                self.term_id[s] = tid
                self.id_term[tid] = s

    def has_term(self, term: TermLike, ignorecase: Optional[bool] = None) -> bool:
        if ignorecase is None:
            ignorecase = self.ignorecase
        s = _term_str(term)
        s = s.lower() if ignorecase else s
        return s in self.term_id

    def term2id(self, term: TermLike) -> Optional[int]:
        s = _term_str(term)
        return self.term_id.get(s)

    def id2term(self, term_id: int) -> Optional[str]:
        return self.id_term.get(term_id)


def term_frequencies(df: DataFrame, text_col: str = "text",
                     lowercase: bool = True,
                     split_pattern: str = r"\s+") -> DataFrame:
    """Distributed term histogram: one explode + one hash aggregation."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.explode(F.split(col, split_pattern)).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    )


def vocabulary_table(df: DataFrame, text_col: str = "text",
                     lowercase: bool = True,
                     prefix_len: int = 2) -> DataFrame:
    """``(term_id, term, freq)`` with dense lexicographic ids, scale-safe
    and fully JVM-side.

    Dense global ranks WITHOUT a partition-less window and WITHOUT an RDD
    pass (zipWithIndex drags every row through Python pickling): terms are
    bucketed by their ``prefix_len``-char prefix — prefix order is
    consistent with term order, so global rank = bucket offset + rank
    within bucket.  Local ranks use a window PARTITIONED by bucket
    (parallel); bucket offsets come from a running sum over the tiny
    (bucket, count) table — the only single-task window touches one row
    per distinct prefix, never the vocabulary itself.  Deterministic by
    construction (no sampled range boundaries), so the two branches can
    recompute safely inside one DAG.
    """
    from pyspark.sql import Window

    terms = term_frequencies(df, text_col=text_col, lowercase=lowercase)
    bucketed = terms.withColumn("_bkt", F.substring("term", 1, prefix_len))
    local = F.row_number().over(
        Window.partitionBy("_bkt").orderBy("term"))
    offsets = (
        bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(
            Window.orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
        .select("_bkt", "_off")
    )
    return (
        bucketed.withColumn("_local", local)
        .join(F.broadcast(offsets), "_bkt")
        .select((F.col("_off") + F.col("_local") - 1).alias("term_id"),
                "term", "freq")
    )


def vocabulary_from_df(df: DataFrame, text_col: str = "text",
                       lowercase: bool = True) -> Vocabulary:
    """Collect a :func:`vocabulary_table` into a driver-side
    :class:`Vocabulary` (ids preserved: insertion in term_id order)."""
    rows = vocabulary_table(df, text_col=text_col,
                            lowercase=lowercase).orderBy("term_id").collect()
    vocab = Vocabulary(ignorecase=lowercase)
    for r in rows:
        vocab.term_id[r["term"]] = int(r["term_id"])
        vocab.id_term[int(r["term_id"])] = r["term"]
        vocab.term_freq[r["term"]] = int(r["freq"])
    return vocab
