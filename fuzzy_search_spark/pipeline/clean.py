"""The composite corpus-cleaning chain a training-data pipeline runs
before tokenization: exact dedup -> near-dup group dedup -> quality gate
-> optional language filter.

One call wires the repo's first-class ops end to end (dedup.py,
textstats.py); each stage's scale shape is documented at its definition.
The output is the KEPT documents — the canonical representative of every
content cluster that also clears the quality/language gates.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzy_search_spark.pipeline.dedup import near_dup_groups
from fuzzy_search_spark.pipeline.textstats import language_exprs, quality_exprs


def corpus_clean(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 languages: Optional[Sequence[str]] = None,
                 near_dup_threshold: float = 0.5,
                 representative: str = "min_id") -> DataFrame:
    """Kept documents after the full cleaning chain:
    ``(doc_id, lang_guess, n_chars)``.

    Stages:

    1. exact dedup — one hash aggregation on md5(text) (smallest id
       kept; exact dups are byte-identical, so quality cannot differ);
    2. near-dup dedup — MinHash-LSH candidates, exact-Jaccard verify,
       connected components; every non-representative group member drops
       (a left-anti join against the dropped set, so the non-duplicate
       majority streams through untouched).  ``representative`` picks
       the survivor: ``"min_id"`` (default, deterministic and cheapest)
       or ``"best_quality"`` (the :func:`best_representatives` argmax —
       the cleanest member wins, one extra doc-keyed join + per-group
       struct-max aggregation over group members only);
    3. quality gate — length / alpha-ratio / punct-ratio thresholds
       (textstats.quality_scores ``keep``);
    4. optional language filter on the stopword-vote guess.
    """
    if representative not in ("min_id", "best_quality"):
        raise ValueError(f"unknown representative mode: {representative}")
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    keep_exact = hashed.groupBy("_h").agg(F.min(id_col).alias(id_col)) \
        .select(id_col)
    base = df.join(keep_exact, id_col, "left_semi")
    groups = near_dup_groups(df, id_col=id_col, text_col=text_col,
                             threshold=near_dup_threshold)
    if representative == "best_quality":
        reps = best_representatives(df, id_col=id_col, text_col=text_col,
                                    groups=groups)
        nd_dropped = (
            groups.join(reps.select("group_id", "keep_id"), "group_id")
            .filter(F.col(id_col) != F.col("keep_id"))
            .select(id_col)
        )
    else:
        nd_dropped = (
            groups
            .filter(F.col("group_id") != F.col(id_col))
            .select(id_col)
        )
    base = base.join(nd_dropped, id_col, "left_anti")
    # quality + language are both row-local projections of text: fold them
    # into ONE pass over `base` (whose lineage carries the whole LSH +
    # Jaccard anti-join) instead of scanning that subtree once per branch
    # and re-joining — one evaluation of the dedup chain, zero extra joins
    qcols, keep = quality_exprs(text_col)
    _lang_cols, guess = language_exprs(text_col)
    out = (
        base.select(F.col(id_col), qcols[0], keep.alias("keep"),
                    guess.alias("lang_guess"))
        .filter(F.col("keep"))
    )
    if languages:
        out = out.filter(F.col("lang_guess").isin(*list(languages)))
    return out.select(id_col, "lang_guess", "n_chars")


def best_representatives(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         near_dup_threshold: float = 0.5,
                         groups: Optional[DataFrame] = None) -> DataFrame:
    """Quality-aware canonical selection for near-dup groups: instead of
    the smallest id, keep the member with the best quality signal —
    ``score = round(alpha_ratio - punct_ratio, 6)`` (textstats features),
    ties broken by longer text, then smaller id.  The practical upgrade
    over min-id retention: OCR/boilerplate-laden variants of a page lose
    to their cleanest copy, which measurably improves what survives
    dedup in a training mix.

    Returns one row per near-dup group:
    ``(group_id, keep_id, n_members, best_score)``.  Pass a precomputed
    ``groups`` table (near_dup_groups output) to share the dedup subtree
    with a surrounding pipeline instead of recomputing it.

    Scale shape: the group table joins the (row-local) quality
    projection doc-keyed, then ONE hash aggregation per group computes
    the argmax via ``max_by`` over the UNIQUE lexicographic key
    (score, n_chars, -id) — unique => deterministic despite max_by's
    any-of-ties contract — in a constant-size buffer.  Spark plans
    struct-keyed max_by sort-based, but its input is the group table
    (near-dup members only, a sliver of the corpus) and partial
    aggregation emits one row per group per task; no window over group
    members (template clusters can be huge), no second pass, no driver
    collection.
    """
    from fuzzy_search_spark.pipeline.dedup import near_dup_groups
    from fuzzy_search_spark.pipeline.textstats import quality_scores

    if groups is None:
        groups = near_dup_groups(df, id_col=id_col, text_col=text_col,
                                 threshold=near_dup_threshold)
    quality = quality_scores(df, id_col=id_col, text_col=text_col).select(
        F.col(id_col),
        F.round(F.col("alpha_ratio") - F.col("punct_ratio"), 6)
        .alias("_score"),
        F.col("n_chars").alias("_nc"))
    scored = groups.join(quality, id_col)
    return (
        scored.groupBy("group_id")
        .agg(F.count(F.lit(1)).alias("n_members"),
             F.max_by(
                 F.struct(F.col(id_col).alias("kid"),
                          F.col("_score").alias("s")),
                 F.struct(F.col("_score").alias("s"),
                          F.col("_nc").alias("nc"),
                          (-F.col(id_col)).alias("nid"))).alias("_b"))
        .select("group_id",
                F.col("_b.kid").cast("long").alias("keep_id"),
                "n_members",
                F.col("_b.s").alias("best_score"))
    )
