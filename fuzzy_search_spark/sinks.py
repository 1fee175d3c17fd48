"""Match output sinks: PhraseMatch-JSON and W3C Web Annotation shapes.

The reference serializes matches as JSON dicts (match/phrase_match.py:
133-152) and as W3C Web Annotations (239-297).  Both are derived columns
here — `to_json(struct(...))` over the matches table, no UDFs.  The
reference's `uuid4` id and wall-clock `created` timestamp are
non-deterministic; for resumable pipelines we derive the id from a stable
hash of (url, phrase, offset, end) and take `created` from the source
`warc_ts` when available (documented divergence)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stable_match_id(url=F.col("url"), phrase=F.col("phrase"),
                    offset=F.col("offset"), end=F.col("end")):
    return F.md5(F.concat_ws("|", url, phrase,
                             offset.cast("string"), end.cast("string")))


def to_match_json(matches_df: DataFrame) -> DataFrame:
    """PhraseMatch.json() shape as a JSON string column."""
    payload = F.struct(
        F.lit("PhraseMatch").alias("type"),
        F.col("phrase"),
        F.col("variant"),
        F.col("string"),
        F.col("offset"),
        F.col("label"),
        F.col("ignorecase"),
        F.col("url").alias("text_id"),
        F.struct(
            F.col("char_match"),
            F.col("ngram_match"),
            F.col("levenshtein_similarity"),
        ).alias("match_scores"),
    )
    return matches_df.select(
        "url", "offset", F.to_json(payload).alias("match_json"))


def to_web_annotations(matches_df: DataFrame,
                       created_col: str = None) -> DataFrame:
    """W3C Web Annotation per match (reference as_web_anno,
    phrase_match.py:239-297): TextPositionSelector + TextQuoteSelector."""
    created = (F.col(created_col) if created_col
               else F.lit("1970-01-01T00:00:00Z"))
    anno = F.struct(
        F.lit("http://www.w3.org/ns/anno.jsonld").alias("@context"),
        stable_match_id().alias("id"),
        F.lit("Annotation").alias("type"),
        F.lit("classifying").alias("motivation"),
        created.cast("string").alias("created"),
        F.struct(
            F.col("url").alias("source"),
            F.array(
                F.struct(
                    F.lit("TextPositionSelector").alias("type"),
                    F.col("offset").alias("start"),
                    F.col("end").alias("end"),
                ),
            ).alias("selector"),
        ).alias("target"),
        F.struct(
            F.col("phrase").alias("value"),
            F.lit("Dataset").alias("type"),
            F.col("string").alias("exact"),
        ).alias("body"),
    )
    return matches_df.select(
        "url", "offset", F.to_json(anno).alias("annotation"))
