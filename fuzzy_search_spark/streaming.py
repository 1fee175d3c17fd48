"""Structured Streaming variant of the extraction+match pipeline.

The per-document matcher is stateless, so the streaming job is the batch
plan under `readStream`/`writeStream`: file-source discovery of new page
shards, the same broadcast-model mapInPandas, checkpointed exactly-once
sink.  `availableNow` turns it into an incremental batch (catch-up) run —
the streaming-native complement to the manifest-based group resume in
spark/job.py.  Late data needs no watermark: matching is per-row.  A
windowed per-source match-rate aggregation is included as the stateful
monitoring stream.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_search_spark.model import CompiledModel
from fuzzy_search_spark.spark.job import match_documents

WEB_PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
                 "text string, lang string")


def stream_matches(spark: SparkSession, input_dir: str, model: CompiledModel,
                   output_dir: str, checkpoint_dir: str,
                   available_now: bool = True,
                   trigger_seconds: Optional[int] = None):
    """Continuously (or catch-up) match newly arriving page shards.

    Returns the started StreamingQuery; callers own awaitTermination."""
    pages = (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    matches = match_documents(pages, model, html_col="html")
    writer = (
        matches.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def stream_match_rates(spark: SparkSession, matches_stream: DataFrame,
                       window_seconds: int = 60) -> DataFrame:
    """Stateful monitoring aggregation: matches per phrase per event-time
    window (requires an event-time column named `warc_ts` upstream)."""
    return (
        matches_stream
        .withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", f"{window_seconds} seconds"), "phrase")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
