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


EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def stream_sessionize(events_stream: DataFrame,
                      gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with an
    inactivity gap, via applyInPandasWithState (arbitrary per-key state).

    State per user = (last event epoch, session count, event count); each
    micro-batch folds its (ts-sorted) events into the state and emits the
    user's running totals.  With a single availableNow batch this equals
    the batch window-function sessionization (q_events_sessions), which is
    the equivalence the test suite pins.

    At scale: state lives in the state store keyed by user_id — the
    shuffle key — so each micro-batch shuffles only its new events, never
    the history; session history length never affects memory (three
    numbers per user)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        for ts in rows["ts"]:
            t = ts.timestamp()
            if last_ts is None or t - last_ts > gap_seconds:
                n_sessions += 1
            last_ts = t
            n_events += 1
        state.update((float(last_ts), int(n_sessions), int(n_events)))
        yield pd.DataFrame({"user_id": [user_id],
                            "n_sessions": [n_sessions],
                            "n_events": [n_events]})

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType="user_id long, n_sessions int, n_events long",
        stateStructType="last_ts double, n_sessions int, n_events long",
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(pages_stream: DataFrame, ts_col: str = "warc_ts",
                 text_col: str = "text", watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup: keep the first arrival of each content hash
    within the watermark horizon (recrawls and mirror fetches of the same
    page body are dropped before the expensive match stage).

    Shape: content hash (md5 of the text — cheap, JVM-side) +
    ``dropDuplicatesWithinWatermark``, so the dedup state store evicts
    hashes once the watermark passes them — bounded state at web scale,
    unlike an unwatermarked dropDuplicates whose state grows forever.
    Exactness is within the horizon by design: a recrawl a month later is
    a new row (usually the desired semantics for refreshed crawls; widen
    the watermark to tighten it)."""
    hashed = pages_stream.withColumn("text_hash", F.md5(F.col(text_col)))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .drop("text_hash")
    )
