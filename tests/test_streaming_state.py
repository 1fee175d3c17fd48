"""Stateful streaming sessionization (applyInPandasWithState) equals the
batch window-function sessionization on the same events — and carries its
state correctly across micro-batches."""

import os

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def spark():
    from fuzzy_search_spark.spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = get_spark(master="local[4]", app_name="streaming-state-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def _make_events(spark):
    """4 users x interleaved events with gaps straddling the 1800s cutoff."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 8, 0, 0)
    rows = []
    eid = 0
    for user in range(1, 5):
        offs = [0, 60, 1900 * user % 4000 + 120, 4000, 4060,
                4060 + 1801, 9000 + user * 7, 12000]
        for o in offs:
            rows.append((eid, base + dt.timedelta(seconds=o), user,
                         "click", float(o % 13), "{}"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def _run_stream(spark, input_dir, out_table):
    from fuzzy_search_spark.streaming import EVENTS_DDL, stream_sessionize

    events = (spark.readStream.schema(EVENTS_DDL)
              .option("maxFilesPerTrigger", 1)
              .parquet(input_dir))
    q = (stream_sessionize(events).writeStream
         .format("memory").queryName(out_table)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    # keep only each user's LAST emitted totals (Update mode re-emits)
    return {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.sql(
            f"SELECT user_id, n_sessions, n_events, rn FROM ("
            f"  SELECT *, row_number() OVER (PARTITION BY user_id "
            f"                               ORDER BY n_events DESC) AS rn"
            f"  FROM {out_table}) WHERE rn = 1").collect()
    }


def _batch_expected(spark, events_df):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = events_df.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0))
    agg = (sess.groupBy("user_id")
           .agg(F.sum("new_session").alias("n_sessions"),
                F.count(F.lit(1)).alias("n_events")))
    return {r.user_id: (r.n_sessions, r.n_events) for r in agg.collect()}


def test_stream_sessionize_single_batch(spark, tmp_path):
    events = _make_events(spark)
    path = str(tmp_path / "events_one")
    events.coalesce(1).write.parquet(path)
    got = _run_stream(spark, path, "sess_one")
    assert got == _batch_expected(spark, events)


def test_stream_sessionize_state_across_batches(spark, tmp_path):
    """Split the events mid-session into two files (two micro-batches):
    the final totals must still equal the batch answer, which requires the
    state (last_ts) to carry across batches."""
    from pyspark.sql import functions as F

    events = _make_events(spark)
    path = str(tmp_path / "events_split")
    os.makedirs(path)
    early = events.filter(F.col("event_id") % 8 < 4)  # first half per user
    late = events.filter(F.col("event_id") % 8 >= 4)
    early.coalesce(1).write.parquet(path + "/f=0")
    late.coalesce(1).write.parquet(path + "/f=1")
    got = _run_stream(spark, path + "/f=*", "sess_split")
    assert got == _batch_expected(spark, events)


def test_stream_dedup_drops_recrawls(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per content hash within
    the horizon; distinct bodies pass through."""
    import shutil as _shutil

    from fuzzy_search_spark.streaming import WEB_PAGES_DDL, stream_dedup

    src = tmp_path / "pages_in"
    src.mkdir()
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        ("u1", t0, None, "same body", "en"),
        ("u2", t0 + dt.timedelta(minutes=5), None, "same body", "en"),
        ("u3", t0 + dt.timedelta(minutes=10), None, "different body", "en"),
    ]
    spark.createDataFrame(rows, WEB_PAGES_DDL) \
        .coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = (spark.readStream.schema(WEB_PAGES_DDL).parquet(str(src)))
    out_dir, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    q = (stream_dedup(stream).writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", chk)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["different body", "same body"]
    _shutil.rmtree(chk, ignore_errors=True)


def test_stream_match_rates_windows(spark, tmp_path):
    """Watermarked windowed aggregation over a match stream: per-phrase
    counts per event-time window."""
    import datetime as dt

    from fuzzy_search_spark.streaming import stream_match_rates

    src = tmp_path / "matches_in"
    src.mkdir()
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for minute, phrase, n in ((0, "alpha", 3), (0, "beta", 1),
                              (2, "alpha", 2)):
        rows += [(f"u{minute}-{i}", t0 + dt.timedelta(minutes=minute),
                  phrase) for i in range(n)]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, phrase string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, phrase string").parquet(str(src))
    q = (stream_match_rates(spark, stream, window_seconds=60)
         .writeStream.format("memory").queryName("rates")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window"]["start"].minute, r["phrase"]): r["n_matches"]
           for r in spark.sql("select * from rates").collect()}
    assert got == {(0, "alpha"): 3, (0, "beta"): 1, (2, "alpha"): 2}
