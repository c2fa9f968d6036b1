"""Native session_window sessionization (streaming/sessions.py):
batch == streaming == the LAG-gap formulation."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_rtcef_spark.streaming.sessions import sessionized

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    rows = []
    # user A: two sessions (gap of 20 min between event 3 and 4)
    for i, off in enumerate([0, 120, 300, 1500, 1560]):
        rows.append(("a", i, BASE + dt.timedelta(seconds=off)))
    # user B: one long chained session (every 9 min — each gap < 10 min)
    for i, off in enumerate(range(0, 3000, 540)):
        rows.append(("b", 100 + i, BASE + dt.timedelta(seconds=off)))
    # user C: single event
    rows.append(("c", 200, BASE))
    return spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp")


def _lag_gap_sessions(df, gap_ms=600000):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gaps = df.withColumn(
        "new_session",
        F.when(
            F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)) > gap_ms, 1
        ).otherwise(0),
    )
    return (
        gaps.withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def test_batch_session_window_matches_lag_gap(spark):
    df = _events(spark)
    got = (
        sessionized(df, gap="10 minutes", watermark=None)
        .select("user_id", "n_events", "first_ts", "last_ts")
        .toPandas()
        .sort_values(["user_id", "first_ts"])
        .reset_index(drop=True)
    )
    want = (
        _lag_gap_sessions(df)
        .select("user_id", "n_events", "first_ts", "last_ts")
        .toPandas()
        .sort_values(["user_id", "first_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the chained session merged transitively: user b has ONE session
    assert (got[got.user_id == "b"].n_events == [6]).all()


def test_session_end_is_last_plus_gap(spark):
    got = sessionized(_events(spark), gap="10 minutes", watermark=None)
    r = got.filter("user_id = 'c'").first()
    assert r["session_end"] == r["last_ts"] + dt.timedelta(minutes=10)
    assert r["session_start"] == r["first_ts"]


def test_streaming_sessions_equal_batch(spark, tmp_path):
    src = tmp_path / "ev_in"
    df = _events(spark)
    # TIME-ORDERED chunks, written sequentially (the repo's standard
    # replay pattern): a plain repartition(3) write put arbitrary time
    # mixtures in each part file, and the file source replays by
    # mtime — when a chunk fell more than the 30-minute watermark
    # behind an earlier-replayed late-time chunk, its events were
    # dropped as late and the test flaked (sessions 2 vs 4)
    chunked = df.withColumn(
        "__c", F.ntile(3).over(W.orderBy("ts", "event_id"))
    )
    for c in range(1, 4):
        (
            chunked.filter(F.col("__c") == c).drop("__c")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(src / f"c{c}"))
        )
    stream = (
        spark.readStream.schema("user_id string, event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "c*"))
    )
    q = (
        sessionized(stream, gap="10 minutes", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), 'stream did not drain'
    got = (
        spark.sql("SELECT * FROM sess_stream")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = (
        sessionized(df, gap="10 minutes", watermark=None)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
