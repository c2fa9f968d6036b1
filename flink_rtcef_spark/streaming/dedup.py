"""Streaming deduplication — exact dedup over an unbounded stream with
bounded state.

An ingest pipeline (crawl feed, event bus, log shipper) re-delivers:
at-least-once transports duplicate on retry, crawlers re-fetch, and
the same document arrives from multiple frontiers.  Batch
``dedup_exact`` (operators/dedup.py) can't run on an unbounded stream
— held forever, its state grows without bound.  Structured Streaming's
``dropDuplicatesWithinWatermark`` is the native answer: per-key state
lives only until the event-time watermark passes the key's last-seen
timestamp + the configured horizon, so state is bounded by (arrival
rate x horizon) regardless of stream lifetime.

The semantic contract (and its limit) in one line: two rows with the
same key are collapsed IF they arrive within the dedup horizon of each
other; re-deliveries farther apart than the horizon pass — choose the
horizon from the transport's maximum redelivery lag, not from a wish
to dedup "forever".  (Full-history exact dedup of a corpus remains a
batch job — that's ``dedup_exact``; this operator is the stream-side
guard in front of it.)

Keying on content digest (default) rather than raw text keeps the
state entries at 32 bytes each — the same trick the batch operator
uses for its shuffle payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream_df: DataFrame,
    key_cols: list[str] | str | None = None,
    ts_col: str = "timestamp",
    horizon: str = "10 minutes",
    text_col: str | None = None,
) -> DataFrame:
    """Drop duplicate rows from a stream, keeping the first arrival.

    Parameters
    ----------
    key_cols:
        Identity columns.  If ``text_col`` is given instead, identity
        is the md5 digest of that column (content dedup, 32 B state
        per distinct doc).
    ts_col:
        Event-time column (timestamp type, or castable); also the
        watermark column.
    horizon:
        Watermark delay = dedup horizon = state retention bound.
    """
    if (key_cols is None) == (text_col is None):
        raise ValueError("pass exactly one of key_cols / text_col")
    df = stream_df
    if text_col is not None:
        df = df.withColumn("__digest", F.md5(F.col(text_col).cast("string")))
        keys = ["__digest"]
    else:
        keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    et = F.col(ts_col)
    df = df.withColumn(ts_col, et.cast("timestamp")).withWatermark(ts_col, horizon)
    out = df.dropDuplicatesWithinWatermark(keys)
    return out.drop("__digest") if text_col is not None else out
