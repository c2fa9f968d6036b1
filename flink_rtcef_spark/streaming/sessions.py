"""Streaming sessionization — native ``session_window`` with a
watermark, the unbounded-stream twin of the batch ``sessionize`` query
(queries/relational.py).

The batch query finds sessions with the LAG-gap trick (a per-key sort +
running sum — fine on a bounded table, impossible on an unbounded
stream: the sort never closes).  Structured Streaming's
``session_window`` holds per-key OPEN sessions in the state store,
extends them while events keep arriving within ``gap``, and emits a
session exactly when the event-time watermark passes its close — so
state is bounded by (active keys × open sessions), not stream length.

Semantics are identical to the batch gap rule: events of one key merge
into one session iff consecutive gaps are <= ``gap`` (an event exactly
``gap`` after its predecessor still merges — verified against Spark's
session_window and mirrored by the lag-gap oracle's ``> gap`` split
rule); a session's span is [first_ts, last_ts].
``test_streaming_sessions.py`` and the hypothesis equivalence test in
``test_property.py`` pin this, including the boundary.

Reference note: Flink's equivalent is EventTimeSessionWindows; the
reference pipelines use tumbling windows only (SURVEY §2.A14), so this
is stream-surface the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionized(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "10 minutes",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Per (key, session) aggregate: event count + [start, end] of the
    session (end = last event ts + gap, Spark's session_window close).

    Works on BOTH batch and streaming DataFrames — the same plan; on a
    stream a watermark is mandatory (sessions can only close once late
    data is excluded).  Pass ``watermark=None`` on batch input.
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )
