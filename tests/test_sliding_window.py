"""Sliding (hopping) event-time windows — the remaining window family
next to tumbling (A14 oracle query) and session (streaming/sessions):
every event lands in span/slide overlapping windows; batch ==
streaming == DuckDB bucket arithmetic."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from flink_rtcef_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

SPAN_S, SLIDE_S = 3600, 900  # 1 h windows hopping every 15 min


def _sliding_agg(ev):
    return (
        ev.groupBy(F.window("ts", f"{SPAN_S} seconds", f"{SLIDE_S} seconds"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("w_start"),
            "n_events",
            "sum_value",
        )
    )


def test_sliding_window_matches_duckdb(spark):
    """Spark's hopping window == explicit bucket arithmetic in DuckDB
    (each event joins the span/slide windows covering it)."""
    ev = load_table(spark, SF_SMOKE, "events")
    got = (
        _sliding_agg(ev)
        .toPandas()
        .sort_values("w_start")
        .reset_index(drop=True)
    )
    n_hops = SPAN_S // SLIDE_S
    con = duckdb.connect()
    want = (
        con.execute(f"""
        WITH hops AS (SELECT UNNEST(range(0, {n_hops})) AS i),
        placed AS (
          SELECT (epoch_ms(ts) // 1000 // {SLIDE_S} - i) * {SLIDE_S} AS w_start,
                 value
          FROM read_parquet('{SF_SMOKE}/events.parquet'), hops
        )
        SELECT CAST(w_start AS BIGINT) AS w_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM placed GROUP BY 1 ORDER BY 1
        """).df()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: each event really appears n_hops times in total
    assert got["n_events"].sum() == ev.count() * n_hops


def test_sliding_window_streams_equal_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "value")
    src = tmp_path / "ev"
    ev.repartition(3).write.parquet(str(src))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
    )
    q = (
        _sliding_agg(stream)
        .writeStream.format("memory")
        .queryName("slide_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not drain"
    got = (
        spark.sql("SELECT * FROM slide_stream")
        .toPandas()
        .sort_values("w_start")
        .reset_index(drop=True)
    )
    want = _sliding_agg(ev).toPandas().sort_values("w_start").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
