"""Remaining relational-surface corners: INTERSECT / EXCEPT (DISTINCT
and ALL forms) and UNPIVOT/stack — Spark vs DuckDB parity with the
oracle-gate compare helper."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from flink_rtcef_spark.sources.io import load_table
from tests.conftest import SF_SMOKE
from tools.check_oracle import compare


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    )
    return con


def test_intersect_except_match_duckdb(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    a = ev.filter("value > 40").select("user_id").distinct()
    b = ev.filter("event_type = 'purchase'").select("user_id").distinct()
    got_i = a.intersect(b).toPandas()
    got_e = a.exceptAll(b).toPandas()
    duck = _duck()
    want_i = duck.execute("""
        SELECT DISTINCT user_id FROM events WHERE value > 40
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """).df()
    want_e = duck.execute("""
        SELECT DISTINCT user_id FROM events WHERE value > 40
        EXCEPT ALL
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """).df()
    assert not compare("intersect", got_i, want_i)
    assert not compare("except_all", got_e, want_e)


def test_unpivot_matches_duckdb(spark):
    """Wide->long reshaping: Spark `unpivot` == DuckDB UNPIVOT."""
    ev = load_table(spark, SF_SMOKE, "events")
    wide = ev.groupBy("user_id").agg(
        F.round(F.sum(F.when(F.col("event_type") == "view", F.col("value"))), 4)
        .alias("view_v"),
        F.round(F.sum(F.when(F.col("event_type") == "click", F.col("value"))), 4)
        .alias("click_v"),
    )
    got = wide.unpivot(
        "user_id", ["view_v", "click_v"], "metric", "amount"
    ).toPandas()
    want = _duck().execute("""
        WITH wide AS (
          SELECT user_id,
                 ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 4) AS view_v,
                 ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 4) AS click_v
          FROM events GROUP BY user_id
        )
        SELECT user_id, metric, amount
        FROM wide UNPIVOT INCLUDE NULLS (amount FOR metric IN (view_v, click_v))
    """).df()
    assert not compare("unpivot", got, want)
