"""Extended grouping surface: CUBE and GROUPING SETS (rollup already
has the driver-checked `rollup_revenue` oracle) — Spark vs DuckDB
hash-grade parity via the same compare helper the oracle gate uses."""

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


def test_cube_matches_duckdb(spark):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", (F.unix_millis("ts") / F.lit(86400000)).cast("long")
    )
    got = (
        ev.cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .toPandas()
    )
    want = _duck().execute("""
        SELECT event_type, epoch_ms(ts) // 86400000 AS day,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM events GROUP BY CUBE (event_type, day)
    """).df()
    problems = compare("cube", got, want)
    assert not problems, problems


def test_grouping_sets_matches_duckdb(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    ev.createOrReplaceTempView("ev_gs")
    got = spark.sql("""
        SELECT event_type, user_id % 10 AS cohort,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM ev_gs
        GROUP BY GROUPING SETS ((event_type), (cohort), (event_type, cohort))
    """).toPandas()
    want = _duck().execute("""
        SELECT event_type, user_id % 10 AS cohort,
               COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (cohort), (event_type, cohort))
    """).df()
    problems = compare("grouping_sets", got, want)
    assert not problems, problems


def test_exact_percentiles_match_duckdb(spark):
    """Spark `percentile` (exact, interpolated) == DuckDB
    `quantile_cont` per group — the exact-stats complement of the KLL
    approx path in operators/profile.py."""
    ev = load_table(spark, SF_SMOKE, "events")
    got = (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        )
        .toPandas()
    )
    want = _duck().execute("""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.95), 6) AS p95
        FROM events GROUP BY event_type
    """).df()
    assert not compare("percentiles", got, want)
