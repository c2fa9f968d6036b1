"""Reference-schema JDBC sinks: exact DDL, column mapping, and an
executable Derby round-trip (the in-sandbox stand-in for Postgres —
same code path, dialect-switched column types)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.sources.db_sink import (
    DETECTIONS_PG_TYPES,
    FORECASTS_PG_TYPES,
    detections_ddl,
    detections_rows,
    forecasts_ddl,
    forecasts_rows,
    write_jdbc_reference_table,
)


def test_postgres_ddl_matches_reference_tables():
    # DetectionsTable.scala:13-18 under Slick PostgresProfile
    assert detections_ddl("postgres") == (
        'CREATE TABLE detections."ComplexEvents" ('
        "DET_ID INTEGER PRIMARY KEY, ts BIGINT, partitionval VARCHAR, "
        "state INTEGER, events VARCHAR)"
    )
    # ForecastsTable.scala:27-40
    assert forecasts_ddl("postgres") == (
        'CREATE TABLE forecasts."ForecastIntervals" ('
        "PRED_ID INTEGER PRIMARY KEY, ts BIGINT, partitionval VARCHAR, "
        "state INTEGER, startRelativeToNow INTEGER, endRelativeToNow INTEGER, "
        "startRelativeToCounter BIGINT, endRelativeToCounter BIGINT, "
        "prob DOUBLE PRECISION, spread INTEGER, distance DOUBLE PRECISION, "
        "isCorrect BOOLEAN)"
    )
    with pytest.raises(ValueError):
        detections_ddl("oracle")


@pytest.fixture()
def det_frame(spark):
    return spark.createDataFrame(
        [("m2", 130, 9, 3, 1, 2), ("m1", 100, 5, 2, 1, 2), ("m1", 220, 7, 4, 3, 2)],
        "key string, detection_ts long, detection_event_id long, counter long, "
        "min_counter long, n_matched int",
    )


def test_detections_rows_mapping(spark, det_frame):
    got = detections_rows(det_frame, final_state=6, sequential=True).collect()
    assert [r["DET_ID"] for r in got] == [1, 2, 3]  # dense, ts-ordered
    assert [(r["ts"], r["partitionval"], r["state"], r["events"]) for r in got] == [
        (100, "m1", 6, "n_matched=2"),
        (130, "m2", 6, "n_matched=2"),
        (220, "m1", 6, "n_matched=2"),
    ]
    # distributed default: unique, not necessarily dense
    ids = [r["DET_ID"] for r in detections_rows(det_frame).collect()]
    assert len(set(ids)) == 3


def test_derby_roundtrip_with_reference_types(spark, tmp_path, det_frame):
    url = f"jdbc:derby:{tmp_path}/refdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    rows = detections_rows(det_frame, final_state=6, sequential=True)
    write_jdbc_reference_table(
        rows, url, "detections", driver=driver, dialect="derby",
        dbtable="ComplexEvents",
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "ComplexEvents")
        .option("driver", driver)
        .load()
    )
    assert list(back.columns) == list(DETECTIONS_PG_TYPES)
    assert sorted((r.DET_ID, r.ts, r.partitionval) for r in back.collect()) == [
        (1, 100, "m1"),
        (2, 130, "m2"),
        (3, 220, "m1"),
    ]


def test_forecasts_rows_mapping(spark, tmp_path):
    fc = spark.createDataFrame(
        [
            ("k1", 50, 9, 10, False, 0.8, 12, 15, True),
            ("k1", 60, 10, 11, True, 1.0, 11, 11, True),  # detection row: excluded
            ("k2", 70, 11, 4, False, 0.6, 9, 13, False),
        ],
        "key string, ts long, event_id long, counter long, is_detection boolean, "
        "prob double, start_ctr long, end_ctr long, positive boolean",
    )
    got = forecasts_rows(fc, spread=3, sequential=True).collect()
    assert list(got[0].asDict()) == list(FORECASTS_PG_TYPES)
    assert len(got) == 2  # the detection row dropped
    r = got[0]
    assert (r["ts"], r["partitionval"]) == (50, "k1")
    assert (r["startRelativeToNow"], r["endRelativeToNow"]) == (2, 5)  # 12-10, 15-10
    assert (r["startRelativeToCounter"], r["endRelativeToCounter"]) == (12, 15)
    assert (r["prob"], r["spread"]) == (0.8, 3)
    assert r["distance"] is None and r["isCorrect"] is None  # not yet evaluated

    url = f"jdbc:derby:{tmp_path}/fcdb;create=true"
    write_jdbc_reference_table(
        forecasts_rows(fc, spread=3, sequential=True),
        url,
        "forecasts",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        dialect="derby",
        dbtable="ForecastIntervals",
    )
    n = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "ForecastIntervals")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
        .count()
    )
    assert n == 2
