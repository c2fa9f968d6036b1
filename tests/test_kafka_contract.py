"""Contract tests for the Kafka source/sink chain (A1/A17) and the JDBC
detections sink (F10) — no broker / external DB in this environment, so:

- the value parse / payload serialize chain is exercised on static
  DataFrames carrying the exact wire schema spark-sql-kafka produces
  (KAFKA_RAW_SCHEMA), proving the Column logic end-to-end;
- the reader/writer option plumbing is captured by monkeypatching the
  DataStreamReader/Writer, asserting the reference's consumer contract
  (InferenceJob.java:120-132: multi-topic, starting offsets, timeout
  properties) without needing the connector jar;
- the JDBC sink round-trips through embedded Derby (bundled with the
  Spark distribution), the in-process analogue of the reference's
  Postgres DBConnector (Wayeb/cef/.../db/DBConnector.scala).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_rtcef_spark.sources.io import (
    KAFKA_RAW_SCHEMA,
    kafka_sink_payload,
    kafka_source_options,
    parse_kafka_values,
    read_kafka_stream,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("mmsi", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("speed", T.DoubleType()),
    ]
)


def _kafka_frame(spark, values: list[str | None], topic: str = "maritime"):
    rows = [
        (None, v.encode() if v is not None else None, topic, 0, i, None, 0)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, KAFKA_RAW_SCHEMA)


def test_source_options_match_reference_contract():
    opts = kafka_source_options("broker:9092", "maritime", "earliest")
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "maritime"
    assert opts["startingOffsets"] == "earliest"
    # I/O-lag tolerance the reference sets on every consumer
    # (InferenceJob.java:125-126)
    assert opts["kafka.session.timeout.ms"] == "45000"
    assert opts["kafka.request.timeout.ms"] == "60000"


def test_source_options_multi_topic_and_latest():
    # the model+sync consumer subscribes two topics from latest
    # (InferenceJob.java:145-153)
    opts = kafka_source_options(
        "broker:9092", ["factory_reports", "enginesync"], "latest"
    )
    assert opts["subscribe"] == "factory_reports,enginesync"
    assert opts["startingOffsets"] == "latest"
    with pytest.raises(ValueError):
        kafka_source_options("b", "t", starting="bogus")


def test_reader_plumbing_without_broker(spark, monkeypatch):
    """read_kafka_stream must hand the kafka format + full option set to
    the DataStreamReader; captured via monkeypatch since no connector
    jar is present to actually .load()."""
    from pyspark.sql.streaming import readwriter as srw

    captured: dict = {"options": {}}
    orig_format = srw.DataStreamReader.format
    orig_option = srw.DataStreamReader.option

    def rec_format(self, source):
        captured["format"] = source
        return orig_format(self, source)

    def rec_option(self, key, value):
        captured["options"][key] = value
        return orig_option(self, key, value)

    def fake_load(self, path=None, format=None, schema=None, **options):
        return spark.createDataFrame([], KAFKA_RAW_SCHEMA)

    monkeypatch.setattr(srw.DataStreamReader, "format", rec_format)
    monkeypatch.setattr(srw.DataStreamReader, "option", rec_option)
    monkeypatch.setattr(srw.DataStreamReader, "load", fake_load)

    df = read_kafka_stream(spark, "broker:9092", ("a", "b"), "latest")
    assert captured["format"] == "kafka"
    assert captured["options"]["subscribe"] == "a,b"
    assert captured["options"]["startingOffsets"] == "latest"
    assert captured["options"]["kafka.bootstrap.servers"] == "broker:9092"
    assert [f.name for f in df.schema.fields][:2] == ["key", "value"]


def test_value_only_deserialization(spark):
    raw = _kafka_frame(spark, ['{"x": 1}', "plain"])
    out = parse_kafka_values(raw).collect()
    assert [r.value for r in out] == ['{"x": 1}', "plain"]


def test_json_parse_drops_malformed(spark):
    good = {"mmsi": "m1", "timestamp": 10, "speed": 3.5}
    raw = _kafka_frame(
        spark, [json.dumps(good), "not json at all", '{"other": true}']
    )
    out = parse_kafka_values(raw, EVENT_SCHEMA).collect()
    # unparseable record skipped (reference parser flatMap skips);
    # {"other": true} parses to all-null fields and is dropped too
    assert len(out) == 1
    assert out[0].mmsi == "m1" and out[0].timestamp == 10 and out[0].speed == 3.5


def test_payload_roundtrip(spark):
    """events -> sink payload -> (simulated broker) -> value parse
    reproduces the original rows, key column carries the partition key
    so keyed topics preserve per-key order."""
    events = spark.createDataFrame(
        [("m1", 10, 3.5), ("m2", 11, 0.0)], EVENT_SCHEMA
    )
    payload = kafka_sink_payload(events, key_col="mmsi")
    assert payload.columns == ["key", "value"]
    # simulate the broker: value comes back as binary in the wire schema
    wire = _kafka_frame(
        spark, [r.value for r in payload.collect()]
    )
    back = parse_kafka_values(wire, EVENT_SCHEMA).orderBy("timestamp").collect()
    assert [(r.mmsi, r.timestamp, r.speed) for r in back] == [
        ("m1", 10, 3.5),
        ("m2", 11, 0.0),
    ]
    keys = [r.key for r in payload.orderBy("value").collect()]
    assert set(keys) == {"m1", "m2"}


def test_jdbc_detection_sink_roundtrip(spark, tmp_path):
    """F10: detections written over JDBC and read back — embedded Derby
    stands in for the reference's Postgres DetectionsTable
    (Wayeb/cef/.../db/DetectionsTable.scala)."""
    url = f"jdbc:derby:{tmp_path}/detdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    detections = spark.createDataFrame(
        [("m1", 100, 5), ("m1", 220, 7), ("m2", 130, 3)],
        "key string, detection_ts long, n_matched int",
    )
    detections.write.format("jdbc").option("url", url).option(
        "dbtable", "detections"
    ).option("driver", driver).mode("overwrite").save()
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "detections")
        .option("driver", driver)
        .load()
    )
    got = sorted((r.key, r.detection_ts, r.n_matched) for r in back.collect())
    assert got == [("m1", 100, 5), ("m1", 220, 7), ("m2", 130, 3)]
