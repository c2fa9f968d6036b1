"""Readers for the engine's sources.

The reference ingests JSONL over Kafka (InferenceJob.java:120-132) and
CSV files (stream/StreamFactory.scala:167-173).  Here: parquet is the
batch default (columnar scan + pushdown), JSONL with declared schema for
parity, Kafka behind an import/packaging guard (the local image has no
kafka connector jar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_rtcef_spark.sources.schemas import (
    BITSTRING_FLAGS,
    MARITIME_RAW_SCHEMA,
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # the events fixture carries parquet TIMESTAMP(NANOS), which
        # Spark has no native type for; read it as long (runtime-settable
        # legacy conf — works on caller-provided sessions too, e.g. the
        # correctness driver's own session) and convert below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # parquet TIMESTAMP(NANOS) surfaced as long (nanosAsLong):
        # truncate to micros exactly (integer div) — matches DuckDB's
        # nanos->micros truncation on the same file.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_events_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL event source with declared schema (no inference in prod)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def parse_maritime(raw: DataFrame) -> DataFrame:
    """The reference's maritime parse as pure Column expressions.

    Mirrors MaritimeParser.java:37-133 — rename trh->heading, derive
    gap_start from timestamp==-1, constant event type, and explode the
    8-char critical_bitstring into 8 double flags (bit positions 7..0;
    bitstring "-1" -> all flags -1.0).  All JVM-side, codegen-friendly:
    no UDFs.
    """
    df = raw.withColumnRenamed("trh", "heading")
    df = df.withColumn("gap_start", F.when(F.col("timestamp") == -1, 1.0).otherwise(0.0))
    df = df.withColumn("event_type", F.lit("SampledCritical"))
    bs = F.col("critical_bitstring")
    for i, flag in enumerate(BITSTRING_FLAGS):
        # flag i reads character i+1 of the 8-char bitstring
        df = df.withColumn(
            flag,
            F.when(bs == "-1", -1.0).otherwise(
                F.substring(bs, i + 1, 1).cast("double")
            ),
        )
    return df.drop("critical_bitstring")


def read_maritime_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV variant of the maritime source (data/maritime.csv layout:
    timestamp,mmsi,lon,lat,speed,cog,trh,critical_bitstring)."""
    schema = "timestamp long, mmsi string, lon double, lat double, speed double, cog double, trh double, critical_bitstring string"
    return parse_maritime(spark.read.csv(path, schema=schema, header=False))


def normalize_events(
    df: DataFrame,
    id_field: str,
    ts_field: str = "timestamp",
    event_type_field: str | None = None,
    constant_event_type: str | None = None,
) -> DataFrame:
    """Configurable-field event normalization (JsonEventParser.java:41-107
    parity: idField/tsField/eventType are parameters, e.g. maritime uses
    mmsi/timestamp, finance uses pan/timestamp).  Output carries the
    GenericEvent core columns (key, timestamp, event_type) alongside the
    original attributes; malformed rows (null id/ts) are dropped, the
    PERMISSIVE-mode analogue of the reference's flatMap skip."""
    out = df.withColumn("key", F.col(id_field).cast("string")).withColumn(
        "timestamp", F.col(ts_field).cast("long")
    )
    if event_type_field:
        out = out.withColumn("event_type", F.col(event_type_field))
    elif constant_event_type:
        out = out.withColumn("event_type", F.lit(constant_event_type))
    return out.filter(F.col("key").isNotNull() & F.col("timestamp").isNotNull())


def read_kafka_stream(spark: SparkSession, brokers: str, topics: str, starting: str = "earliest"):
    """Kafka source (InferenceJob.java:120-132 equivalent).

    Gated: the local image ships no spark-sql-kafka package; on a real
    cluster pass --packages org.apache.spark:spark-sql-kafka-0-10_2.13.
    """
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topics)
            .option("startingOffsets", starting)
            .load()
        )
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "Kafka connector jar not available in this environment; "
            "use file/memory sources locally"
        ) from exc
