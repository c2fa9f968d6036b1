"""Streaming twins of the sketch layer: HLL registers (MAX) and CMS
counters (SUM) are associative+commutative aggregates, so Structured
Streaming accumulates them across microbatches into EXACTLY the batch
sketch — the live-ingest profiling path (distinct-count / frequency
monitors at the stream edge, merged later with batch shards via
hll_merge / cms_merge)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.sketch import (
    cms_build,
    hll_registers,
    hll_rho,
)
from flink_rtcef_spark.functions.scalar import portable_hash64


def _fixture(spark, tmp_path, n=3000):
    src = tmp_path / "vals_in"
    df = spark.range(n).select(
        (F.col("id") % 700).cast("string").alias("v"),
        (F.col("id") % 3).cast("string").alias("grp"),
    )
    # several files -> several microbatches with maxFilesPerTrigger
    df.repartition(4).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema("v string, grp string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    return stream, df


def _run_complete(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), 'stream did not drain'
    return name


def _cmp(spark, table, want_df, keys):
    got = spark.sql(f"SELECT * FROM {table}").toPandas()
    want = want_df.toPandas()
    got = got.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(keys).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want)


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    stream, batch = _fixture(spark, tmp_path)
    v = F.col("v")
    sketched = (
        stream.select(
            "grp",
            (portable_hash64(v) % 256).alias("bucket"),
            hll_rho(v).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    table = _run_complete(sketched, "hll_stream")
    _cmp(spark, table, hll_registers(batch, "v", ["grp"]), ["grp", "bucket"])


def test_streaming_cms_equals_batch(spark, tmp_path):
    stream, batch = _fixture(spark, tmp_path)
    from flink_rtcef_spark.operators.sketch import _cms_cell, _cms_hash

    v = F.col("v").cast("string")
    sketched = (
        stream.select(_cms_hash(v, 0).alias("_h"),
                      F.lit(1).cast("long").alias("w"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r"),
            F.col("_h"),
            F.col("w"),
        )
        .select("r", _cms_cell(F.col("_h"), F.col("r"), 1024).alias("c"), "w")
        .groupBy("r", "c")
        .agg(F.sum("w").alias("cnt"))
    )
    table = _run_complete(sketched, "cms_stream")
    _cmp(spark, table, cms_build(batch, "v"), ["r", "c"])
