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


def test_streaming_hist_sketch_equals_batch(spark, tmp_path):
    """Histogram bins are a COUNT per (group, bin) — associative SUM, so
    complete-mode streaming accumulation == the batch sketch (the merge
    law hist_merge exercises batch-side)."""
    stream, batch = _fixture(spark, tmp_path)
    from flink_rtcef_spark.operators.sketch import hist_sketch

    lo, hi, nb = 0.0, 700.0, 64
    w = (hi - lo) / nb
    v = F.col("v").cast("double")
    bin_ = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(nb - 1),
    )
    sketched = (
        stream.filter(v.isNotNull())
        .select("grp", bin_.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    table = _run_complete(sketched, "hist_stream")
    want = hist_sketch(
        batch.select("grp", F.col("v").cast("double").alias("v")),
        "v", lo, hi, nb, ["grp"],
    )
    _cmp(spark, table, want, ["grp", "bin"])


def test_streaming_bloom_equals_batch(spark, tmp_path):
    """Bloom words accumulate by BIT_OR — associative, commutative,
    idempotent — so the streamed bitset is bit-identical to the batch
    build (and replayed input cannot corrupt it: OR-ing a bit twice is
    a no-op, the at-least-once-safe property)."""
    stream, batch = _fixture(spark, tmp_path)
    from flink_rtcef_spark.operators.sketch import _bloom_word_mask, bloom_build

    m, k = 1 << 14, 4
    v = F.col("v")
    word, mask = _bloom_word_mask(v, m, k, prehashed=False)
    sketched = (
        stream.filter(v.isNotNull())
        .select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    table = _run_complete(sketched, "bloom_stream")
    # the raw streamed accumulation carries no word=-1 parameter row
    # (that row is bloom_build's fail-fast probe-validation metadata,
    # r5); compare bitsets, and note a streamed sketch must either
    # union its own parameter row in or be probed with validate=False
    _cmp(
        spark, table,
        bloom_build(batch, "v", m, k).filter(F.col("word") >= 0),
        ["word"],
    )
    # appending the parameter row makes the streamed sketch a full
    # bloom_build equivalent, probe-able with validation on
    from flink_rtcef_spark.operators.sketch import (
        _BLOOM_META_WORD,
        _bloom_meta_bits,
        bloom_filter_members,
    )

    streamed = spark.sql(f"SELECT * FROM {table}").unionByName(
        spark.range(1).select(
            F.lit(_BLOOM_META_WORD).cast("long").alias("word"),
            F.lit(_bloom_meta_bits(m, k, False)).alias("bits"),
        )
    )
    kept = bloom_filter_members(batch, "v", streamed, m, k)
    assert kept.count() == batch.count()  # every member survives
