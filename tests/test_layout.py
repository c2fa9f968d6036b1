"""Z-order clustering (sources/layout.py): Morton-code correctness and
the measurable pruning benefit that justifies the layout."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from flink_rtcef_spark.sources.layout import (
    box_query_file_selectivity,
    file_stats,
    interleave_bits,
    quantize,
    write_zordered,
    zorder_code,
)


def test_interleave_bits_known_values(spark):
    df = spark.range(1).select(
        interleave_bits([F.lit(0b101), F.lit(0b011)], bits=3).alias("code")
    )
    # x=0b101, y=0b011 -> bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1
    assert df.collect()[0]["code"] == 0b011011


def test_interleave_is_codegen_expression(spark):
    # the Morton code must stay a pure Column expression: no
    # BatchEvalPython / ArrowEvalPython node in the plan
    df = spark.range(100).select(
        interleave_bits([F.col("id"), F.col("id") + 1]).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_quantize_clamps_and_bins(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double"
    )
    vals = [
        r["q"] for r in df.select(quantize(F.col("v"), 0.0, 100.0, bits=4).alias("q")).collect()
    ]
    assert vals[0] == 0  # below range clamps low
    assert vals[1] == 0
    assert vals[2] == 8  # midpoint -> middle bin
    assert vals[4] == 15  # above range clamps high
    assert vals[3] == 15


def test_zorder_prunes_all_dimensions(spark):
    """The certification, on what Z-order actually guarantees: BALANCED
    pruning.  A layout sorted on x alone prunes x-slabs perfectly but
    reads 100% of files for a y-only predicate; the z-ordered layout
    must prune single-dimension slabs on EVERY clustered dimension and
    confine a 2-d box to a small file footprint.  (Measured here:
    z-order ~26% per slab and ~8% for the box vs linear's 6%/100%/6%.)"""
    n = 200_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 1000).alias("x"),
            F.floor(F.col("id") / 1000).alias("y"),
            F.col("id").alias("payload"),
        )
        # decorrelate x and y orderings
        .withColumn("y", (F.col("y") * 7919) % 200)
    )
    x_slab = {"x": (100.0, 150.0)}  # ~5% of x-space
    y_slab = {"y": (20.0, 30.0)}  # ~5.5% of y-space
    box = {**x_slab, **y_slab}
    with tempfile.TemporaryDirectory() as tmp:
        write_zordered(df, f"{tmp}/z", dims=["x", "y"], n_files=64)
        zs = file_stats(spark, f"{tmp}/z", ["x", "y"])
        (
            df.repartitionByRange(64, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(f"{tmp}/linear")
        )
        ls = file_stats(spark, f"{tmp}/linear", ["x", "y"])
    # the x-sorted layout cannot skip a single file for a y-only query
    assert box_query_file_selectivity(ls, y_slab) == 1.0
    # z-order prunes BOTH single-dimension slabs...
    assert box_query_file_selectivity(zs, x_slab) < 0.5
    assert box_query_file_selectivity(zs, y_slab) < 0.5
    # ...and confines the 2-d box to a small footprint
    assert box_query_file_selectivity(zs, box) < 0.15


def test_zorder_code_explicit_ranges_no_scan(spark):
    # with ranges supplied there must be no job: zorder_code on an
    # unresolvable-through-action plan would throw on collect; instead
    # just check it builds a Column and evaluates
    df = spark.createDataFrame([(5.0, 5.0)], "a double, b double")
    code = zorder_code(df, ["a", "b"], ranges={"a": (0, 10), "b": (0, 10)})
    out = df.select(code.alias("c")).collect()[0]["c"]
    assert isinstance(out, int)


def test_write_zordered_roundtrip_preserves_rows(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 100).alias("x"), (F.col("id") % 97).alias("y"), "id"
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_zordered(df, f"{tmp}/z", dims=["x", "y"], n_files=8)
        back = spark.read.parquet(f"{tmp}/z")
        assert back.count() == 10_000
        assert back.agg(F.sum("id")).collect()[0][0] == sum(range(10_000))
        assert set(back.columns) == {"x", "y", "id"}  # helper column dropped
