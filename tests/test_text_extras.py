"""Boilerplate-line removal and temperature mixing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.sampling import temperature_rates, temperature_sample
from flink_rtcef_spark.operators.text import (
    dedup_lines_within_doc,
    remove_boilerplate_lines,
)


def test_dedup_lines_within_doc_keeps_first_in_order(spark):
    doc = "menu\nintro text\nmenu\nbody text\nintro text\nfooter"
    got = dedup_lines_within_doc(
        spark.createDataFrame([(1, doc)], "doc_id long, text string")
    ).first()["text"]
    assert got == "menu\nintro text\nbody text\nfooter"


def test_remove_boilerplate_lines_cuts_frequent_keeps_order(spark):
    banner = "ACCEPT COOKIES TO CONTINUE"
    rows = [
        (i, f"unique opening {i}\n{banner}\n\nunique body {i}\nunique end {i}")
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, max_df=3).collect()
    }
    for i in range(5):
        # banner (df=5 > 3) dropped; unique lines AND the blank line
        # survive in original order
        assert got[i] == f"unique opening {i}\n\nunique body {i}\nunique end {i}"


def test_remove_boilerplate_respects_max_df(spark):
    shared = "shared by exactly two docs"
    rows = [(1, f"a\n{shared}"), (2, f"b\n{shared}"), (3, "c\nonly here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    texts = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(df, max_df=2).collect()
    }
    assert texts[1] == f"a\n{shared}"  # df=2 is within max_df=2


def test_temperature_rates_extremes():
    counts = {"web": 1000, "books": 10}
    # alpha=1: natural proportions -> nothing needs downsampling
    assert temperature_rates(counts, 1.0) == {"web": 1.0, "books": 1.0}
    # alpha=0: uniform mass -> every source contributes c_min expected rows
    r0 = temperature_rates(counts, 0.0)
    assert r0["books"] == pytest.approx(1.0)
    assert r0["web"] * 1000 == pytest.approx(10)
    # target_total caps the expected sampled size
    rt = temperature_rates(counts, 1.0, target_total=101)
    expected = 1000 * rt["web"] + 10 * rt["books"]
    assert expected == pytest.approx(101)
    with pytest.raises(ValueError):
        temperature_rates({}, 1.0)


def test_temperature_sample_balances_sources(spark):
    df = spark.range(1100).select(
        F.col("id"),
        F.when(F.col("id") < 1000, "web").otherwise("books").alias("source"),
    )
    got = (
        temperature_sample(df, "source", "id", alpha=0.0)
        .groupBy("source")
        .count()
        .collect()
    )
    sizes = {r["source"]: r["count"] for r in got}
    assert sizes["books"] == 100  # rate 1.0: everything kept
    assert sizes["web"] == pytest.approx(100, rel=0.35)  # hash-coin at rate 0.1
