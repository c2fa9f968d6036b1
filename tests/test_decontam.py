"""Benchmark decontamination: leak detection through formatting
differences, clean/short docs untouched, and the broadcast plan shape
(the corpus side must never shuffle)."""

from __future__ import annotations

import pytest

from flink_rtcef_spark.operators.decontam import (
    contamination_hits,
    decontaminate,
)

BENCH_Q = (
    "What is the capital of France and which river flows through "
    "that city on its way to the sea"
)


@pytest.fixture()
def frames(spark):
    benchmark = spark.createDataFrame(
        [(BENCH_Q,), ("Name the largest planet in the solar system "
                      "and give its mass relative to Earth",)],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            # verbatim leak
            (1, f"Trivia night prep: {BENCH_Q}? Paris, obviously."),
            # same leak, different case + punctuation (normalization must catch)
            (2, "what IS the Capital of france, and WHICH river flows "
                "through that city... on its way to the sea!!"),
            # clean long document
            (3, "The weather in the mountains turned cold early this "
                "year and the passes closed before the first week of "
                "October which surprised the older guides most of all"),
            # too short to contain any 13-gram
            (4, "short note"),
        ],
        "doc_id long, text string",
    )
    return docs, benchmark


def test_hits_flag_leaks_through_formatting(spark, frames):
    docs, benchmark = frames
    hits = {r["doc_id"]: r["n_contaminated_grams"] for r in
            contamination_hits(docs, benchmark).collect()}
    assert set(hits) == {1, 2}
    assert all(v >= 1 for v in hits.values())


def test_decontaminate_keeps_clean_docs(spark, frames):
    docs, benchmark = frames
    kept = sorted(r["doc_id"] for r in decontaminate(docs, benchmark).collect())
    assert kept == [3, 4]


def test_plan_broadcasts_benchmark_side(spark, frames):
    docs, benchmark = frames
    plan = (
        contamination_hits(docs, benchmark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # corpus side streams, never shuffles


def test_no_false_positives_on_shared_short_phrases(spark):
    # a 12-token overlap must NOT flag at n=13
    shared12 = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame(
        [(1, f"{shared12} thirteen-doc tail words here")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(f"{shared12} different benchmark ending",)], "text string"
    )
    assert contamination_hits(docs, bench).count() == 0
    assert decontaminate(docs, bench).count() == 1
