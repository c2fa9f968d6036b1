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


# ------------------------------------------------------- fuzzy pass --
def _fuzzy_frames(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # paraphrased leak: most shingles shared, a few words changed
            (1, "the quick brown fox jumps over the lazy dog near the river shore"),
            # clean doc, no overlap
            (2, "completely different content about spark query planning and shuffles"),
            # partial overlap below any reasonable threshold
            (3, "the quick brown fox appears in many unrelated pangram sentences here"),
        ],
        "doc_id long, text string",
    )
    return docs, bench


def test_fuzzy_hits_catch_paraphrase_exact_ngram_misses(spark):
    from flink_rtcef_spark.operators.decontam import (
        contamination_hits,
        fuzzy_contamination_hits,
    )

    docs, bench = _fuzzy_frames(spark)
    # the 13-gram exact pass misses the paraphrase (longest common run < 13)
    exact = {r["doc_id"] for r in contamination_hits(docs, bench, n=13).collect()}
    assert 1 not in exact
    fuzzy = {
        r["doc_id"]: r["jaccard"]
        for r in fuzzy_contamination_hits(docs, bench, threshold=0.5).collect()
    }
    assert 1 in fuzzy and fuzzy[1] >= 0.5
    assert 2 not in fuzzy


def test_fuzzy_jaccard_matches_set_arithmetic(spark):
    from flink_rtcef_spark.operators.decontam import fuzzy_contamination_hits

    docs, bench = _fuzzy_frames(spark)
    got = {
        (r["doc_id"], r["bench_id"]): r["jaccard"]
        for r in fuzzy_contamination_hits(docs, bench, threshold=0.0).collect()
    }

    def sh_set(text):
        t = text.lower().split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    b = sh_set("the quick brown fox jumps over the lazy dog near the river bank")
    for doc_id, text in [
        (1, "the quick brown fox jumps over the lazy dog near the river shore"),
    ]:
        a = sh_set(text)
        want = round(len(a & b) / len(a | b), 6)
        assert got[(doc_id, 100)] == want


def test_fuzzy_decontaminate_drops_only_flagged(spark):
    from flink_rtcef_spark.operators.decontam import fuzzy_decontaminate

    docs, bench = _fuzzy_frames(spark)
    kept = sorted(r["doc_id"] for r in fuzzy_decontaminate(docs, bench, 0.5).collect())
    assert kept == [2, 3]


def test_fuzzy_plan_broadcasts_benchmark_sides(spark):
    """Every benchmark-side join (band candidates, shingle verify,
    benchmark sizes) must be broadcast — corpus-vs-corpus joins may
    sort-merge, but the megabyte benchmark side never forces a corpus
    shuffle."""
    import re

    from flink_rtcef_spark.operators.decontam import fuzzy_contamination_hits

    docs, bench = _fuzzy_frames(spark)
    df = fuzzy_contamination_hits(docs, bench, threshold=0.5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 3
