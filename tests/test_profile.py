"""Sketch profiling vs exact answers at small SF.

Sketches are approximate by design; each assertion uses the sketch's
published error bound with slack (HLL lgConfigK=12 ~ 1.6% RSE; KLL
k=200 ~ 1.2% rank error) — at these cardinalities the HLL sparse mode
is near-exact, so the tolerances are generous."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.profile import (
    approx_distinct,
    corpus_overlap,
    corpus_profile,
    group_distinct_rollup,
    length_quantiles,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_approx_distinct_within_bound(spark, docs):
    exact = docs.select(
        F.countDistinct("doc_id").alias("ids"), F.countDistinct("lang").alias("langs")
    ).first()
    got = approx_distinct(docs, ["doc_id", "lang"]).first()
    assert got["doc_id_distinct"] == pytest.approx(exact["ids"], rel=0.05)
    assert got["lang_distinct"] == pytest.approx(exact["langs"], rel=0.05)


def test_group_rollup_matches_exact_and_reaggregates(spark, docs):
    got = {
        r["lang"]: r["approx_distinct"]
        for r in group_distinct_rollup(docs, "lang", "doc_id").collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n")).collect()
    }
    for lang, n in exact.items():
        assert got[lang] == pytest.approx(n, rel=0.05)
    # the <ALL> row is re-aggregated from the per-group sketches —
    # never rescans rows — and must still match the global distinct
    total_exact = docs.select(F.countDistinct("doc_id")).first()[0]
    assert got["<ALL>"] == pytest.approx(total_exact, rel=0.05)


def test_length_quantiles_rank_error(spark, docs):
    lengths = docs.select(F.length("text").alias("n"))
    got = length_quantiles(lengths, "n", quantiles=[0.5, 0.9]).first()
    n_rows = lengths.count()
    for q, val in ((0.5, got["p5"]), (0.9, got["p9"])):
        rank = lengths.filter(F.col("n") <= val).count() / n_rows
        assert abs(rank - q) < 0.05, f"q={q}: value {val} sits at rank {rank}"


def test_corpus_overlap_known_ground_truth(spark):
    left = spark.range(0, 1000).select(F.concat(F.lit("k"), "id").alias("k"))
    right = spark.range(500, 1500).select(F.concat(F.lit("k"), "id").alias("k"))
    got = corpus_overlap(left, right, "k").first()
    assert got["left_distinct"] == pytest.approx(1000, rel=0.05)
    assert got["right_distinct"] == pytest.approx(1000, rel=0.05)
    assert got["union_distinct"] == pytest.approx(1500, rel=0.05)
    assert got["intersection_est"] == pytest.approx(500, rel=0.15)
    assert got["jaccard_est"] == pytest.approx(1 / 3, rel=0.15)


def test_corpus_profile_one_pass(spark, docs):
    got = corpus_profile(docs).first()
    assert got["rows"] == docs.count()
    exact_ids = docs.select(F.countDistinct("doc_id")).first()[0]
    assert got["approx_distinct_ids"] == pytest.approx(exact_ids, rel=0.05)
    # text digests: distinct texts <= rows, and the sketch must agree
    # with the exact digest count (the gap to `rows` is exact-dup mass)
    exact_texts = docs.select(F.countDistinct(F.md5("text"))).first()[0]
    assert got["approx_distinct_texts"] == pytest.approx(exact_texts, rel=0.05)
    assert got["tokens_p5"] <= got["tokens_p9"] <= got["tokens_p99"] <= got["tokens_max"]
    assert got["tokens_mean"] > 0


def test_profile_of_empty_corpus_is_null_not_crash(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    got = corpus_profile(empty).first()
    assert got["rows"] == 0
    assert got["tokens_p5"] is None and got["tokens_p99"] is None
    lq = length_quantiles(empty.select(F.length("text").alias("n")), "n").first()
    assert lq["p5"] is None
