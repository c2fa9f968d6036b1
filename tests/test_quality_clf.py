"""Learned quality gate: training separates the slices, scoring ranks
held-out docs correctly, the filter keeps what it should, and the
scoring plan is a single map-side pass (no Exchange)."""

from __future__ import annotations

import re

import pytest


def _slices(spark):
    pos = spark.createDataFrame(
        [(i, "thoughtful long form analysis with careful structured argument "
             f"and precise technical vocabulary edition {i}") for i in range(30)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(100 + i, f"click here buy now free offer winner {i} " * 3)
         for i in range(30)],
        "doc_id long, text string",
    )
    return pos, neg


def test_classifier_separates_and_ranks(spark):
    from flink_rtcef_spark.operators.quality_clf import (
        score_quality,
        train_quality_classifier,
    )

    pos, neg = _slices(spark)
    model = train_quality_classifier(pos, neg)
    held = spark.createDataFrame(
        [
            (1000, "careful structured technical analysis with precise argument"),
            (1001, "free offer click here winner buy now"),
        ],
        "doc_id long, text string",
    )
    probs = {r["doc_id"]: r["quality_prob"] for r in score_quality(held, model).collect()}
    assert probs[1000] > 0.5 > probs[1001]


def test_classifier_filter_keeps_above_threshold(spark):
    from flink_rtcef_spark.operators.quality_clf import (
        classifier_filter,
        train_quality_classifier,
    )

    pos, neg = _slices(spark)
    model = train_quality_classifier(pos, neg)
    mixed = pos.limit(5).unionByName(neg.limit(5))
    kept = sorted(r["doc_id"] for r in classifier_filter(mixed, model, 0.5).collect())
    assert kept == [0, 1, 2, 3, 4]


def test_scoring_plan_is_map_side(spark):
    """Scoring must not shuffle: tokenize + hash + broadcast-coefficient
    dot product all ride in one map stage."""
    from flink_rtcef_spark.operators.quality_clf import (
        score_quality,
        train_quality_classifier,
    )

    pos, neg = _slices(spark)
    model = train_quality_classifier(pos, neg)
    df = score_quality(pos, model)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert not re.findall(r"\(\d+\) Exchange", plan)
