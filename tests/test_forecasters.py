"""E10 secondary forecasters + remaining wt interval methods."""

from __future__ import annotations

import pytest

from flink_rtcef_spark.models.cst import CounterSuffixTree
from flink_rtcef_spark.models.forecasters import (
    MeanEstimator,
    NextForecaster,
    RandomForecaster,
)
from flink_rtcef_spark.models.pst import learn_pst
from flink_rtcef_spark.models.wt import WtDistribution


def test_next_forecaster_abracadabra():
    # symbols 0..4 = A B C D R; after context "ca" (=(A,C)) next is D
    seq = [0, 1, 4, 0, 2, 0, 3, 0, 1, 4, 0]
    cst = CounterSuffixTree.from_sequence(seq, max_order=12)
    pst = learn_pst(cst, [0, 1, 2, 3, 4], 12, 0.001, 0.01, 0.001, 1.05)
    nf = NextForecaster(pst)
    sym, prob = nf.predict_next((0, 2))  # context "ca"
    assert sym == 3 and prob > 0.9  # D with ~0.996
    sym, prob = nf.predict_next((1,))  # context "b" -> R
    assert sym == 4
    top = nf.top_k((0,), k=2)  # after "a": B most likely, then C/D
    assert top[0][0] == 1


def test_random_forecaster_baseline():
    rf = RandomForecaster(horizon=20, spread=5, seed=42)
    fcs = [rf.forecast() for _ in range(50)]
    assert all(1 <= f.start <= f.end <= 25 for f in fcs)
    assert all(f.end - f.start == 5 for f in fcs)
    # deterministic under the seed
    rf2 = RandomForecaster(horizon=20, spread=5, seed=42)
    fcs2 = [rf2.forecast() for _ in range(50)]
    assert [(f.start, f.prob) for f in fcs] == [(f.start, f.prob) for f in fcs2]


def test_mean_estimator():
    wt = WtDistribution({1: 0.5, 2: 0.25, 3: 0.25})
    me = MeanEstimator({0: wt, 1: WtDistribution({})})
    assert me.remaining(0) == pytest.approx(1.75)
    assert me.remaining(1) == -1.0
    assert me.remaining(99) == -1.0
    assert me.table()[0] == pytest.approx(1.75)


def test_classify_win_method():
    wt = WtDistribution({i: p for i, p in enumerate([0.1, 0.1, 0.4, 0.2, 0.1, 0.1], start=1)})
    fc = wt.forecast("classify_win", confidence_threshold=0.6, spread=2, center=3)
    assert (fc.start, fc.end) == (2, 4)
    assert fc.prob == pytest.approx(0.7)
    assert fc.positive
    # center near the left edge clamps to 1
    fc2 = wt.forecast("classify_win", confidence_threshold=0.9, spread=4, center=1)
    assert fc2.start == 1
    assert not fc2.positive
