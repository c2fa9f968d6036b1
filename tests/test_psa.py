"""PSA materialization: rows stochastic, walks agree with the PST, and
the stationary distribution matches the empirical symbol frequencies of
the generating source."""

from __future__ import annotations

import random

import numpy as np
import pytest

from flink_rtcef_spark.models.cst import CounterSuffixTree
from flink_rtcef_spark.models.psa import psa_from_pst
from flink_rtcef_spark.models.pst import learn_pst


def _pst_from_seq(seq, symbols, order):
    cst = CounterSuffixTree.from_sequence(seq, max_order=order)
    return learn_pst(cst, symbols, order, 1e-4, 0.0, 1e-3, 1.05, with_missing=True)


def test_psa_rows_stochastic_and_closed():
    rng = random.Random(5)
    seq = [rng.choice([0, 1, 2]) for _ in range(5000)]
    pst = _pst_from_seq(seq, [0, 1, 2], order=2)
    psa = psa_from_pst(pst)
    assert psa.n_states >= len(pst.root.leaves())
    # every transition target is a valid state (closure complete)
    assert psa.trans.min() >= 0 and psa.trans.max() < psa.n_states
    # rows are probability distributions (gamma-smoothed, all symbols)
    np.testing.assert_allclose(psa.probs.sum(axis=1), 1.0, atol=1e-9)


def test_psa_walk_agrees_with_pst():
    rng = random.Random(6)
    seq = [rng.choice([0, 1]) for _ in range(3000)]
    pst = _pst_from_seq(seq, [0, 1], order=3)
    psa = psa_from_pst(pst)
    # drive both with the same word; PSA state label must equal the
    # PST's deepest node for the accumulated context
    state = psa.index[pst.root.leaves()[0].label]
    context = list(pst.root.leaves()[0].label)
    for sym in [rng.choice([0, 1]) for _ in range(200)]:
        state = psa.next_state(state, sym)
        context = [sym] + context
        assert psa.labels[state] == pst.walk(tuple(context)).label


def test_stationary_matches_source_frequencies():
    """Biased i.i.d. source P(1)=0.7: the stationary distribution of the
    PSA, projected onto next-symbol emission, must recover ~0.7."""
    rng = random.Random(7)
    seq = [1 if rng.random() < 0.7 else 0 for _ in range(20000)]
    pst = _pst_from_seq(seq, [0, 1], order=1)
    psa = psa_from_pst(pst)
    pi = psa.stationary_distribution()
    p1 = sum(
        pi[s] * psa.probs[s, 1] for s in range(psa.n_states)
    )
    assert p1 == pytest.approx(0.7, abs=0.02)
