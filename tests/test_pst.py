"""VMM model tests: ABRACADABRA golden (Begleiter et al. Fig. 5, the
reference's own golden test — Specs/vmm/PST.scala:29-90), CST
semantics, and the distributed-vs-local CST equivalence."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from flink_rtcef_spark.models.cst import (
    CounterSuffixTree,
    cst_counts_spark,
)
from flink_rtcef_spark.models.pst import learn_pst

# symbols 0..4 = A B C D R
ABRA = [0, 1, 4, 0, 2, 0, 3, 0, 1, 4, 0]
A, B, C, D, R = range(5)


def abra_pst():
    cst = CounterSuffixTree.from_sequence(ABRA, max_order=12)
    return learn_pst(
        cst,
        symbols=[A, B, C, D, R],
        max_order=12,
        pmin=0.001,
        alpha=0.01,
        gamma_min=0.001,
        r=1.05,
        variant=True,
        with_missing=False,
    )


def test_cst_counts():
    cst = CounterSuffixTree.from_sequence(ABRA, max_order=12)
    assert cst.counter == 11
    assert cst.count((A,)) == 5
    assert cst.count((B,)) == 2
    # "AB" reversed = (B, A): B occurring right after A
    assert cst.count((B, A)) == 2
    assert cst.count((D, A)) == 1
    assert cst.count((R, B)) == 2
    assert cst.count((A, R, B, A)) == 2  # ABRA occurrences


def test_abracadabra_golden_distributions():
    pst = abra_pst()
    tol = 1e-3

    def dist_of(label):
        node = pst.walk(label)
        assert node.label == label
        return node.dist

    # root: smoothed global distribution
    root = dist_of(())
    assert root[A] == pytest.approx(5 / 11 * 0.995 + 0.001, abs=tol)
    assert root[B] == pytest.approx(2 / 11 * 0.995 + 0.001, abs=tol)
    # node "a": next-symbol dist B=0.498, C=0.25, D=0.25
    a = dist_of((A,))
    assert a[B] == pytest.approx(0.498, abs=tol)
    assert a[C] == pytest.approx(0.24975, abs=tol)
    assert a[D] == pytest.approx(0.24975, abs=tol)
    assert a[R] == pytest.approx(0.001, abs=tol)
    # node "ca" (label most-recent-first: (A, C)): always followed by D
    ca = dist_of((A, C))
    assert ca[D] == pytest.approx(0.996, abs=tol)
    # node "da" -> B
    assert dist_of((A, D))[B] == pytest.approx(0.996, abs=tol)
    # node "ra" -> C
    assert dist_of((A, R))[C] == pytest.approx(0.996, abs=tol)
    # node "b" -> R; "c" -> A; "d" -> A; "r" -> A
    assert dist_of((B,))[R] == pytest.approx(0.996, abs=tol)
    assert dist_of((C,))[A] == pytest.approx(0.996, abs=tol)
    assert dist_of((D,))[A] == pytest.approx(0.996, abs=tol)
    assert dist_of((R,))[A] == pytest.approx(0.996, abs=tol)


def test_abracadabra_tree_shape():
    pst = abra_pst()
    labels = set(pst.labels())
    # Fig. 5 tree: root, a, b, c, d, r, ca, da, ra
    assert labels == {(), (A,), (B,), (C,), (D,), (R,), (A, C), (A, D), (A, R)}


def test_pst_walk_nonblocking():
    pst = abra_pst()
    # deeper context than any node -> stops at deepest existing node
    assert pst.walk((A, C, A, R, B)).label == (A, C)
    # unknown start symbol -> root
    assert pst.walk(()).label == ()


def test_cst_spark_equals_local(spark):
    """Distributed count table == driver-side reference implementation,
    including per-key buffer isolation."""
    rng = random.Random(7)
    rows = []
    seqs = {}
    for key in ["k1", "k2", "k3"]:
        seq = [rng.randint(0, 3) for _ in range(rng.randint(5, 40))]
        seqs[key] = seq
        for t, s in enumerate(seq):
            rows.append((key, t + 1, t, s))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "ts", "event_id", "symbol"])
    )
    max_order = 3
    counts, total = cst_counts_spark(df, max_order)
    # local reference: per-key trees merged
    merged: dict[tuple[int, ...], int] = {}

    def collect(node, prefix):
        for sym, child in node.children.items():
            w = (*prefix, sym)
            merged[w] = merged.get(w, 0) + child.counter
            collect(child, w)

    local_total = 0
    for seq in seqs.values():
        t = CounterSuffixTree.from_sequence(seq, max_order)
        local_total += t.counter
        collect(t, ())
    assert total == local_total
    assert counts == merged
