"""PSA: the automaton materialization of a PST (E9,
model/vmm/pst/psa/ProbSuffixAutomaton.scala + PST2PSA conversion).

States are the PST's leaf labels; reading symbol sigma from leaf w
moves to the deepest tree node for (sigma :: w).  When the tree is
"transition proper" (every such walk ends in a leaf —
PredictionSuffixTree.isTransitionProper:317-321) the result is a
closed automaton; otherwise the construction extends the state set
with the interior nodes reached, mirroring the reference's
extended-automaton fallback (transient states that drain into the
recurrent leaf class within maxOrder steps).

The primary engine path remains SPST (the reference's Flink job uses
it, WayebEngine.java:154-193); PSA serves analysis — stationary
distributions, explicit transition matrices — and the SPSA cross-check.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from flink_rtcef_spark.models.pst import PredictionSuffixTree


@dataclass
class PSA:
    labels: list[tuple[int, ...]]  # state id -> context label
    trans: np.ndarray  # [n_states, n_symbols] next-state ids
    probs: np.ndarray  # [n_states, n_symbols] transition probabilities
    index: dict[tuple[int, ...], int]

    @property
    def n_states(self) -> int:
        return len(self.labels)

    def next_state(self, state: int, symbol: int) -> int:
        return int(self.trans[state, symbol])

    def transition_matrix(self) -> np.ndarray:
        """Row-stochastic state-to-state matrix (sums symbol probs per
        target)."""
        m = np.zeros((self.n_states, self.n_states))
        for s in range(self.n_states):
            for sym in range(self.probs.shape[1]):
                m[s, self.trans[s, sym]] += self.probs[s, sym]
        return m

    def stationary_distribution(self, iters: int = 200) -> np.ndarray:
        """Power-iteration stationary distribution of the chain."""
        m = self.transition_matrix()
        pi = np.full(self.n_states, 1.0 / self.n_states)
        for _ in range(iters):
            pi = pi @ m
        return pi / pi.sum()


def psa_from_pst(pst: PredictionSuffixTree) -> PSA:
    """Build the PSA by closure: start from every PST node label (leaves
    are the recurrent class; interior nodes appear only as transient
    states when the tree is not transition proper) and follow
    sigma::label walks until closed."""
    symbols = pst.symbols
    index: dict[tuple[int, ...], int] = {}
    labels: list[tuple[int, ...]] = []

    def intern(label: tuple[int, ...]) -> int:
        if label not in index:
            index[label] = len(labels)
            labels.append(label)
        return index[label]

    # seed with leaves (the recurrent class)
    for leaf in pst.root.leaves():
        intern(leaf.label)
    rows: list[list[int]] = []
    prows: list[list[float]] = []
    i = 0
    while i < len(labels):
        label = labels[i]
        node = pst.walk(label)
        row, prow = [], []
        for sym in symbols:
            nxt = pst.walk((sym, *label)).label
            row.append(intern(nxt))
            prow.append(node.dist.get(sym, 0.0))
        rows.append(row)
        prows.append(prow)
        i += 1
    return PSA(
        labels=labels,
        trans=np.array(rows, dtype=np.int32),
        probs=np.array(prows),
        index=index,
    )
