"""Symbolic automata: minterm alphabet, Thompson NFA, subset-construction
SDFA, m-unambiguity disambiguation, count-policy transform.

The reference builds these in fsm/symbolic/ (SNFAUtils.scala:65-115,
Determinizer.scala:23-60, Disambiguator.scala:60-236, LogicUtils.scala
:45-183 for minterms).  Same semantics here, but built directly over the
finite minterm alphabet: every sentence leaf denotes the set of minterms
satisfying it, so complement is plain DFA complementation — no symbolic
satisfiability machinery needed.

Everything here is driver-side and tiny; the compiled SDFA ships to
executors as two numpy arrays (delta, take) + a finals bitmap.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import product

import numpy as np

from flink_rtcef_spark.plans.sre_ast import (
    Choice,
    Declarations,
    Empty,
    Formula,
    Iter,
    Neg,
    Predicate,
    Sent,
    Seq,
    formula_atoms,
)

EPS = -1  # epsilon label


# ------------------------------------------------------------------ minterms
@dataclass(frozen=True)
class Minterm:
    """One complete truth assignment over the atomic predicates."""

    assignment: tuple[tuple[str, bool], ...]  # (atom key, value), sorted

    def as_dict(self) -> dict[str, bool]:
        return dict(self.assignment)


def build_minterms(
    atoms: list[Predicate], declarations: Declarations | None = None
) -> list[Minterm]:
    """Enumerate the alphabet: all assignments over the atoms, pruned by
    exclusives declarations (assignments where >=2 predicates of an
    exclusive set hold are unsatisfiable by assumption and dropped —
    LogicUtils.buildMinTermsForExclusives:183, docs/lang.md:156-166)."""
    keys = [a.key() for a in atoms]
    exclusive_sets: list[list[str]] = []
    for exc in (declarations.exclusives if declarations else []):
        exclusive_sets.append([p.key() for p in exc])
    minterms = []
    for values in product([False, True], repeat=len(keys)):
        assignment = dict(zip(keys, values))
        ok = all(
            sum(assignment.get(k, False) for k in exc) <= 1 for exc in exclusive_sets
        )
        if ok:
            minterms.append(Minterm(tuple(sorted(assignment.items()))))
    return minterms


# ----------------------------------------------------------------------- NFA
@dataclass
class NFA:
    """Thompson NFA over the minterm alphabet.  Transitions are
    (src, label, dst, take) with label = EPS or a frozenset of symbol
    ids; ``take`` marks match-participating transitions
    (TransitionOutput.scala:5-10)."""

    n_states: int
    transitions: list[tuple[int, object, int, bool]]
    start: int
    finals: set[int]

    def eps_closure(self, states: frozenset[int]) -> frozenset[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for src, label, dst, _ in self.transitions:
                if src == s and label == EPS and dst not in seen:
                    seen.add(dst)
                    stack.append(dst)
        return frozenset(seen)

    def accepts(self, word: list[int]) -> bool:
        """Direct NFA simulation — the independent implementation used by
        the equivalence tests (SNFAeqSDFA.scala:21-69 pattern)."""
        cur = self.eps_closure(frozenset([self.start]))
        for sym in word:
            nxt = set()
            for src, label, dst, _ in self.transitions:
                if src in cur and label != EPS and sym in label:
                    nxt.add(dst)
            cur = self.eps_closure(frozenset(nxt))
            if not cur:
                return False
        return bool(cur & self.finals)


class _Builder:
    def __init__(self, n_symbols: int):
        self.n = 0
        self.transitions: list[tuple[int, object, int, bool]] = []
        self.n_symbols = n_symbols

    def new_state(self) -> int:
        self.n += 1
        return self.n - 1

    def add(self, src: int, label, dst: int, take: bool = False) -> None:
        self.transitions.append((src, label, dst, take))


def _sentence_symbols(sentence, minterms: list[Minterm]) -> frozenset[int]:
    return frozenset(
        i for i, mt in enumerate(minterms) if sentence.eval(mt.as_dict())
    )


def build_nfa(
    formula: Formula, minterms: list[Minterm], streaming: bool = True
) -> NFA:
    """Thompson construction (SNFAUtils.buildSNFA semantics).  With
    ``streaming``, wrap with a new start state carrying a TRUE self-loop
    (IGNORE) + epsilon into the pattern (buildSNFAForStream:65-91) so
    matching restarts at every event — the implicit Sigma*;f."""
    b = _Builder(len(minterms))

    def frag(f: Formula) -> tuple[int, int]:
        """Build fragment, return (in, out)."""
        if isinstance(f, Sent):
            i, o = b.new_state(), b.new_state()
            syms = _sentence_symbols(f.sentence, minterms)
            b.add(i, syms, o, take=f.marked)
            return i, o
        if isinstance(f, Empty):
            i, o = b.new_state(), b.new_state()
            b.add(i, EPS, o)
            return i, o
        if isinstance(f, Seq):
            ins_outs = [frag(c) for c in f.children]
            for (_, o1), (i2, _) in zip(ins_outs, ins_outs[1:]):
                b.add(o1, EPS, i2)
            return ins_outs[0][0], ins_outs[-1][1]
        if isinstance(f, Choice):
            i, o = b.new_state(), b.new_state()
            for c in f.children:
                ci, co = frag(c)
                b.add(i, EPS, ci)
                b.add(co, EPS, o)
            return i, o
        if isinstance(f, Iter):
            i, o = b.new_state(), b.new_state()
            ci, co = frag(f.child)
            b.add(i, EPS, ci)
            b.add(co, EPS, ci)
            b.add(i, EPS, o)
            b.add(co, EPS, o)
            return i, o
        if isinstance(f, Neg):
            # complement: determinize the sub-fragment over the minterm
            # alphabet, complete it, swap finals, then inline as an NFA
            # fragment with a fresh out state.  Complement-derived
            # transitions are IGNORE (SNFAUtils.scala:327).
            sub = build_nfa(f.child, minterms, streaming=False)
            dfa = determinize(sub, len(minterms))
            i = b.new_state()
            state_map = {
                s: (i if s == dfa.start else b.new_state()) for s in range(dfa.n_states)
            }
            o = b.new_state()
            for s in range(dfa.n_states):
                for sym in range(len(minterms)):
                    t = dfa.delta[s, sym]
                    b.add(state_map[s], frozenset([sym]), state_map[t], take=False)
            for s in range(dfa.n_states):
                if s not in dfa.finals:  # complement finals
                    b.add(state_map[s], EPS, o)
            return i, o
        raise TypeError(f"cannot build NFA from {type(f)} (rewrite first)")

    fi, fo = frag(formula)
    final = b.new_state()
    b.add(fo, EPS, final)
    start = fi
    if streaming:
        s = b.new_state()
        b.add(s, frozenset(range(len(minterms))), s, take=False)  # TRUE self-loop, IGNORE
        b.add(s, EPS, fi)
        start = s
    return NFA(n_states=b.n, transitions=b.transitions, start=start, finals={final})


# ---------------------------------------------------------------------- SDFA
@dataclass
class SDFA:
    """Deterministic symbolic automaton over the minterm alphabet.

    delta[state, symbol] -> state; take[state, symbol] -> bool (the
    event participates in the match); finals: accepting states.
    ``history`` (after disambiguation) maps state -> tuple of last-m
    symbols, unique per state.
    """

    delta: np.ndarray  # int32 [n_states, n_symbols]
    take: np.ndarray  # bool  [n_states, n_symbols]
    start: int
    finals: set[int]
    history: dict[int, tuple[int, ...]] = field(default_factory=dict)

    @property
    def n_states(self) -> int:
        return int(self.delta.shape[0])

    @property
    def n_symbols(self) -> int:
        return int(self.delta.shape[1])

    def accepts(self, word: list[int]) -> bool:
        s = self.start
        for sym in word:
            s = int(self.delta[s, sym])
        return s in self.finals


def determinize(nfa: NFA, n_symbols: int) -> SDFA:
    """Subset construction (Determinizer.scala:23-60 semantics).  A DFA
    transition is TAKE iff any contributing NFA transition is TAKE.
    The empty subset is the (non-final) dead state — the automaton is
    complete by construction."""
    # index transitions by source for speed
    by_src: dict[int, list[tuple[object, int, bool]]] = {}
    for src, label, dst, take in nfa.transitions:
        by_src.setdefault(src, []).append((label, dst, take))

    start_set = nfa.eps_closure(frozenset([nfa.start]))
    subsets: dict[frozenset[int], int] = {start_set: 0}
    order = [start_set]
    delta_rows: list[list[int]] = []
    take_rows: list[list[bool]] = []
    i = 0
    while i < len(order):
        cur = order[i]
        row = [0] * n_symbols
        trow = [False] * n_symbols
        moves: dict[int, set[int]] = {s: set() for s in range(n_symbols)}
        takes: dict[int, bool] = {s: False for s in range(n_symbols)}
        for st in cur:
            for label, dst, take in by_src.get(st, []):
                if label == EPS:
                    continue
                for sym in label:
                    moves[sym].add(dst)
                    if take:
                        takes[sym] = True
        for sym in range(n_symbols):
            nxt = nfa.eps_closure(frozenset(moves[sym])) if moves[sym] else frozenset()
            if nxt not in subsets:
                subsets[nxt] = len(order)
                order.append(nxt)
            row[sym] = subsets[nxt]
            trow[sym] = takes[sym] if moves[sym] else False
        delta_rows.append(row)
        take_rows.append(trow)
        i += 1
    finals = {idx for sub, idx in subsets.items() if sub & nfa.finals}
    return SDFA(
        delta=np.array(delta_rows, dtype=np.int32),
        take=np.array(take_rows, dtype=bool),
        start=0,
        finals=finals,
    )


def disambiguate(sdfa: SDFA, m: int) -> SDFA:
    """m-unambiguity (Disambiguator.scala:60-236 semantics): every state
    must have a unique length-m incoming symbol history, required for an
    order-m Markov chain on states.  Construction: product of the SDFA
    with the last-min(len,m) symbol word; each product state's history
    is unique by construction; reachable part only."""
    if m <= 0:
        return sdfa
    start_key = (sdfa.start, ())
    index: dict[tuple[int, tuple[int, ...]], int] = {start_key: 0}
    order = [start_key]
    delta_rows: list[list[int]] = []
    take_rows: list[list[bool]] = []
    i = 0
    while i < len(order):
        state, hist = order[i]
        row = [0] * sdfa.n_symbols
        trow = [False] * sdfa.n_symbols
        for sym in range(sdfa.n_symbols):
            nstate = int(sdfa.delta[state, sym])
            nhist = (hist + (sym,))[-m:]
            key = (nstate, nhist)
            if key not in index:
                index[key] = len(order)
                order.append(key)
            row[sym] = index[key]
            trow[sym] = bool(sdfa.take[state, sym])
        delta_rows.append(row)
        take_rows.append(trow)
        i += 1
    finals = {idx for (st, _), idx in index.items() if st in sdfa.finals}
    history = {idx: hist for (st, hist), idx in index.items()}
    return SDFA(
        delta=np.array(delta_rows, dtype=np.int32),
        take=np.array(take_rows, dtype=bool),
        start=0,
        finals=finals,
        history=history,
    )


def set_nonoverlap(sdfa: SDFA) -> SDFA:
    """NONOVERLAP count policy (SDFAUtils.setPolicy/getNonoverlap):
    after a full match the automaton behaves as if restarted — every
    final state's outgoing transitions are replaced by the start
    state's."""
    delta = sdfa.delta.copy()
    take = sdfa.take.copy()
    for f in sdfa.finals:
        delta[f, :] = sdfa.delta[sdfa.start, :]
        take[f, :] = sdfa.take[sdfa.start, :]
    return SDFA(delta=delta, take=take, start=sdfa.start, finals=set(sdfa.finals), history=dict(sdfa.history))


def formula_alphabet(
    formula: Formula, declarations: Declarations | None = None
) -> tuple[list[Predicate], list[Minterm]]:
    """Atoms (pattern + extras declarations) and the pruned minterm
    alphabet (extras enlarge the alphabet for forecasting-relevant
    distinctions — SREUtils.sre2formulas:87-94)."""
    atoms = formula_atoms(formula)
    seen = {a.key() for a in atoms}
    for extra_set in (declarations.extras if declarations else []):
        for p in extra_set:
            if p.key() not in seen:
                seen.add(p.key())
                atoms.append(p)
    return atoms, build_minterms(atoms, declarations)
