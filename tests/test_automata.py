"""Automata equivalence tests — the reference's dominant test pattern
(Specs/symbolic/engine/SNFAeqSDFA.scala:21-69): random formulas +
random streams, two independent implementations, identical results.

Here: direct NFA simulation (plans/automata.NFA.accepts) vs the
subset-constructed SDFA, plus a brute-force suffix oracle for streaming
detection positions.
"""

from __future__ import annotations

import random

import pytest

from flink_rtcef_spark.plans.automata import (
    build_minterms,
    build_nfa,
    determinize,
    disambiguate,
    formula_alphabet,
    set_nonoverlap,
)
from flink_rtcef_spark.plans.rewrite import apply_selection
from flink_rtcef_spark.plans.sre_ast import (
    Choice,
    Declarations,
    Iter,
    Neg,
    Predicate,
    Sent,
    Seq,
)

ATOMS = [Predicate("IsEventTypePredicate", (t,)) for t in ("A", "B", "C")]


def random_formula(rng: random.Random, depth: int = 0):
    choices = ["sent", "seq", "choice", "iter"]
    if depth < 2:
        choices.append("neg")
    kind = rng.choice(choices if depth < 3 else ["sent"])
    if kind == "sent":
        return Sent(rng.choice(ATOMS))
    if kind == "seq":
        return Seq(tuple(random_formula(rng, depth + 1) for _ in range(rng.randint(2, 3))))
    if kind == "choice":
        return Choice(tuple(random_formula(rng, depth + 1) for _ in range(rng.randint(2, 3))))
    if kind == "iter":
        return Iter(random_formula(rng, depth + 1))
    return Neg(random_formula(rng, depth + 1))


# Event streams over types A/B/C map to minterm symbols: with the three
# event-type atoms mutually exclusive by construction of the stream,
# declare them exclusive so each event maps to exactly one minterm.
EXCLUSIVE = Declarations(extras=[list(ATOMS)], exclusives=[list(ATOMS)])


def type_to_symbol(minterms, t: str) -> int:
    key = Predicate("IsEventTypePredicate", (t,)).key()
    for i, mt in enumerate(minterms):
        d = mt.as_dict()
        if d[key] and sum(d.values()) == 1:
            return i
    raise AssertionError("missing minterm")


@pytest.mark.parametrize("seed", range(20))
def test_nfa_sdfa_equivalence_random(seed):
    rng = random.Random(seed)
    formula = random_formula(rng)
    atoms, minterms = formula_alphabet(formula, EXCLUSIVE)
    nfa = build_nfa(formula, minterms, streaming=False)
    sdfa = determinize(nfa, len(minterms))
    for _ in range(30):
        word = [
            type_to_symbol(minterms, rng.choice("ABC"))
            for _ in range(rng.randint(0, 8))
        ]
        assert nfa.accepts(word) == sdfa.accepts(word), (formula, word)


@pytest.mark.parametrize("seed", range(10))
def test_streaming_detections_match_suffix_oracle(seed):
    """Streaming SDFA is final at position t iff some suffix w[s..t] is
    in the pattern language (the implicit Sigma*;f semantics)."""
    rng = random.Random(100 + seed)
    formula = random_formula(rng)
    atoms, minterms = formula_alphabet(formula, EXCLUSIVE)
    plain = build_nfa(formula, minterms, streaming=False)
    stream_sdfa = determinize(build_nfa(formula, minterms, streaming=True), len(minterms))
    word = [type_to_symbol(minterms, rng.choice("ABC")) for _ in range(25)]
    state = stream_sdfa.start
    for t in range(len(word)):
        state = int(stream_sdfa.delta[state, word[t]])
        detected = state in stream_sdfa.finals
        # s ranges to t+1: the empty suffix counts (a formula with
        # epsilon in its language is final at every position — the
        # start-state closure contains the final state)
        oracle = any(plain.accepts(word[s : t + 1]) for s in range(t + 2))
        assert detected == oracle, (formula, t)


def test_skip_till_any_rewrite_semantics():
    """#(;(A,B)) must match A...B with anything between, nothing else
    contiguity-wise (SelectionUtils: R1;T*;R2)."""
    from flink_rtcef_spark.plans.sre_ast import SkipTillAny

    f = apply_selection(SkipTillAny(Seq((Sent(ATOMS[0]), Sent(ATOMS[1])))))
    atoms, minterms = formula_alphabet(f, EXCLUSIVE)
    nfa = build_nfa(f, minterms, streaming=False)
    a = type_to_symbol(minterms, "A")
    b = type_to_symbol(minterms, "B")
    c = type_to_symbol(minterms, "C")
    assert nfa.accepts([a, b])
    assert nfa.accepts([a, c, c, b])
    assert not nfa.accepts([a, c, c])
    assert not nfa.accepts([c, b])


def test_skip_till_next_rewrite_semantics():
    """@(;(A,B)): between A and B no other B may occur (skip till the
    NEXT B; SelectionUtils: R1;!(T*;R2;T*);R2)."""
    from flink_rtcef_spark.plans.sre_ast import SkipTillNext

    f = apply_selection(SkipTillNext(Seq((Sent(ATOMS[0]), Sent(ATOMS[1])))))
    atoms, minterms = formula_alphabet(f, EXCLUSIVE)
    nfa = build_nfa(f, minterms, streaming=False)
    a = type_to_symbol(minterms, "A")
    b = type_to_symbol(minterms, "B")
    c = type_to_symbol(minterms, "C")
    assert nfa.accepts([a, b])
    assert nfa.accepts([a, c, b])
    # an intermediate B means the first B was skipped — not allowed
    assert not nfa.accepts([a, b, c, b])


def test_exclusives_prune_minterms():
    minterms_all = build_minterms(ATOMS, None)
    minterms_pruned = build_minterms(ATOMS, EXCLUSIVE)
    assert len(minterms_all) == 8
    # at most one of three may hold: 1 all-false + 3 single-true
    assert len(minterms_pruned) == 4


def test_disambiguation_unique_histories():
    formula = Seq((Sent(ATOMS[0]), Sent(ATOMS[1])))
    atoms, minterms = formula_alphabet(formula, EXCLUSIVE)
    sdfa = determinize(build_nfa(formula, minterms, streaming=True), len(minterms))
    m = 2
    dis = disambiguate(sdfa, m)
    # every state's recorded history is unique and matches simulation
    assert len(set(dis.history.values())) == len(dis.history)
    rng = random.Random(0)
    word = [type_to_symbol(minterms, rng.choice("ABC")) for _ in range(30)]
    state = dis.start
    for t, sym in enumerate(word):
        state = int(dis.delta[state, sym])
        expected_hist = tuple(word[max(0, t + 1 - m) : t + 1])
        assert dis.history[state] == expected_hist
    # language is preserved
    for _ in range(30):
        w = [type_to_symbol(minterms, rng.choice("ABC")) for _ in range(rng.randint(0, 10))]
        assert sdfa.accepts(w) == dis.accepts(w)


def test_nonoverlap_resets_from_finals():
    # A;B with nonoverlap: after a match, the next match cannot reuse
    # the final event — A,B,B,A,B gives matches at positions 1 and 4
    # either way, but A,B,A,B vs overlapping A,(B,A),B distinguish...
    formula = Seq((Sent(ATOMS[0]), Sent(ATOMS[0])))  # A;A
    atoms, minterms = formula_alphabet(formula, EXCLUSIVE)
    sdfa = determinize(build_nfa(formula, minterms, streaming=True), len(minterms))
    non = set_nonoverlap(sdfa)
    a = type_to_symbol(minterms, "A")
    word = [a, a, a]

    def detections(d):
        s, out = d.start, []
        for t, sym in enumerate(word):
            s = int(d.delta[s, sym])
            if s in d.finals:
                out.append(t)
        return out

    assert detections(sdfa) == [1, 2]  # overlapping: AA at 1, AA at 2
    assert detections(non) == [1]  # nonoverlap: second A consumed
