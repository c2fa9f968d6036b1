"""Classical char-alphabet FA (SURVEY.md §2.D D8) — the reference's
test-scaffolding stack, mirrored with its own randomized equivalence
spec (Specs/classical/nfa/NFA2DFA.scala pattern): for random regexp
trees and every short word, the Thompson NFA, the epsilon-eliminated
NFA, and the subset-construction DFA must all agree — and all three
must agree with Python ``re`` as a fourth independent oracle (the
reference checks against Aho-Corasick DFAs; ``re`` plays that
external-ground-truth role here)."""

from __future__ import annotations

import itertools
import random
import re

import pytest

from flink_rtcef_spark.plans.classical import (
    build_classical_nfa,
    concat,
    eliminate_epsilon,
    parse_regexp,
    star,
    sym,
    to_dfa,
    to_python_regex,
    tree_symbols,
    union,
)

ALPHABET = ("a", "b", "c")


def _random_tree(rnd: random.Random, depth: int):
    """PatternGenerator.generateRegExpPatterns shape: random nesting of
    CONCAT/UNION/ITER over a small symbol set."""
    if depth <= 0 or rnd.random() < 0.3:
        return sym(rnd.choice(ALPHABET))
    op = rnd.choice(("CONCAT", "UNION", "ITER"))
    if op == "ITER":
        return star(_random_tree(rnd, depth - 1))
    f = concat if op == "CONCAT" else union
    return f(_random_tree(rnd, depth - 1), _random_tree(rnd, depth - 1))


def _all_words(max_len: int):
    for n in range(max_len + 1):
        yield from ("".join(w) for w in itertools.product(ALPHABET, repeat=n))


def test_nfa_eliminated_dfa_and_re_agree_randomized():
    rnd = random.Random(42)
    words = list(_all_words(4))
    for _ in range(15):
        tree = _random_tree(rnd, 4)
        nfa = build_classical_nfa(tree, extra_symbols=set(ALPHABET))
        elim = eliminate_epsilon(nfa)
        dfa = to_dfa(nfa)
        rx = re.compile(to_python_regex(tree))
        for w in words:
            want = rx.fullmatch(w) is not None
            assert nfa.accepts(w) == want, (tree, w)
            assert elim.accepts(w) == want, (tree, w)
            assert dfa.accepts(w) == want, (tree, w)


def test_eliminated_nfa_has_no_epsilon():
    from flink_rtcef_spark.plans.automata import EPS

    tree = parse_regexp("a(b|c)*a|cc*")
    elim = eliminate_epsilon(build_classical_nfa(tree))
    assert all(label != EPS for _, label, _, _ in elim.core.transitions)


def test_parse_regexp_known_languages():
    cases = [
        ("(ab)*", {"": True, "ab": True, "abab": True, "aba": False, "ba": False}),
        ("a(b|c)*", {"a": True, "abc": True, "acb": True, "b": False, "": False}),
        ("a|b*", {"": True, "a": True, "bbb": True, "ab": False}),
    ]
    for pat, verdicts in cases:
        dfa = to_dfa(build_classical_nfa(parse_regexp(pat)))
        for w, want in verdicts.items():
            assert dfa.accepts(w) == want, (pat, w)
    with pytest.raises(ValueError, match="unbalanced"):
        parse_regexp("(ab")
    with pytest.raises(ValueError, match="unexpected"):
        parse_regexp("*a")


def test_disambiguated_dfa_is_m_unambiguous_and_language_preserving():
    """DisSpec.scala semantics: after disambiguation every state has a
    unique length-m incoming history, and the language is unchanged."""
    rnd = random.Random(7)
    words = list(_all_words(4))
    for _ in range(8):
        tree = _random_tree(rnd, 3)
        nfa = build_classical_nfa(tree, extra_symbols=set(ALPHABET))
        plain = to_dfa(nfa)
        for m in (1, 2):
            dis = to_dfa(nfa, m=m)
            assert all(dis.accepts(w) == plain.accepts(w) for w in words)
            # the m-unambiguity invariant (Disambiguator.isMUnambiguous):
            # every path reaching a state carries the SAME last-m
            # symbols — i.e. the incoming history is a function of the
            # state.  Verify by simulation over all words.
            ids = dis._ids
            seen: dict[int, tuple[int, ...]] = {}
            for w in words:
                s, syms = 0, []
                for ch in w:
                    i = ids[ch]
                    syms.append(i)
                    s = int(dis.core.delta[s, i])
                    if len(syms) < m:
                        continue
                    suffix = tuple(syms[-m:])
                    assert seen.setdefault(s, suffix) == suffix, (tree, m, w)
                    assert dis.core.history[s] == suffix, (tree, m, w)


def test_unknown_symbol_never_accepted():
    dfa = to_dfa(build_classical_nfa(parse_regexp("ab*")))
    assert dfa.accepts("abb")
    assert not dfa.accepts("abz")  # z was never in any alphabet
    assert tree_symbols(parse_regexp("ab*")) == {"a", "b"}
