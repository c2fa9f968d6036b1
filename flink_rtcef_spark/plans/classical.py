"""Classical (non-symbolic) regexp path: NFA/DFA over a character
alphabet — SURVEY.md §2.D D8.

The reference keeps a parallel classical automata stack
(fsm/classical/pattern/regexp/RegExpTree.scala,
fsm/classical/fa/nfa/NFAUtils.scala:26 ``buildNFA`` — Hopcroft et al.
§3.2.3 Thompson construction, fsm/classical/fa/nfa/Eliminator.scala —
epsilon elimination, fsm/classical/fa/dfa/DFAUtils.scala —
subset-construction conversion, fsm/classical/fa/dfa/Disambiguator.scala
— Nuel 2008 m-unambiguity) and uses it as TEST SCAFFOLDING: randomized
pattern/word equivalence specs (Specs/classical/nfa/NFA2DFA.scala,
Specs/classical/dfa/DisSpec.scala) pin the symbolic engine's semantics
against an independently-built classical automaton.

This engine's mirror is a thin adapter: a character is just a symbol
id, so the classical path REUSES the engine's integer-alphabet automata
core (plans/automata.py — Thompson ``NFA``, ``determinize``,
``disambiguate``), all of it already randomized-tested on the symbolic
side.  What this module adds is the char-alphabet front end (the
regexp tree, char<->symbol mapping, epsilon elimination as its own
step, word acceptance over strings) plus tests that cross-check all
three automata AND Python's ``re`` as a fourth independent oracle.

Everything here is driver-side compile machinery (automata are a few
dozen states); nothing touches the data plane, exactly like the
reference's classical layer.
"""

from __future__ import annotations

from dataclasses import dataclass

from flink_rtcef_spark.plans.automata import (
    EPS,
    NFA,
    SDFA,
    determinize,
    disambiguate,
)

# ------------------------------------------------------------------ tree
# RegExpTree.scala: SymbolNode(symbol) | OperatorNode(op, children),
# op in {CONCAT, UNION, ITER} (OperatorType.scala).


@dataclass(frozen=True)
class SymbolNode:
    symbol: str

    def __post_init__(self):
        if len(self.symbol) != 1:
            raise ValueError(f"classical symbols are single chars, got {self.symbol!r}")


@dataclass(frozen=True)
class OperatorNode:
    op: str  # CONCAT | UNION | ITER
    children: tuple

    def __post_init__(self):
        want = 1 if self.op == "ITER" else 2
        if self.op not in ("CONCAT", "UNION", "ITER"):
            raise ValueError(f"unknown operator {self.op!r}")
        if len(self.children) != want:
            raise ValueError(f"{self.op} takes {want} children, got {len(self.children)}")


RegExpTree = SymbolNode | OperatorNode


def sym(c: str) -> SymbolNode:
    return SymbolNode(c)


def concat(a: RegExpTree, b: RegExpTree) -> OperatorNode:
    return OperatorNode("CONCAT", (a, b))


def union(a: RegExpTree, b: RegExpTree) -> OperatorNode:
    return OperatorNode("UNION", (a, b))


def star(a: RegExpTree) -> OperatorNode:
    return OperatorNode("ITER", (a,))


def tree_symbols(tree: RegExpTree) -> set[str]:
    if isinstance(tree, SymbolNode):
        return {tree.symbol}
    out: set[str] = set()
    for c in tree.children:
        out |= tree_symbols(c)
    return out


def to_python_regex(tree: RegExpTree) -> str:
    """Ground-truth mapping for the equivalence tests (``re.fullmatch``
    is the fourth independent acceptance oracle)."""
    import re as _re

    if isinstance(tree, SymbolNode):
        return _re.escape(tree.symbol)
    if tree.op == "CONCAT":
        return "".join(f"(?:{to_python_regex(c)})" for c in tree.children)
    if tree.op == "UNION":
        return "|".join(f"(?:{to_python_regex(c)})" for c in tree.children)
    return f"(?:{to_python_regex(tree.children[0])})*"


def parse_regexp(s: str) -> RegExpTree:
    """Tiny convenience parser: chars, ``|``, ``*``, parens, implicit
    concatenation — enough to write the reference specs' patterns as
    strings."""
    pos = 0

    def peek() -> str | None:
        return s[pos] if pos < len(s) else None

    def alt() -> RegExpTree:
        nonlocal pos
        node = cat()
        while peek() == "|":
            pos += 1
            node = union(node, cat())
        return node

    def cat() -> RegExpTree:
        nonlocal pos
        node = unit()
        while peek() is not None and peek() not in ")|":
            node = concat(node, unit())
        return node

    def unit() -> RegExpTree:
        nonlocal pos
        c = peek()
        if c is None or c in ")|*":
            raise ValueError(f"unexpected {c!r} at {pos} in {s!r}")
        if c == "(":
            pos += 1
            node = alt()
            if peek() != ")":
                raise ValueError(f"unbalanced parens in {s!r}")
            pos += 1
        else:
            node = sym(c)
            pos += 1
        while peek() == "*":
            pos += 1
            node = star(node)
        return node

    node = alt()
    if pos != len(s):
        raise ValueError(f"trailing input at {pos} in {s!r}")
    return node


# ------------------------------------------------------------------ FA
class ClassicalFA:
    """A char-alphabet automaton: the integer-core automaton plus the
    char<->symbol-id mapping.  ``accepts`` takes a plain string; a char
    outside the build alphabet can never be accepted (the reference
    builds with the WORD's alphabet folded in — NFA2DFA.scala:31
    ``buildNFA(p, word.toSet)`` — pass ``extra_symbols`` for that)."""

    def __init__(self, core: NFA | SDFA, alphabet: list[str]):
        self.core = core
        self.alphabet = alphabet
        self._ids = {c: i for i, c in enumerate(alphabet)}

    def accepts(self, word: str) -> bool:
        try:
            ids = [self._ids[c] for c in word]
        except KeyError:
            return False  # symbol the automaton has never seen
        return self.core.accepts(ids)

    @property
    def n_states(self) -> int:
        return self.core.n_states


def build_classical_nfa(
    tree: RegExpTree, extra_symbols: set[str] | frozenset[str] = frozenset()
) -> ClassicalFA:
    """Thompson construction over the char alphabet
    (NFAUtils.buildNFA:26 semantics; NFAFactory.addExtraSymbols2NFA
    folds the word alphabet in so the eventual DFA is complete over
    every symbol it will read)."""
    alphabet = sorted(tree_symbols(tree) | set(extra_symbols))
    ids = {c: i for i, c in enumerate(alphabet)}
    transitions: list[tuple[int, object, int, bool]] = []
    counter = [0]

    def new_state() -> int:
        counter[0] += 1
        return counter[0] - 1

    def frag(t: RegExpTree) -> tuple[int, int]:
        if isinstance(t, SymbolNode):
            i, o = new_state(), new_state()
            transitions.append((i, frozenset([ids[t.symbol]]), o, False))
            return i, o
        if t.op == "CONCAT":
            i1, o1 = frag(t.children[0])
            i2, o2 = frag(t.children[1])
            transitions.append((o1, EPS, i2, False))
            return i1, o2
        if t.op == "UNION":
            i, o = new_state(), new_state()
            for c in t.children:
                ci, co = frag(c)
                transitions.append((i, EPS, ci, False))
                transitions.append((co, EPS, o, False))
            return i, o
        # ITER (Kleene star)
        i, o = new_state(), new_state()
        ci, co = frag(t.children[0])
        transitions.append((i, EPS, ci, False))
        transitions.append((co, EPS, ci, False))
        transitions.append((i, EPS, o, False))
        transitions.append((co, EPS, o, False))
        return i, o

    fi, fo = frag(tree)
    final = new_state()
    transitions.append((fo, EPS, final, False))
    nfa = NFA(
        n_states=counter[0], transitions=transitions, start=fi, finals={final}
    )
    return ClassicalFA(nfa, alphabet)


def eliminate_epsilon(fa: ClassicalFA) -> ClassicalFA:
    """Epsilon elimination (Eliminator.scala semantics): an eps-free
    NFA accepting the same language — delta'(q, a) = closure-through-eps
    of delta over a, accepting iff the eps closure reaches a final.
    The result ``isDFAEquivalent``-style property (at most one target
    per (state, symbol)) is NOT forced — this is still an NFA; subset
    construction makes it deterministic."""
    nfa = fa.core
    if not isinstance(nfa, NFA):
        raise TypeError("eliminate_epsilon expects the NFA stage")
    transitions: list[tuple[int, object, int, bool]] = []
    finals: set[int] = set()
    for q in range(nfa.n_states):
        cl = nfa.eps_closure(frozenset([q]))
        if cl & nfa.finals:
            finals.add(q)
        moves: dict[int, set[int]] = {}
        for src, label, dst, _ in nfa.transitions:
            if src in cl and label != EPS:
                for s in label:
                    moves.setdefault(s, set()).update(
                        nfa.eps_closure(frozenset([dst]))
                    )
        for s, dsts in moves.items():
            for d in sorted(dsts):
                transitions.append((q, frozenset([s]), d, False))
    out = NFA(
        n_states=nfa.n_states,
        transitions=transitions,
        start=nfa.start,
        finals=finals,
    )
    return ClassicalFA(out, fa.alphabet)


def to_dfa(fa: ClassicalFA, m: int = 0) -> ClassicalFA:
    """Subset construction (DFAUtils.convertNfa2Dfa semantics) +
    optional Nuel m-unambiguity disambiguation (Disambiguator.scala:60,
    needed when embedding an order-m Markov chain on the DFA's states).
    Reuses the engine's symbolic-core implementations verbatim — a char
    is a symbol id."""
    nfa = fa.core
    if not isinstance(nfa, NFA):
        raise TypeError("to_dfa expects the NFA stage")
    dfa = determinize(nfa, len(fa.alphabet))
    if m > 0:
        dfa = disambiguate(dfa, m)
    return ClassicalFA(dfa, fa.alphabet)
