"""NSRA — nondeterministic symbolic register automata for SREMO (B14).

The reference extends SRE with register variables (docs/lang.md:95-136):
``IsEventTypePredicate(A)["x"]`` stores the triggering event in register
x, and later atoms such as ``EQAttr(attr,"x")`` compare the current
event against the stored one (fsm/symbolic/logic/predicates/EQAttr
.scala, EQAttrStr.scala, GTAttr.scala, LTAttr.scala — empty register
evaluates to false).  Execution maintains *configurations* =
(state, valuation) pairs (fsm/symbolic/sra/Configuration.scala,
SRA.yieldsSuccessorConfigWithEpsilon) — inherently nondeterministic,
since a register guard cannot be folded into a finite minterm alphabet.
Windows are mandatory for SREMO (docs/lang.md:129-135: "if a window is
not provided ... effectively renders the SREMO unsatisfiable").

Spark shape: everything *register-free* in the guards is still
evaluated JVM-side — the static atoms compile to one bit-encoded int
Column exactly like SDFA symbolization, so the shuffle payload stays
(key, ts, id, bits, <register attrs>).  Only the register comparisons
run in Python, against the per-configuration valuation, inside the same
partition-sorted mapInPandas pass the deterministic operator uses
(operators/cep_register.py).

Scale note: live configurations per key are bounded by the (mandatory)
window — a count window of w admits at most w concurrent runs, each
valuation holding only the register attrs actually referenced.  State
is O(w · |registers|) per key, independent of stream length.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from flink_rtcef_spark.plans.predicates import predicate_column, validate_predicate
from flink_rtcef_spark.plans.rewrite import apply_selection
from flink_rtcef_spark.plans.sre_ast import (
    And,
    Choice,
    Empty,
    Formula,
    Iter,
    Neg,
    Not,
    Or,
    Pattern,
    Predicate,
    Sent,
    Sentence,
    Seq,
    TrueSentence,
    formula_atoms,
)
from flink_rtcef_spark.plans.sre_parser import parse_pattern

EPS = None  # epsilon guard marker


def is_register_ref(arg) -> bool:
    """Parser keeps register references quoted ('"x"') to distinguish
    them from attribute-name args (sre_parser._term)."""
    return isinstance(arg, str) and len(arg) >= 2 and arg[0] == '"' and arg[-1] == '"'


def references_register(pred: Predicate) -> bool:
    return any(is_register_ref(a) for a in pred.args)


# --------------------------------------------------- register predicate evals
def _num(v) -> float:
    # reference semantics: getValueOf(...).toString.toDouble (EQAttr.scala:14-19)
    return float(v)


_REGISTER_EVAL: dict[str, Callable] = {
    # (current event value, stored event value) -> bool
    "EQAttr": lambda cur, stored: _num(cur) == _num(stored),
    "EQAttrStr": lambda cur, stored: str(cur) == str(stored),
    "GTAttr": lambda cur, stored: _num(cur) > _num(stored),
    "LTAttr": lambda cur, stored: _num(cur) < _num(stored),
}


def validate_register_predicate(pred: Predicate) -> None:
    if references_register(pred):
        if pred.name not in _REGISTER_EVAL:
            raise KeyError(
                f"unknown register predicate {pred.name!r}; known: "
                f"{sorted(_REGISTER_EVAL)}"
            )
        if len(pred.args) != 2 or not is_register_ref(pred.args[1]):
            raise ValueError(
                f"{pred.name} expects (attribute, \"register\"), got {pred.args}"
            )
    else:
        # static atom: must resolve in the Column registry (register
        # *declarations* don't affect evaluation, only writes)
        validate_predicate(
            Predicate(name=pred.name, args=pred.args, register=None)
        )


# ------------------------------------------------------------------ automaton
@dataclass(frozen=True)
class NSRATransition:
    src: int
    guard: Sentence | None  # None = epsilon
    dst: int
    take: bool
    writes: frozenset[str]  # registers written when the guard fires


@dataclass
class NSRA:
    n_states: int
    transitions: list[NSRATransition]
    start: int
    finals: set[int]
    enclosure: dict[int, tuple[int, ...]] = field(default_factory=dict)

    def compute_enclosures(self) -> None:
        eps_by_src: dict[int, list[int]] = {}
        for t in self.transitions:
            if t.guard is EPS:
                eps_by_src.setdefault(t.src, []).append(t.dst)
        for s in range(self.n_states):
            stack, seen = [s], {s}
            while stack:
                x = stack.pop()
                for d in eps_by_src.get(x, ()):
                    if d not in seen:
                        seen.add(d)
                        stack.append(d)
            self.enclosure[s] = tuple(sorted(seen))


def _sentence_writes(sentence: Sentence) -> frozenset[str]:
    """Registers declared on atoms of this sentence: the transition
    stores the triggering event under each (Valuation.update —
    NSRAUtils gathers write registers per sentence transition)."""
    regs = {a.register for a in sentence.atoms() if a.register is not None}
    return frozenset(regs)


def build_nsra(formula: Formula) -> NSRA:
    """Thompson construction over *sentences* (SNFA shape, SNFAUtils
    .scala:102+), keeping guards symbolic instead of expanding to
    minterms — register guards have no finite alphabet.  No streaming
    self-loop: the runtime seeds a fresh start configuration at every
    event, which is equivalent and keeps the automaton smaller."""
    transitions: list[NSRATransition] = []
    counter = [0]

    def new_state() -> int:
        counter[0] += 1
        return counter[0] - 1

    def frag(f: Formula) -> tuple[int, int]:
        if isinstance(f, Sent):
            i, o = new_state(), new_state()
            transitions.append(
                NSRATransition(i, f.sentence, o, f.marked, _sentence_writes(f.sentence))
            )
            return i, o
        if isinstance(f, Empty):
            i, o = new_state(), new_state()
            transitions.append(NSRATransition(i, EPS, o, False, frozenset()))
            return i, o
        if isinstance(f, Seq):
            ios = [frag(c) for c in f.children]
            for (_, o1), (i2, _) in zip(ios, ios[1:]):
                transitions.append(NSRATransition(o1, EPS, i2, False, frozenset()))
            return ios[0][0], ios[-1][1]
        if isinstance(f, Choice):
            i, o = new_state(), new_state()
            for c in f.children:
                ci, co = frag(c)
                transitions.append(NSRATransition(i, EPS, ci, False, frozenset()))
                transitions.append(NSRATransition(co, EPS, o, False, frozenset()))
            return i, o
        if isinstance(f, Iter):
            i, o = new_state(), new_state()
            ci, co = frag(f.child)
            transitions.append(NSRATransition(i, EPS, ci, False, frozenset()))
            transitions.append(NSRATransition(co, EPS, ci, False, frozenset()))
            transitions.append(NSRATransition(i, EPS, o, False, frozenset()))
            transitions.append(NSRATransition(co, EPS, o, False, frozenset()))
            return i, o
        if isinstance(f, Neg):
            raise NotImplementedError(
                "complement over register automata is undecidable in general "
                "— the reference's SREM path has no '!' either"
            )
        raise TypeError(f"cannot build NSRA from {type(f)} (rewrite first)")

    fi, fo = frag(formula)
    final = new_state()
    transitions.append(NSRATransition(fo, EPS, final, False, frozenset()))
    nsra = NSRA(
        n_states=counter[0], transitions=transitions, start=fi, finals={final}
    )
    nsra.compute_enclosures()
    return nsra


# -------------------------------------------------------------- guard compile
def compile_guard(
    sentence: Sentence, bit_index: dict[str, int]
) -> Callable[[int, dict, dict], bool]:
    """Sentence -> closure(bits, event, valuation).  Static atoms read
    their precomputed JVM-side bit; register atoms compare the current
    event against the stored one (empty register -> False, matching
    EQAttr.scala:13-22)."""
    if isinstance(sentence, TrueSentence):
        return lambda bits, ev, val: True
    if isinstance(sentence, Predicate):
        if references_register(sentence):
            fn = _REGISTER_EVAL[sentence.name]
            attr = str(sentence.args[0])
            reg = sentence.args[1].strip('"')

            def ev_reg(bits, ev, val, fn=fn, attr=attr, reg=reg):
                stored = val.get(reg)
                if stored is None:
                    return False
                cur = ev.get(attr)
                if cur is None or stored.get(attr) is None:
                    return False
                return fn(cur, stored[attr])

            return ev_reg
        i = bit_index[
            Predicate(name=sentence.name, args=sentence.args, register=None).key()
        ]
        return lambda bits, ev, val, i=i: bool((bits >> i) & 1)
    if isinstance(sentence, Not):
        c = compile_guard(sentence.child, bit_index)
        return lambda bits, ev, val: not c(bits, ev, val)
    if isinstance(sentence, And):
        cs = [compile_guard(c, bit_index) for c in sentence.children]
        return lambda bits, ev, val: all(c(bits, ev, val) for c in cs)
    if isinstance(sentence, Or):
        cs = [compile_guard(c, bit_index) for c in sentence.children]
        return lambda bits, ev, val: any(c(bits, ev, val) for c in cs)
    raise TypeError(f"unknown sentence {type(sentence)}")


# ------------------------------------------------------------------- compiled
@dataclass
class CompiledRegisterPattern:
    pattern: Pattern
    nsra: NSRA
    static_atoms: list[Predicate]  # register-stripped, bit order
    register_attrs: list[str]  # event columns the valuations need
    # runtime transition table: per source state, list of
    # (guard_fn, dst_closure: tuple[int], take, writes: tuple[str])
    table: dict[int, list[tuple]]
    accepting: tuple[bool, ...]  # state -> closure hits a final
    start_states: tuple[int, ...]  # closure of start

    @property
    def partition_by(self) -> str | None:
        return self.pattern.partition_by

    @property
    def window(self) -> int:
        return self.pattern.window

    @property
    def window_type(self) -> str:
        return self.pattern.window_type

    def bits_column(self) -> Column:
        """Static predicate vector as ONE JVM-side int Column (same
        bit-encoding trick as SDFA symbolization, E1)."""
        code: Column = F.lit(0)
        for i, atom in enumerate(self.static_atoms):
            code = code + F.when(predicate_column(atom), F.lit(1 << i)).otherwise(
                F.lit(0)
            )
        return code.cast("long")


def compile_register_pattern(
    pattern_text: str, require_registers: bool = True
) -> CompiledRegisterPattern:
    """``require_registers=False`` admits plain SRE — the NSRA runtime
    is then an NSFA and serves as the nondeterministic run path (F2,
    ERFEngine.processEventAtRunNonDet:295): match *enumeration*, where
    the deterministic SDFA path reports only detections."""
    pattern = parse_pattern(pattern_text)
    formula = apply_selection(pattern.formula)
    atoms = formula_atoms(formula)
    if not atoms:
        raise ValueError("pattern has no predicates")
    if require_registers and not any(
        a.register is not None or references_register(a) for a in atoms
    ):
        raise ValueError(
            "no register variables — use compile_pattern (SDFA path) instead"
        )
    if pattern.window <= 0:
        raise ValueError(
            "SREMO requires a window (docs/lang.md:129-135: window 0 "
            "renders the pattern unsatisfiable)"
        )
    for a in atoms:
        validate_register_predicate(a)

    static_atoms: list[Predicate] = []
    seen: set[str] = set()
    for a in atoms:
        if not references_register(a):
            stripped = Predicate(name=a.name, args=a.args, register=None)
            if stripped.key() not in seen:
                seen.add(stripped.key())
                static_atoms.append(stripped)
    bit_index = {a.key(): i for i, a in enumerate(static_atoms)}
    register_attrs = sorted(
        {str(a.args[0]) for a in atoms if references_register(a)}
    )

    nsra = build_nsra(formula)
    table: dict[int, list[tuple]] = {}
    for t in nsra.transitions:
        if t.guard is EPS:
            continue
        fn = compile_guard(t.guard, bit_index)
        table.setdefault(t.src, []).append(
            (fn, nsra.enclosure[t.dst], t.take, tuple(sorted(t.writes)))
        )
    accepting = tuple(
        bool(set(nsra.enclosure[s]) & nsra.finals) for s in range(nsra.n_states)
    )
    return CompiledRegisterPattern(
        pattern=pattern,
        nsra=nsra,
        static_atoms=static_atoms,
        register_attrs=register_attrs,
        table=table,
        accepting=accepting,
        start_states=nsra.enclosure[nsra.start],
    )
