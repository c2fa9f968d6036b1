"""Pattern compiler: SRE text (+ declarations) -> CompiledPattern.

Pipeline (SPSTProvider.sre2spst IR chain, SURVEY.md §3.1):
  IR1 parse         (plans/sre_parser.py)
  IR2 rewrite #/@   (plans/rewrite.py)
  IR3 minterms      (plans/automata.build_minterms, exclusives pruning)
  IR4 NFA           (Thompson + streaming TRUE self-loop)
  IR5 SDFA          (subset construction)
  IR6 disambiguate  (order-m), count policy

The CompiledPattern carries the two physical artifacts:
- ``symbol_column()``: ONE JVM-side Column mapping each event row to
  its minterm symbol id (E1 symbolization — a bit-encoded predicate
  vector looked up in a literal map, fully codegen'd, pushdown-friendly)
- numpy (delta, take, finals) tables for the stateful CEP operator.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import Column
from pyspark.sql import functions as F

from flink_rtcef_spark.plans.automata import (
    SDFA,
    Minterm,
    build_nfa,
    determinize,
    disambiguate,
    formula_alphabet,
    set_nonoverlap,
)
from flink_rtcef_spark.plans.predicates import predicate_column, validate_predicate
from flink_rtcef_spark.plans.rewrite import apply_selection
from flink_rtcef_spark.plans.sre_ast import Declarations, Pattern, Predicate
from flink_rtcef_spark.plans.sre_parser import parse_declarations, parse_pattern

OVERLAP = "overlap"
NONOVERLAP = "nonoverlap"


@dataclass
class CompiledPattern:
    """The executable form of one SRE pattern: minterm alphabet + SDFA
    + symbolization Column builder — everything the CEP/forecast
    operators broadcast to executors."""

    pattern: Pattern
    atoms: list[Predicate]
    minterms: list[Minterm]
    sdfa: SDFA
    policy: str = OVERLAP
    declarations: Declarations = field(default_factory=Declarations)

    @property
    def partition_by(self) -> str | None:
        return self.pattern.partition_by

    @property
    def window(self) -> int:
        return self.pattern.window

    @property
    def window_type(self) -> str:
        return self.pattern.window_type

    @property
    def order(self) -> int:
        return self.pattern.order

    # ------------------------------------------------------- symbolization
    def _code_to_symbol(self) -> dict[int, int]:
        """Bit-encoded predicate vector -> minterm symbol id."""
        keys = [a.key() for a in self.atoms]
        mapping: dict[int, int] = {}
        for sym, mt in enumerate(self.minterms):
            d = mt.as_dict()
            code = sum(1 << i for i, k in enumerate(keys) if d[k])
            mapping[code] = sym
        return mapping

    def symbol_column(self) -> Column:
        """E1 symbolization (Isomorphism.evaluate:72-75) as one Column:
        bitcode = sum(pred_i << i), then a literal-map lookup to the
        symbol id.  Events violating the exclusives assumption (a code
        with no minterm) fall back to the all-false minterm."""
        code: Column = F.lit(0)
        for i, atom in enumerate(self.atoms):
            code = code + F.when(predicate_column(atom), F.lit(1 << i)).otherwise(F.lit(0))
        mapping = self._code_to_symbol()
        fallback = mapping.get(0, 0)
        map_items: list[Column] = []
        for c, s in mapping.items():
            map_items.extend((F.lit(c), F.lit(s)))
        lookup = F.create_map(*map_items)
        return F.coalesce(
            F.element_at(lookup, code.cast("int")), F.lit(fallback)
        ).cast("int")

    def reset_symbols(self, event_type: str = "RESET") -> frozenset[int]:
        """Symbols whose minterm satisfies IsEventTypePredicate(RESET) —
        the control events that clear FSM state (ResetEvent handling,
        fsm/runtime/Run.scala:309-323).  Empty if RESET is not in the
        alphabet (declare it as an extra to enable)."""
        key = Predicate("IsEventTypePredicate", (event_type,)).key()
        return frozenset(
            i for i, mt in enumerate(self.minterms) if mt.as_dict().get(key, False)
        )



def compile_pattern(
    pattern_text: str,
    declarations_text: str | None = None,
    policy: str = OVERLAP,
    streaming: bool = True,
) -> CompiledPattern:
    """Compile SRE text (+ optional declarations) through the full
    chain: parse → selection rewrite → minterm alphabet → NFA →
    determinize → disambiguate → count policy (SURVEY §2.D)."""
    pattern = parse_pattern(pattern_text)
    decls = parse_declarations(declarations_text)
    formula = apply_selection(pattern.formula)
    atoms, minterms = formula_alphabet(formula, decls)
    if not atoms:
        raise ValueError("pattern has no predicates")
    for atom in atoms:
        # fail at compile time, not first symbolization: unknown
        # predicate names and register variables (SREMO) both reject here
        validate_predicate(atom)
    nfa = build_nfa(formula, minterms, streaming=streaming)
    sdfa = determinize(nfa, len(minterms))
    if pattern.order > 0:
        sdfa = disambiguate(sdfa, pattern.order)
    if policy == NONOVERLAP:
        sdfa = set_nonoverlap(sdfa)
    return CompiledPattern(
        pattern=pattern,
        atoms=atoms,
        minterms=minterms,
        sdfa=sdfa,
        policy=policy,
        declarations=decls,
    )


def compile_patterns(
    patterns_text: str,
    declarations_text: str | None = None,
    policy: str = OVERLAP,
    streaming: bool = True,
) -> list[CompiledPattern]:
    """Multi-pattern file support (B12, `f1 & f2`): each pattern
    compiles independently; run one CEP operator per pattern over the
    same DataFrame (ERFEngine.scala:204 — all FSMs see every event)."""
    from flink_rtcef_spark.plans.sre_parser import parse_patterns

    out = []
    for pat in parse_patterns(patterns_text):
        decls = parse_declarations(declarations_text)
        formula = apply_selection(pat.formula)
        atoms, minterms = formula_alphabet(formula, decls)
        if not atoms:
            raise ValueError("pattern has no predicates")
        for atom in atoms:
            validate_predicate(atom)
        nfa = build_nfa(formula, minterms, streaming=streaming)
        sdfa = determinize(nfa, len(minterms))
        if pat.order > 0:
            sdfa = disambiguate(sdfa, pat.order)
        if policy == NONOVERLAP:
            sdfa = set_nonoverlap(sdfa)
        out.append(
            CompiledPattern(
                pattern=pat,
                atoms=atoms,
                minterms=minterms,
                sdfa=sdfa,
                policy=policy,
                declarations=decls,
            )
        )
    return out


def transition_tables(sdfa: SDFA) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(delta int32, take bool, finals bool) — the broadcastable payload
    for the CEP operator."""
    finals = np.zeros(sdfa.n_states, dtype=bool)
    for f in sdfa.finals:
        finals[f] = True
    return sdfa.delta, sdfa.take, finals
