"""Selection-strategy rewrite (logical-plan rewrite of the pattern AST).

Compiles `#` (skip-till-any) and `@` (skip-till-next) away into plain
SRE, following the transformation rules of
fsm/symbolic/sre/SelectionUtils.scala:55-125:

  any(R1;...;Rn)  ->  R1 ; T* ; R2 ; T* ; ... ; Rn
  any(R*)         ->  R ; (T* ; R)*  +  epsilon
  next(R1;...;Rn) ->  R1 ; !(T*;R2;T*) ; R2 ; ... ; !(T*;Rn;T*) ; Rn
  next(R*)        ->  R ; ( !(T*;R;T*) ; R )*  +  epsilon

The inserted TRUE sentences are UNMARKED: their transitions are
IGNORE, so skipped events never enter the match.  Strategies have no
effect on disjunction/negation (docs/lang.md:31-33).
"""

from __future__ import annotations

from flink_rtcef_spark.plans.sre_ast import (
    Choice,
    Empty,
    Formula,
    Iter,
    Neg,
    Sent,
    Seq,
    SkipTillAny,
    SkipTillNext,
    TrueSentence,
)

_TRUE_STAR = Iter(Sent(TrueSentence(), marked=False))


def _true_star() -> Formula:
    return _TRUE_STAR


def _not_containing(r: Formula) -> Formula:
    """!(T*;R;T*) — words with no infix matching R (unmarked guard)."""
    return Neg(Seq((_true_star(), r, _true_star())))


def apply_selection(f: Formula, strategy: str = "strict") -> Formula:
    """Rewrite f under the given strategy; children of `#`/`@` nodes are
    rewritten under ANY/NEXT, everything else resets to STRICT (the
    reference applies strategies one operator deep, then reverts)."""
    if isinstance(f, Sent) or isinstance(f, Empty):
        return f
    if isinstance(f, SkipTillAny):
        return apply_selection(f.child, "any")
    if isinstance(f, SkipTillNext):
        return apply_selection(f.child, "next")
    if isinstance(f, Seq):
        kids = tuple(apply_selection(c, "strict") for c in f.children)
        if strategy == "any":
            out: list[Formula] = [kids[0]]
            for k in kids[1:]:
                out.extend((_true_star(), k))
            return Seq(tuple(out))
        if strategy == "next":
            out = [kids[0]]
            for k in kids[1:]:
                out.extend((_not_containing(k), k))
            return Seq(tuple(out))
        return Seq(kids)
    if isinstance(f, Choice):
        return Choice(tuple(apply_selection(c, "strict") for c in f.children))
    if isinstance(f, Iter):
        kid = apply_selection(f.child, "strict")
        if strategy == "any":
            return Choice((Seq((kid, Iter(Seq((_true_star(), kid))))), Empty()))
        if strategy == "next":
            return Choice((Seq((kid, Iter(Seq((_not_containing(kid), kid))))), Empty()))
        return Iter(kid)
    if isinstance(f, Neg):
        return Neg(apply_selection(f.child, "strict"))
    raise TypeError(f"unknown formula node {type(f)}")
