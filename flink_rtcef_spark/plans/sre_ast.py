"""AST for the SRE pattern language (Wayeb/docs/lang.md:10-93).

Two layers, mirroring the reference's split:
- sentences (the logic part): boolean combinations of predicates that
  evaluate over ONE event — `^` AND, `|` OR, `-` NOT;
- formulas (the regular part): `;` sequence, `+` disjunction, `*`
  iteration, `!` complement, `#` skip-till-any, `@` skip-till-next.

A sentence is evaluated two ways: as a Spark Column (symbolization)
and under a truth assignment over its atoms (minterm algebra).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---------------------------------------------------------------- sentences
class Sentence:
    def atoms(self) -> list["Predicate"]:
        raise NotImplementedError

    def eval(self, assignment: dict[str, bool]) -> bool:
        """Truth value under an assignment keyed by Predicate.key()."""
        raise NotImplementedError


@dataclass(frozen=True)
class Predicate(Sentence):
    """Atomic sentence: predicate name + constant args (registers are
    parsed but rejected by the compiler — the SREMO/NSRA path is
    explicitly discouraged for forecasting, docs/overview.md:59-63)."""

    name: str
    args: tuple = ()
    register: str | None = None

    def key(self) -> str:
        return f"{self.name}({','.join(map(str, self.args))})"

    def atoms(self) -> list["Predicate"]:
        return [self]

    def eval(self, assignment: dict[str, bool]) -> bool:
        return assignment[self.key()]


@dataclass(frozen=True)
class TrueSentence(Sentence):
    def atoms(self) -> list[Predicate]:
        return []

    def eval(self, assignment: dict[str, bool]) -> bool:
        return True


@dataclass(frozen=True)
class Not(Sentence):
    child: Sentence

    def atoms(self) -> list[Predicate]:
        return self.child.atoms()

    def eval(self, assignment: dict[str, bool]) -> bool:
        return not self.child.eval(assignment)


@dataclass(frozen=True)
class And(Sentence):
    children: tuple[Sentence, ...]

    def atoms(self) -> list[Predicate]:
        return [a for c in self.children for a in c.atoms()]

    def eval(self, assignment: dict[str, bool]) -> bool:
        return all(c.eval(assignment) for c in self.children)


@dataclass(frozen=True)
class Or(Sentence):
    children: tuple[Sentence, ...]

    def atoms(self) -> list[Predicate]:
        return [a for c in self.children for a in c.atoms()]

    def eval(self, assignment: dict[str, bool]) -> bool:
        return any(c.eval(assignment) for c in self.children)


# ----------------------------------------------------------------- formulas
class Formula:
    pass


@dataclass(frozen=True)
class Sent(Formula):
    """A one-event formula.  ``marked`` controls the TAKE/IGNORE output
    of the resulting transition (rewrite-inserted TRUE* is unmarked —
    SelectionUtils.scala:62-120)."""

    sentence: Sentence
    marked: bool = True


@dataclass(frozen=True)
class Empty(Formula):
    """epsilon — matches the empty word."""


@dataclass(frozen=True)
class Seq(Formula):
    children: tuple[Formula, ...]


@dataclass(frozen=True)
class Choice(Formula):
    children: tuple[Formula, ...]


@dataclass(frozen=True)
class Iter(Formula):
    child: Formula


@dataclass(frozen=True)
class Neg(Formula):
    child: Formula


@dataclass(frozen=True)
class SkipTillAny(Formula):
    """# — relaxed contiguity; compiled away by plans/rewrite.py."""

    child: Formula


@dataclass(frozen=True)
class SkipTillNext(Formula):
    """@ — skip till next; compiled away by plans/rewrite.py."""

    child: Formula


@dataclass
class Pattern:
    """One pattern with its modifiers (SREParser.scala:162-208)."""

    formula: Formula
    order: int = 0
    partition_by: str | None = None
    window: int = 0
    window_type: str = "count"  # count | time


@dataclass
class Declarations:
    """Extras (+) and exclusives (~) sets (docs/lang.md:147-167)."""

    extras: list[list[Predicate]] = field(default_factory=list)
    exclusives: list[list[Predicate]] = field(default_factory=list)


def formula_atoms(f: Formula) -> list[Predicate]:
    """All atomic predicates in a formula, in first-appearance order."""
    out: list[Predicate] = []

    def walk(x: Formula) -> None:
        if isinstance(x, Sent):
            out.extend(x.sentence.atoms())
        elif isinstance(x, (Seq, Choice)):
            for c in x.children:
                walk(c)
        elif isinstance(x, (Iter, Neg, SkipTillAny, SkipTillNext)):
            walk(x.child)

    walk(f)
    seen: set[str] = set()
    uniq = []
    for a in out:
        if a.key() not in seen:
            seen.add(a.key())
            uniq.append(a)
    return uniq
