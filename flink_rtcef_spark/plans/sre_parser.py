"""Recursive-descent parser for SRE pattern text and declarations.

Grammar per Wayeb/docs/lang.md:10-93 and the combinator parser at
fsm/symbolic/sre/SREParser.scala:100-272 (behavioral reference only):

  patterns     := pattern (& pattern)*
  pattern      := formula modifier*
  formula      := ';' '(' formula (',' formula)* ')'     sequence
                | '+' '(' formula (',' formula)* ')'     disjunction
                | '*' '(' formula ')'                    iteration
                | '!' '(' formula ')'                    complement
                | '#' '(' formula ')'                    skip-till-any
                | '@' '(' formula ')'                    skip-till-next
                | sentence
  sentence     := '^' '(' sentence (',' sentence)* ')'   AND
                | '|' '(' sentence (',' sentence)* ')'   OR
                | '-' sentence                           NOT
                | predicate
  predicate    := Name [ '(' term (',' term)* ')' ] [ '[' '"' reg '"' ']' ]
  term         := number | Name | '"' reg '"'
  modifier     := '{' key ':' value '}'    (order, partitionBy, window, windowType)

Declarations text: lines of '+(P,...)' (extras) and '~(P,...)'
(exclusives).
"""

from __future__ import annotations

import re

from flink_rtcef_spark.plans.sre_ast import (
    And,
    Choice,
    Declarations,
    Formula,
    Iter,
    Neg,
    Not,
    Or,
    Pattern,
    Predicate,
    Sent,
    Seq,
    SkipTillAny,
    SkipTillNext,
    TrueSentence,
)

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)|
        (?P<lbrace>\{)|(?P<rbrace>\})|(?P<colon>:)|
        (?P<lbrack>\[)|(?P<rbrack>\])|(?P<amp>&)|
        (?P<seq>;)|(?P<choice>\+)|(?P<iter>\*)|(?P<neg>!)|
        (?P<any>\#)|(?P<next>@)|(?P<and>\^)|(?P<or>\|)|(?P<not>-(?![0-9.]))|
        (?P<number>-?\d+(?:\.\d+)?)|
        (?P<string>"[^"]*")|
        (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"SRE parse error at {pos}: {text[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        tokens.append((kind, m.group().strip()))
    tokens.append(("eof", ""))
    return tokens


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise ValueError(f"expected {kind}, got {k}:{v!r}")
        return v

    # ------------------------------------------------------------ formulas
    def parse_patterns(self) -> list[Pattern]:
        patterns = [self.parse_pattern()]
        while self.peek()[0] == "amp":
            self.next()
            patterns.append(self.parse_pattern())
        self.expect("eof")
        return patterns

    def parse_pattern(self) -> Pattern:
        f = self.parse_formula()
        pat = Pattern(formula=f)
        while self.peek()[0] == "lbrace":
            self.next()
            key = self.expect("name")
            self.expect("colon")
            k, v = self.next()
            if key == "order":
                pat.order = int(v)
            elif key == "partitionBy":
                pat.partition_by = v
            elif key == "window":
                pat.window = int(v)
            elif key == "windowType":
                if v not in ("count", "time"):
                    raise ValueError(f"windowType must be count|time, got {v}")
                pat.window_type = v
            else:
                raise ValueError(f"unknown modifier {key}")
            self.expect("rbrace")
        return pat

    def parse_formula(self) -> Formula:
        kind, _ = self.peek()
        if kind == "seq":
            self.next()
            return Seq(tuple(self._formula_list()))
        if kind == "choice":
            self.next()
            return Choice(tuple(self._formula_list()))
        if kind == "iter":
            self.next()
            children = self._formula_list()
            if len(children) != 1:
                raise ValueError("* takes exactly one sub-formula")
            return Iter(children[0])
        if kind == "neg":
            self.next()
            children = self._formula_list()
            if len(children) != 1:
                raise ValueError("! takes exactly one sub-formula")
            return Neg(children[0])
        if kind == "any":
            self.next()
            children = self._formula_list()
            if len(children) != 1:
                raise ValueError("# takes exactly one sub-formula")
            return SkipTillAny(children[0])
        if kind == "next":
            self.next()
            children = self._formula_list()
            if len(children) != 1:
                raise ValueError("@ takes exactly one sub-formula")
            return SkipTillNext(children[0])
        return Sent(self.parse_sentence())

    def _formula_list(self) -> list[Formula]:
        self.expect("lparen")
        out = [self.parse_formula()]
        while self.peek()[0] == "comma":
            self.next()
            out.append(self.parse_formula())
        self.expect("rparen")
        return out

    # ----------------------------------------------------------- sentences
    def parse_sentence(self):
        kind, _ = self.peek()
        if kind == "and":
            self.next()
            return And(tuple(self._sentence_list()))
        if kind == "or":
            self.next()
            return Or(tuple(self._sentence_list()))
        if kind == "not":
            self.next()
            return Not(self.parse_sentence())
        return self.parse_predicate()

    def _sentence_list(self):
        self.expect("lparen")
        out = [self.parse_sentence()]
        while self.peek()[0] == "comma":
            self.next()
            out.append(self.parse_sentence())
        self.expect("rparen")
        return out

    def parse_predicate(self) -> Predicate | TrueSentence:
        name = self.expect("name")
        args: list = []
        if self.peek()[0] == "lparen":
            self.next()
            args.append(self._term())
            while self.peek()[0] == "comma":
                self.next()
                args.append(self._term())
            self.expect("rparen")
        register = None
        if self.peek()[0] == "lbrack":
            self.next()
            register = self.expect("string").strip('"')
            self.expect("rbrack")
        if name == "TruePredicate":
            return TrueSentence()
        return Predicate(name=name, args=tuple(args), register=register)

    def _term(self):
        kind, v = self.next()
        if kind == "number":
            return float(v) if "." in v else int(v)
        if kind == "string":
            return v  # register reference, kept quoted to distinguish
        if kind == "name":
            return v
        raise ValueError(f"bad term {kind}:{v!r}")


def parse_patterns(text: str) -> list[Pattern]:
    """Parse a pattern file (patterns separated by &)."""
    return _Parser(text).parse_patterns()


def parse_pattern(text: str) -> Pattern:
    pats = parse_patterns(text)
    if len(pats) != 1:
        raise ValueError(f"expected one pattern, got {len(pats)}")
    return pats[0]


def parse_declarations(text: str | None) -> Declarations:
    """Parse a declarations file: lines of +(...) extras / ~(...) exclusives."""
    decls = Declarations()
    if not text:
        return decls
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        # real declaration files separate sets with trailing commas
        head, body = line[0], line[1:].strip().rstrip(",").strip()
        if not (body.startswith("(") and body.endswith(")")):
            raise ValueError(f"bad declaration line: {line!r}")
        preds = []
        p = _Parser(body[1:-1])
        preds.append(p.parse_predicate())
        while p.peek()[0] == "comma":
            p.next()
            preds.append(p.parse_predicate())
        if head == "+":
            decls.extras.append(preds)
        elif head == "~":
            decls.exclusives.append(preds)
        else:
            raise ValueError(f"bad declaration line: {line!r}")
    return decls
