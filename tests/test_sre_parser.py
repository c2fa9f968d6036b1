"""Parser tests on the reference's own golden patterns."""

from __future__ import annotations

import pytest

from flink_rtcef_spark.plans.sre_ast import (
    Choice,
    Iter,
    Predicate,
    Sent,
    Seq,
    SkipTillAny,
)
from flink_rtcef_spark.plans.sre_parser import (
    parse_declarations,
    parse_pattern,
    parse_patterns,
)


def test_brest_port_entry_pattern():
    # data/pattern.sre:1 shape
    p = parse_pattern(
        ";(OutsideCircle(-4.4753,48.38273,5.0),"
        "OutsideCircle(-4.4753,48.38273,5.0),"
        "WithinCircle(-4.4753,48.38273,5.0))"
        "{order:2}{partitionBy:mmsi}"
    )
    assert isinstance(p.formula, Seq)
    assert len(p.formula.children) == 3
    first = p.formula.children[0]
    assert isinstance(first, Sent)
    assert first.sentence == Predicate("OutsideCircle", (-4.4753, 48.38273, 5.0))
    assert p.order == 2
    assert p.partition_by == "mmsi"
    assert p.window == 0


def test_finance_fraud_pattern():
    # Wayeb/patterns/finance/fraud/pattern.sre:1 shape
    p = parse_pattern(
        ";(EQ(is_fraud,0.0),EQ(is_fraud,1.0)){order:2}{partitionBy:pan}{window:1000}"
    )
    assert p.window == 1000
    assert p.window_type == "count"
    assert p.partition_by == "pan"


def test_lang_md_example_multi_pattern():
    pats = parse_patterns(
        ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){order:2}"
        "&"
        ";(|(IsEventTypePredicate(A),IsEventTypePredicate(B)),IsEventTypePredicate(C))"
        "{order:0}{partitionBy:someAttribute}{window:10}{windowType:count}"
    )
    assert len(pats) == 2
    assert pats[1].partition_by == "someAttribute"
    assert pats[1].window == 10


def test_nested_regular_operators():
    p = parse_pattern(";(IsEventTypePredicate(A),*(+(IsEventTypePredicate(B),IsEventTypePredicate(C))),IsEventTypePredicate(D))")
    seq = p.formula
    assert isinstance(seq, Seq)
    assert isinstance(seq.children[1], Iter)
    assert isinstance(seq.children[1].child, Choice)


def test_skip_till_any_and_negative_numbers():
    p = parse_pattern("#(;(GT(speed,5.0),LT(lon,-4.3)))")
    assert isinstance(p.formula, SkipTillAny)


def test_declarations():
    d = parse_declarations("+(SpeedLowerThan(5),SpeedBetween(5,20))\n~(EQ(is_fraud,0.0),EQ(is_fraud,1.0))")
    assert len(d.extras) == 1 and len(d.extras[0]) == 2
    assert len(d.exclusives) == 1
    assert d.exclusives[0][0].name == "EQ"


def test_register_variables_parse_but_compile_rejects():
    p = parse_pattern(';(IsEventTypePredicate(A)["x"],EQAttrStr(EventType,"x")){window:2}')
    first = p.formula.children[0]
    assert first.sentence.register == "x"
    from flink_rtcef_spark.plans.predicates import predicate_column

    with pytest.raises(NotImplementedError):
        predicate_column(first.sentence)
