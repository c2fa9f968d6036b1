"""Predicate registry: pattern predicate name -> Spark Column factory.

The reference's extension point is one Scala class per predicate under
fsm/symbolic/logic/predicates/ looked up by name (docs/lang.md:89-93).
Ours is a dict of Column factories — every predicate evaluates JVM-side
inside whole-stage codegen; symbolization (the only data-sized part of
pattern compilation) never touches Python.

Names accept both the reference's long form (WithinCirclePredicate)
and a short alias (WithinCircle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from flink_rtcef_spark.functions.scalar import (
    distance_between,
    outside_circle,
    within_circle,
)
from flink_rtcef_spark.plans.sre_ast import And, Not, Or, Predicate, Sentence, TrueSentence

ColumnFactory = Callable[..., Column]

_REGISTRY: dict[str, ColumnFactory] = {}


def register(name: str, *aliases: str):
    def deco(fn: ColumnFactory):
        for n in (name, *aliases):
            _REGISTRY[n] = fn
        return fn

    return deco


@register("IsEventTypePredicate", "IsEventType")
def _is_event_type(event_type) -> Column:
    # IsEventTypePredicate.scala:12-21
    return F.col("event_type") == str(event_type)


@register("EQ")
def _eq(attr, value) -> Column:
    # EQ.scala:13-24 — numeric equality vs constant
    return F.col(str(attr)).cast("double") == float(value)


@register("EQStr")
def _eq_str(attr, value) -> Column:
    return F.col(str(attr)) == str(value)


@register("GT")
def _gt(attr, value) -> Column:
    return F.col(str(attr)).cast("double") > float(value)


@register("GTE")
def _gte(attr, value) -> Column:
    return F.col(str(attr)).cast("double") >= float(value)


@register("LT")
def _lt(attr, value) -> Column:
    return F.col(str(attr)).cast("double") < float(value)


@register("LTE")
def _lte(attr, value) -> Column:
    return F.col(str(attr)).cast("double") <= float(value)


@register("BT")
def _bt(attr, lo, hi) -> Column:
    # BT.scala:14-28 — min <= v < max
    c = F.col(str(attr)).cast("double")
    return (c >= float(lo)) & (c < float(hi))


@register("WithinCirclePredicate", "WithinCircle")
def _within_circle(lon, lat, radius) -> Column:
    # WithinCirclePredicate.scala:9-23
    return within_circle(F.col("lon"), F.col("lat"), float(lon), float(lat), float(radius))


@register("OutsideCirclePredicate", "OutsideCircle")
def _outside_circle(lon, lat, radius) -> Column:
    # OutsideCirclePredicate.scala:9-23
    return outside_circle(F.col("lon"), F.col("lat"), float(lon), float(lat), float(radius))


@register("DistanceBetweenPredicate", "DistanceBetween")
def _distance_between(lon, lat, dmin, dmax) -> Column:
    # DistanceBetweenPredicate.scala:9-26
    return distance_between(F.col("lon"), F.col("lat"), float(lon), float(lat), float(dmin), float(dmax))


@register("HeadingTowardsPredicate", "HeadingTowards")
def _heading_towards(where) -> Column:
    # HeadingTowardsPredicate.scala:10-71 — dead-reckoning segment vs
    # target polygon; vectorized pandas UDF (functions/spatial.py)
    from flink_rtcef_spark.functions.spatial import heading_towards

    return heading_towards(str(where))


def validate_predicate(pred: Predicate) -> None:
    """Compile-time check: known name, no register variables.  Pure
    registry lookup — safe without an active SparkSession."""
    if pred.register is not None:
        raise NotImplementedError(
            "register variables (SREMO/NSRA) are not supported — the "
            "reference itself discourages them for forecasting "
            "(docs/overview.md:59-63)"
        )
    if pred.name not in _REGISTRY:
        raise KeyError(
            f"unknown predicate {pred.name!r}; register a Column factory "
            f"in plans/predicates.py"
        )


def predicate_column(pred: Predicate) -> Column:
    if pred.register is not None:
        raise NotImplementedError(
            "register variables (SREMO/NSRA) are not supported — the "
            "reference itself discourages them for forecasting "
            "(docs/overview.md:59-63)"
        )
    if pred.name not in _REGISTRY:
        raise KeyError(
            f"unknown predicate {pred.name!r}; register a Column factory "
            f"in plans/predicates.py"
        )
    return _REGISTRY[pred.name](*pred.args)


def sentence_column(sentence: Sentence) -> Column:
    """Sentence -> boolean Column (^, |, - map to &, |, ~)."""
    if isinstance(sentence, TrueSentence):
        return F.lit(True)
    if isinstance(sentence, Predicate):
        return predicate_column(sentence)
    if isinstance(sentence, Not):
        return ~sentence_column(sentence.child)
    if isinstance(sentence, And):
        out = sentence_column(sentence.children[0])
        for c in sentence.children[1:]:
            out = out & sentence_column(c)
        return out
    if isinstance(sentence, Or):
        out = sentence_column(sentence.children[0])
        for c in sentence.children[1:]:
            out = out | sentence_column(c)
        return out
    raise TypeError(f"unknown sentence {type(sentence)}")
