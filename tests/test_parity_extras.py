"""Parity extras: RESET handling, multi-pattern files, finance domain,
log-line formats."""

from __future__ import annotations

import re

import pandas as pd

from flink_rtcef_spark.functions.logformat import (
    detection_line,
    forecast_line,
    global_report_line,
    local_report_line,
)
from flink_rtcef_spark.operators.cep import BatchCEP
from flink_rtcef_spark.plans.compiler import compile_pattern, compile_patterns
from tests.test_cep import _run, _sym_of


def test_reset_clears_run_state():
    """;(A,B) with RESET declared: A RESET B must NOT match; A B must."""
    compiled = compile_pattern(
        ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){partitionBy:k}",
        "+(IsEventTypePredicate(RESET))\n"
        "~(IsEventTypePredicate(A),IsEventTypePredicate(B),IsEventTypePredicate(RESET))",
    )
    assert len(compiled.reset_symbols()) == 1
    assert len(_run(compiled, ["A", "B"])) == 1
    assert _run(compiled, ["A", "RESET", "B"]) == []
    # after the reset, matching resumes cleanly
    out = _run(compiled, ["A", "RESET", "A", "B"])
    assert len(out) == 1 and out[0][2] == 4  # detection at counter 4


def test_reset_not_in_alphabet_is_noop():
    compiled = compile_pattern(
        ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){partitionBy:k}",
        "~(IsEventTypePredicate(A),IsEventTypePredicate(B))",
    )
    assert compiled.reset_symbols() == frozenset()


def test_multi_pattern_file():
    pats = compile_patterns(
        ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){partitionBy:k}"
        "&"
        ";(IsEventTypePredicate(C),IsEventTypePredicate(C)){partitionBy:k}",
        "~(IsEventTypePredicate(A),IsEventTypePredicate(B),IsEventTypePredicate(C))",
    )
    assert len(pats) == 2
    stream = ["A", "B", "C", "C", "A"]
    assert [r[2] for r in _run(pats[0], stream)] == [2]  # AB at counter 2
    assert [r[2] for r in _run(pats[1], stream)] == [4]  # CC at counter 4


def test_finance_fraud_pattern_end_to_end(spark):
    """The reference's second domain (Wayeb/patterns/finance/fraud):
    ;(EQ(is_fraud,0.0),EQ(is_fraud,1.0)){order:2}{partitionBy:pan}{window:1000}
    with exclusives — detects legit->fraud transitions per card."""
    compiled = compile_pattern(
        ";(EQ(is_fraud,0.0),EQ(is_fraud,1.0)){order:2}{partitionBy:pan}{window:1000}",
        "~(EQ(is_fraud,0.0),EQ(is_fraud,1.0))",
    )
    rows = []
    # card c1: legit, legit, fraud -> one detection at event 2 (0-based)
    for i, fr in enumerate([0.0, 0.0, 1.0, 1.0]):
        rows.append(("c1", i + 1, i, fr))
    # card c2: all legit -> none
    for i, fr in enumerate([0.0, 0.0, 0.0]):
        rows.append(("c2", i + 1, 100 + i, fr))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pan", "timestamp", "id", "is_fraud"])
    )
    out = BatchCEP(compiled, ts_col="timestamp", id_col="id").detections(df).toPandas()
    assert list(out["key"]) == ["c1"]
    assert list(out["detection_event_id"]) == [2]


def test_log_formats_parse_with_reference_regexes():
    """Our lines must match python/log_parser.py:14-23 regexes."""
    global_pattern = re.compile(
        r"GLOBAL_REPORT: Report\{ts=(\d+), key='GLOBAL', .*?runtime MCC=([\d\.\-]+)', batch MCC=([\d\.\-]+)\}"
    )
    local_pattern = re.compile(r"LOCAL_REPORT: Report\{ts=(\d+), key=")
    g = global_report_line(1443877181, 0.51, 0.47)
    m = global_pattern.search(g)
    assert m and m.group(1) == "1443877181"
    assert m.group(2) == "0.51" and m.group(3) == "0.47"
    assert local_pattern.search(local_report_line(1443877181, "227318040", 0.5, 0.4))
    assert detection_line(123, 4).startswith("DETECTION: TIMESTAMP=123 fmDetected=true")
    assert "(POSITIVE)" in forecast_line(1, "k", 0.6, 1, 5, True)
    assert "(NEGATIVE)" in forecast_line(1, "k", 0.2, 1, 5, False)


def test_mle_counts_skip_reset_transitions(spark):
    """transition_counts must mirror the run kernels' ResetEvent
    semantics (Run.scala:309-323): a RESET consumes the event and
    returns the state to 0 WITHOUT counting a transition, so the
    estimated chain matches the automaton the forecaster actually
    walks (ADVICE r2)."""
    import pandas as pd

    from flink_rtcef_spark.models.mc import estimate_mc
    from tests.test_cep import _sym_of

    compiled = compile_pattern(
        ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){partitionBy:k}",
        "+(IsEventTypePredicate(RESET))\n"
        "~(IsEventTypePredicate(A),IsEventTypePredicate(B),IsEventTypePredicate(RESET))",
    )
    (reset_sym,) = compiled.reset_symbols()
    types = ["A", "RESET", "A", "B", "RESET", "A"]
    syms = [_sym_of(compiled, t) for t in types]
    sym_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": ["k"] * len(syms),
                "ts": range(1, len(syms) + 1),
                "event_id": range(len(syms)),
                "symbol": syms,
            }
        )
    )
    mc = estimate_mc(sym_df, compiled)
    # 2 RESETs consumed without transitions: 4 counted transitions
    assert mc.counts.sum() == len(types) - 2
    # nothing ever transitions ON the reset symbol's delta row from a
    # counted walk that includes state teleports: every counted
    # transition must agree with delta on a non-reset symbol
    delta = compiled.sdfa.delta
    non_reset = [s for s in range(delta.shape[1]) if s != reset_sym]
    import numpy as np

    valid = set()
    for frm in range(delta.shape[0]):
        for s in non_reset:
            valid.add((frm, int(delta[frm, s])))
    for frm, to in zip(*np.nonzero(mc.counts)):
        assert (int(frm), int(to)) in valid
    # and the walk restarted from state 0 after each RESET: the A after
    # a reset leaves state 0, so state 0 has >= 3 outgoing counts
    assert mc.counts[0].sum() >= 3
