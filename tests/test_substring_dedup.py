"""ExactSubstr duplicate-substring removal (operators/substring.py)
against a brute-force per-k-gram oracle."""

from __future__ import annotations

import numpy as np
import pytest

from flink_rtcef_spark.operators.substring import (
    duplicate_kgram_spans,
    remove_duplicate_substrings,
)


def brute_spans(docs: dict[int, str], k: int, keep_first: bool = True):
    """Reference implementation: enumerate every k-gram occurrence,
    find duplicated k-grams, exempt the global first occurrence, merge
    each doc's covered token positions into maximal spans."""
    occs: dict[tuple, list[tuple[int, int]]] = {}
    toks = {d: t.lower().split() for d, t in docs.items()}
    for d in sorted(toks):
        tt = toks[d]
        for p in range(len(tt) - k + 1):
            occs.setdefault(tuple(tt[p : p + k]), []).append((d, p + 1))
    covered: dict[int, set[int]] = {d: set() for d in docs}
    for gram, sites in occs.items():
        if len(sites) < 2:
            continue
        sites = sorted(sites)
        for d, p in sites[1:] if keep_first else sites:
            covered[d].update(range(p, p + k))
    spans = []
    for d, pos in covered.items():
        if not pos:
            continue
        run = sorted(pos)
        start = prev = run[0]
        for x in run[1:]:
            if x == prev + 1:
                prev = x
                continue
            spans.append((d, start, prev, prev - start + 1))
            start = prev = x
        spans.append((d, start, prev, prev - start + 1))
    return sorted(spans)


def brute_cut(docs: dict[int, str], k: int):
    spans = brute_spans(docs, k, keep_first=True)
    cut = {d: set() for d in docs}
    for d, s, e, _ in spans:
        cut[d].update(range(s, e + 1))
    out = {}
    for d, t in docs.items():
        tt = t.lower().split()
        kept = [w for i, w in enumerate(tt, start=1) if i not in cut[d]]
        out[d] = (" ".join(kept), len(tt) - len(kept))
    return out


def _spark_spans(spark, docs, k, keep_first=True):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    return sorted(
        (r["doc_id"], r["start_tok"], r["end_tok"], r["n_tokens"])
        for r in duplicate_kgram_spans(df, k=k, keep_first=keep_first).collect()
    )


FIXTURE = {
    1: "the quick brown fox jumps over the lazy dog again and again",
    2: "a different preamble the quick brown fox jumps over the lazy dog tail",
    3: "totally unique words nothing shared here at all",
    4: "the quick brown fox jumps over the lazy dog again and again",  # == doc 1
    5: "short",
}


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("keep_first", [True, False])
def test_spans_match_bruteforce(spark, k, keep_first):
    assert _spark_spans(spark, FIXTURE, k, keep_first) == brute_spans(
        FIXTURE, k, keep_first
    )


def test_spans_match_bruteforce_randomized(spark):
    """Random small-vocab corpora force heavy repetition and adjacent
    island edge cases."""
    rng = np.random.default_rng(11)
    for trial in range(3):
        docs = {
            d: " ".join(rng.choice(list("abcdefg"), size=rng.integers(1, 60)))
            for d in range(1, 13)
        }
        k = int(rng.integers(2, 6))
        assert _spark_spans(spark, docs, k) == brute_spans(docs, k), (trial, k)


def test_remove_matches_bruteforce(spark):
    k = 4
    df = spark.createDataFrame(
        [(d, t) for d, t in FIXTURE.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_cut_tokens"])
        for r in remove_duplicate_substrings(df, k=k).collect()
    }
    assert got == brute_cut(FIXTURE, k)


def test_first_occurrence_survives_verbatim(spark):
    """Doc 1 and doc 4 are identical; exactly one keeps its text."""
    df = spark.createDataFrame(
        [(d, t) for d, t in FIXTURE.items()], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_substrings(df, k=5).collect()
    }
    assert out[1] == FIXTURE[1]  # global first occurrence, untouched
    assert out[3] == FIXTURE[3]  # unique doc untouched
    assert out[5] == FIXTURE[5]  # sub-k doc untouched
    assert len(out[4].split()) < len(FIXTURE[4].split())


def test_plan_has_no_python_udf(spark):
    """Anchor hashing and span cutting stay JVM-side."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    for frame in (
        duplicate_kgram_spans(df, k=2),
        remove_duplicate_substrings(df, k=2),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
