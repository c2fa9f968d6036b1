"""Distributed BPE training must reproduce the classical sequential
algorithm exactly, and encoding must be lossless and map-side."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from flink_rtcef_spark.operators.bpe import EOW, encode_bpe, train_bpe


def _reference_bpe(words: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Sennrich's algorithm, sequential, freq-weighted over distinct
    words; ties break lexicographically (same rule as train_bpe)."""
    freqs = Counter(words)
    splits = {w: tuple(w) + (EOW,) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in freqs.items():
            s = splits[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        for w in splits:
            s, out, i = splits[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            splits[w] = tuple(out)
    return merges


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wider wide widest wider",
]


def test_train_matches_reference_algorithm(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    got = train_bpe(df, n_merges=12, sample=None)
    words = " ".join(CORPUS).split()
    want = _reference_bpe(words, 12)
    assert got == want


def test_training_is_partitioning_invariant(spark):
    rows = [(i, t) for i, t in enumerate(CORPUS * 4)]
    a = train_bpe(
        spark.createDataFrame(rows, "doc_id long, text string").repartition(7),
        8, sample=None,
    )
    b = train_bpe(
        spark.createDataFrame(rows[::-1], "doc_id long, text string").repartition(2),
        8, sample=None,
    )
    assert a == b


def test_encode_is_lossless_and_compresses(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    merges = train_bpe(df, n_merges=15, sample=None)
    enc = {r["doc_id"]: r for r in encode_bpe(df, merges).collect()}
    for i, text in enumerate(CORPUS):
        toks = enc[i]["bpe_tokens"]
        # lossless: stripping markers and joining reconstructs the text
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        assert rebuilt == text.lower()
        # learned merges compress vs character-level
        n_char_level = sum(len(w) + 1 for w in text.split())
        assert enc[i]["n_bpe_tokens"] < n_char_level


def test_frequent_word_becomes_single_token(spark):
    df = spark.createDataFrame(
        [(0, "spark " * 30 + "rare")], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=10, sample=None)
    enc = encode_bpe(df, merges).collect()[0]
    assert f"spark{EOW}" in enc["bpe_tokens"]


def test_encode_plan_is_map_side(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    out = encode_bpe(df, [("a", EOW)])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert not re.findall(r"\(\d+\) Exchange", plan)
