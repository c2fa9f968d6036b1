"""Cavnar-Trenkle n-gram language ID: profile fitting determinism,
classification accuracy on held-out text, short-text robustness, and
the broadcast plan shape."""

from __future__ import annotations

import re

EN = [
    "the quick brown fox jumps over the lazy dog",
    "this is a simple english sentence with common words",
    "where there is a will there is a way to win",
    "reading books in the evening is something that they enjoy",
]
DE = [
    "der schnelle braune fuchs springt ueber den faulen hund",
    "dies ist ein einfacher deutscher satz mit typischen woertern",
    "wo ein wille ist ist auch ein weg zum ziel",
    "abends buecher zu lesen macht ihnen grosse freude",
]
FR = [
    "le renard brun rapide saute par dessus le chien paresseux",
    "ceci est une phrase francaise simple avec des mots courants",
    "quand on veut on peut trouver un chemin vers le but",
    "lire des livres le soir est quelque chose qui leur plait",
]


def _train_df(spark):
    rows = [(i, "en", t) for i, t in enumerate(EN)]
    rows += [(100 + i, "de", t) for i, t in enumerate(DE)]
    rows += [(200 + i, "fr", t) for i, t in enumerate(FR)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_char_ngrams_padding_and_orders(spark):
    from flink_rtcef_spark.operators.langid import char_ngrams

    df = spark.createDataFrame([(1, "ab c")], "doc_id long, text string")
    grams = df.select(char_ngrams().alias("g")).first()["g"]
    # padded form is _ab_c_: unigrams, bigrams, trigrams all present
    assert "_" in grams and "a" in grams
    assert "_a" in grams and "ab" in grams and "b_" in grams and "_c" in grams
    assert "_ab" in grams and "ab_" in grams and "b_c" in grams


def test_classifier_recovers_languages_on_heldout(spark):
    from flink_rtcef_spark.operators.langid import (
        classify_language,
        fit_language_profiles,
    )

    profiles = fit_language_profiles(_train_df(spark), profile_size=200)
    held = spark.createDataFrame(
        [
            (1, "the children play in the garden with their friends"),
            (2, "die kinder spielen im garten mit ihren freunden"),
            (3, "les enfants jouent dans le jardin avec leurs amis"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in classify_language(held, profiles).collect()}
    assert got == {1: "en", 2: "de", 3: "fr"}


def test_short_text_still_classifies(spark):
    from flink_rtcef_spark.operators.langid import (
        classify_language,
        fit_language_profiles,
    )

    profiles = fit_language_profiles(_train_df(spark), profile_size=200)
    held = spark.createDataFrame(
        [(1, "the dog"), (2, "der hund")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["pred_lang"] for r in classify_language(held, profiles).collect()}
    assert got[1] == "en" and got[2] == "de"


def test_profiles_deterministic_across_partitionings(spark):
    from flink_rtcef_spark.operators.langid import fit_language_profiles

    a = sorted(map(tuple, fit_language_profiles(_train_df(spark).repartition(13)).collect()))
    b = sorted(map(tuple, fit_language_profiles(_train_df(spark).repartition(2)).collect()))
    assert a == b


def test_classify_plan_broadcasts_profiles(spark):
    from flink_rtcef_spark.operators.langid import (
        classify_language,
        fit_language_profiles,
    )

    profiles = fit_language_profiles(_train_df(spark)).localCheckpoint(eager=True)
    df = classify_language(_train_df(spark), profiles)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
