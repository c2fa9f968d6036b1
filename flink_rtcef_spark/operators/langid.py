"""N-gram language identification (Cavnar & Trenkle 1994, the
"out-of-place" character-n-gram method — what langid tooling used
before fasttext, and still the robust zero-dependency baseline).

Two phases, the standard fit/apply asymmetry:
- FIT (distributed): per-language character n-gram counts over a
  labeled corpus -> the top-``profile_size`` n-grams per language with
  their ranks.  One explode + two map-side-combinable aggregates; the
  fitted profile is o(languages x profile_size) rows — tiny.
- CLASSIFY (map-side): each document's n-gram ranks compare against
  every language profile; the language with the smallest total
  out-of-place distance wins.  Profiles broadcast; scoring runs as a
  JVM join + aggregate (no Python), grouped per (doc, lang) with a
  map-side combine.

Character n-grams (default 1..3, word-marked with '_' padding as in
the paper) rather than words: they survive morphology, misspellings,
and short texts — the reason the method works on tweets and titles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

DEFAULT_PROFILE_SIZE = 300


def char_ngrams(text_col: str | Column = "text", n_max: int = 3) -> Column:
    """All character 1..n_max-grams of the padded, lowercased text —
    one flattened array column, fully JVM-side."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    padded = F.concat(
        F.lit("_"),
        F.regexp_replace(F.lower(F.trim(c)), r"\s+", "_"),
        F.lit("_"),
    )
    def grams_of(n: int) -> Column:
        # NB the lambda must stay arity-1: F.transform passes (element,
        # index) to arity-2 lambdas, so a `n=n` default would silently
        # receive the array index as the substring length
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - (n - 1), F.lit(1))),
            lambda i: padded.substr(i, F.lit(n)),
        )

    return F.flatten(F.array(*[grams_of(n) for n in range(1, n_max + 1)]))


def fit_language_profiles(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    profile_size: int = DEFAULT_PROFILE_SIZE,
    n_max: int = 3,
) -> DataFrame:
    """(lang, gram, rank): the top-``profile_size`` character n-grams
    per language, rank 1 = most frequent.  Ties break lexicographically
    so the profile is deterministic."""
    grams = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_ngrams(text_col, n_max)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("lang").orderBy(F.col("c").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= profile_size)
        .select("lang", "gram", "rank")
    )


def classify_language(
    df: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    profile_size: int = DEFAULT_PROFILE_SIZE,
    n_max: int = 3,
) -> DataFrame:
    """(id, pred_lang, distance): smallest summed out-of-place distance
    wins.  A document n-gram absent from a profile costs the maximum
    displacement (``profile_size``), as in the paper.

    Document profiles are capped at ``profile_size`` ranks too, so the
    distance is bounded and length-invariant.  All joins broadcast the
    profile side; the only corpus-keyed shuffles are the per-doc rank
    window and the per-(doc, lang) sum, both map-side combinable.
    """
    doc_counts = (
        df.select(F.col(id_col), F.explode(char_ngrams(text_col, n_max)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("c").desc(), F.col("gram").asc())
    doc_prof = (
        doc_counts.withColumn("drank", F.row_number().over(w))
        .filter(F.col("drank") <= profile_size)
        .select(id_col, "gram", "drank")
    )
    langs = profiles.select("lang").distinct()
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["lang", "gram"], "left")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(
                F.when(
                    F.col("rank").isNotNull(),
                    F.abs(F.col("drank") - F.col("rank")),
                ).otherwise(F.lit(profile_size))
            ).alias("distance")
        )
    )
    pick = W.partitionBy(id_col).orderBy(F.col("distance").asc(), F.col("lang").asc())
    return (
        scored.withColumn("__r", F.row_number().over(pick))
        .filter(F.col("__r") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"), "distance")
    )
