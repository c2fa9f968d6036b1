"""Distributed BPE (byte-pair encoding) tokenizer training + encoding —
the step past the regex pre-tokenizer (`text.bpe_ish_tokens`): learn
real merge rules from the corpus, then tokenize with them.

Training (Sennrich et al. 2016) is inherently iterative — each round
merges the globally most frequent adjacent symbol pair — so the Spark
shape is: symbol sequences cached once, then per round one
map-side-combinable pair-count aggregate + a 1-row argmax to the
driver + a map-side merge application.  Production trains on a BOUNDED
SAMPLE (tokenizers see diminishing returns past ~10^6 documents) and
encodes the full corpus map-side with the learned merge list broadcast
— the same asymmetry as every other fit/apply operator here, so
training cost is O(sample x n_merges) and corpus encoding is one pass.

Word-internal BPE with end-of-word markers: each word trains and
encodes independently (the </w> marker keeps merges from crossing word
boundaries), which is what makes per-round application a per-row
operation with no shuffle.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    sample: int | None = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from the corpus (or a bounded
    sample of it).

    The per-round aggregate runs DISTRIBUTED over the distinct-word
    table weighted by word frequency — the classical optimization that
    makes BPE training O(vocab) per round instead of O(corpus): pair
    counts only depend on each distinct word's symbol split and its
    corpus frequency.  The word-frequency table is built once (one
    explode + groupBy) and the per-round state (each word's current
    split) lives in a DataFrame column updated by a pandas UDF with the
    single chosen pair broadcast — no shuffle inside a round.

    Ties on pair frequency break lexicographically so training is
    deterministic and partitioning-invariant.
    """
    from flink_rtcef_spark.operators.text import whitespace_tokens

    src = df.select(F.explode(whitespace_tokens(text_col)).alias("w"))
    if sample is not None:
        src = src.limit(sample)
    words = src.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    # initial split: characters + end-of-word marker (JVM-side)
    state = words.select(
        "freq",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(EOW))
        ).alias("sym"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            state.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice("sym", 1, F.size("sym") - 1),
                        F.slice("sym", 2, F.size("sym") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["c"] < 2:
            break
        best = (pairs[0]["l"], pairs[0]["r"])
        merges.append(best)

        @F.pandas_udf("array<string>")
        def _apply(sym: pd.Series) -> pd.Series:
            return pd.Series(
                [list(_merge_word(tuple(s), best)) for s in sym]
            )

        # localCheckpoint, not persist: each round stacks another UDF on
        # the plan, and an uncut lineage of n_merges UDF layers blows up
        # planning long before execution does.  The state is o(vocab).
        state = state.select("freq", _apply("sym").alias("sym")).localCheckpoint(
            eager=True
        )
    return merges


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: one map-side pass
    (merge rules broadcast inside the Arrow UDF), no shuffle.  Output:
    id, bpe_tokens (array<string>), n_bpe_tokens."""
    spark = df.sparkSession
    b_merges = spark.sparkContext.broadcast(list(merges))

    @F.pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        rules = [tuple(m) for m in b_merges.value]
        # rank lookup: apply merges in training order per word
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                sym = _word_symbols(w)
                for pair in rules:
                    if len(sym) < 2:
                        break
                    sym = _merge_word(sym, pair)
                toks.extend(sym)
            out.append(toks)
        return pd.Series(out)

    toks = _encode(F.col(text_col))
    return df.select(
        F.col(id_col),
        toks.alias("bpe_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
    )
