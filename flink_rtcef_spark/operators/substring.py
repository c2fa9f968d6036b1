"""Exact duplicate-substring removal — the suffix-array dedup of Lee
et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", ExactSubstr) re-expressed as Spark aggregates.

ExactSubstr semantics: any token run of length >= k that occurs more
than once in the corpus is removed from every occurrence EXCEPT one.
The reference implementation builds a corpus-wide suffix array (single
machine, O(corpus) RAM + disk); that shape does not distribute.  The
equivalent distributed formulation detects duplication at k-gram
anchors: a token position is *covered by a duplicate* iff the k-gram
starting there occurs elsewhere — and a maximal duplicated run of
length m >= k is exactly a maximal chain of m - k + 1 duplicated
anchors, so merging overlapping/adjacent anchors reconstructs the
suffix-array spans without any global structure.

Scale design (100 TB):
- Anchor hashing is wholly JVM-side (``transform`` + ``slice`` +
  ``xxhash64`` inside whole-stage codegen) — no Python in the hot path.
- The only corpus-sized shuffle is the groupBy/window on the 8-byte
  anchor hash: O(total tokens) rows of (hash, doc, pos) — linear, the
  same asymptotic cost the suffix array pays, but partitionable.
- Span merging is a per-document window (lag + running sum), one
  shuffle keyed by doc id.
- 64-bit hashing stands in for shingle equality; a corpus with T
  anchors sees an expected T^2/2^65 false collisions (irrelevant
  next to the tokenizer normalization already applied).  Carrying the
  shingle text instead would multiply shuffle volume by k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_rtcef_spark.operators.text import whitespace_tokens

#: Lee et al. use 50 BPE tokens; parameterized here (tests use small k)
DEFAULT_MIN_LENGTH = 50

_SEP = "\x1f"  # unit separator: cannot appear inside whitespace tokens


def _anchor_hashes(toks: Column, k: int) -> Column:
    """array<struct<pos int, h long>> — one entry per k-gram anchor
    position (1-based), empty when the document has < k tokens."""
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - k + 1),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.xxhash64(F.concat_ws(_SEP, F.slice(toks, i, k))).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))


def duplicate_kgram_spans(
    df: DataFrame,
    k: int = DEFAULT_MIN_LENGTH,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_first: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A span [start_tok, end_tok] (1-based, inclusive) is emitted for
    every maximal run of tokens composed of k-grams that occur more
    than once in the corpus.  With ``keep_first`` the globally first
    occurrence of each k-gram (min (doc, pos)) is exempt — the
    ExactSubstr "remove all but one copy"; ``keep_first=False`` marks
    every occurrence (useful for contamination audits).

    Output: id_col, start_tok, end_tok, n_tokens.
    """
    anchors = df.select(
        F.col(id_col),
        F.explode(_anchor_hashes(whitespace_tokens(text_col), k)).alias("a"),
    ).select(id_col, F.col("a.pos").alias("pos"), F.col("a.h").alias("h"))

    by_hash = W.partitionBy("h")
    dup = anchors.withColumn("_n", F.count(F.lit(1)).over(by_hash))
    if keep_first:
        order = by_hash.orderBy(id_col, "pos")
        dup = dup.withColumn("_rn", F.row_number().over(order)).filter(
            (F.col("_n") > 1) & (F.col("_rn") > 1)
        )
    else:
        dup = dup.filter(F.col("_n") > 1)

    # islands-and-gaps per doc: anchors whose k-gram windows overlap or
    # touch (gap <= k) chain into one maximal duplicated run
    by_doc = W.partitionBy(id_col).orderBy("pos")
    spans = (
        dup.withColumn(
            "_brk",
            (
                F.col("pos") - F.lag("pos", 1, -(10**9)).over(by_doc) > k
            ).cast("int"),
        )
        .withColumn("_island", F.sum("_brk").over(by_doc))
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + k - 1).alias("end_tok"),
        )
        .select(
            id_col,
            "start_tok",
            F.col("end_tok").cast("int").alias("end_tok"),
            (F.col("end_tok") - F.col("start_tok") + 1).cast("int").alias("n_tokens"),
        )
    )
    return spans


def remove_duplicate_substrings(
    df: DataFrame,
    k: int = DEFAULT_MIN_LENGTH,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr cut: rebuild each document with every duplicated
    span (beyond the kept first occurrence) removed.

    Output = ``df`` with ``text_col`` replaced by the whitespace-token
    reconstruction (single-space joined — the same normalization the
    rest of the curation chain applies) and an ``n_cut_tokens`` count.
    Documents with nothing to cut pass through with ``n_cut_tokens=0``.
    """
    spans = duplicate_kgram_spans(df, k, text_col, id_col, keep_first=True)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("_spans")
    )
    toks = whitespace_tokens(text_col)
    indexed = F.transform(toks, lambda t, i: F.struct((i + 1).alias("i"), t.alias("t")))
    kept = F.filter(
        indexed,
        lambda x: ~F.exists(
            F.col("_spans"),
            lambda s: (s["start_tok"] <= x["i"]) & (x["i"] <= s["end_tok"]),
        ),
    )
    out_cols = [
        F.concat_ws(" ", F.transform(kept, lambda x: x["t"])).alias(text_col)
        if c == text_col
        else F.col(c)
        for c in df.columns
    ]
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("_spans", F.coalesce("_spans", F.array()))
        .select(
            *out_cols,
            (F.size(toks) - F.size(kept)).cast("int").alias("n_cut_tokens"),
        )
    )
