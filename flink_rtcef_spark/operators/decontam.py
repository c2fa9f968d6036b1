"""Benchmark decontamination — drop training documents that leak
evaluation data.

Standard practice before training on a web-scale corpus: any document
sharing a long word n-gram (13-grams are the common choice) with an
evaluation benchmark is flagged as contaminated and removed, otherwise
benchmark scores measure memorization.  The two sides are wildly
asymmetric — the corpus is the 100 TB side, the benchmark suite is
megabytes — which fixes the plan shape:

1. benchmark → normalized distinct n-gram HASHES (xxhash64, 8 B each;
   a full benchmark suite is a few million grams → tens of MB),
2. corpus → explode to n-gram hashes (JVM-side transform, no Python),
3. inner join with the benchmark side BROADCAST — no shuffle of the
   corpus ever happens; each task streams its rows past an in-memory
   hash set,
4. per-doc hit count → flag / anti-join.

Normalization (lowercase, strip non-alphanumerics, collapse
whitespace) happens identically on both sides so formatting
differences don't hide leaks.  Hash collisions can only over-flag
(false contamination) at ~2^-64 per pair — the safe direction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

DEFAULT_N = 13


def _norm_tokens(text_col: str) -> Column:
    cleaned = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
    return F.filter(F.split(F.trim(cleaned), " "), lambda x: x != "")


def ngram_hash_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram_hash) — one row per normalized word n-gram occurrence,
    hashed to 64 bits.  Documents shorter than n tokens produce no
    grams (they cannot contain a full benchmark n-gram)."""
    # NB sequence(1, 0) yields the DESCENDING [1, 0] — short docs must
    # take the empty-array branch, not a clamped sequence bound
    grams = F.expr(
        f"if(size(toks) >= {n},"
        f" transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> xxhash64(concat_ws(' ', slice(toks, i, {n})))),"
        " array())"
    )
    return (
        df.select(F.col(id_col), _norm_tokens(text_col).alias("toks"))
        .select(id_col, F.explode(grams).alias("gram_hash"))
    )


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document contamination evidence: (doc_id, n_contaminated_grams)
    for every document sharing ≥1 normalized n-gram with the benchmark.
    Clean documents are absent (anti-join against this to keep them)."""
    bench_grams = (
        ngram_hash_sets(
            benchmark.select(F.lit(0).alias("__b"), F.col(bench_text_col)),
            "__b",
            bench_text_col,
            n,
        )
        .select("gram_hash")
        .distinct()
    )
    doc_grams = ngram_hash_sets(docs, doc_id_col, text_col, n)
    return (
        doc_grams.join(broadcast(bench_grams), "gram_hash")
        .groupBy(doc_id_col)
        .agg(F.count("*").alias("n_contaminated_grams"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """The clean corpus: documents with zero shared n-grams.  Anti-join
    on the hit list — the corpus is scanned twice (once to build hits,
    once to filter) but never shuffled; the hit list is small (only
    contaminated ids) and broadcasts."""
    hits = contamination_hits(docs, benchmark, n, doc_id_col, text_col, bench_text_col)
    return docs.join(
        broadcast(hits.select(doc_id_col)), doc_id_col, "left_anti"
    )
