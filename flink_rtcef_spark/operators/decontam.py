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
    # take the empty-array branch, not a clamped sequence bound.
    # r9 (guide §4.2): hash each token ONCE, then hash the n-long
    # slice of token hashes — the former concat_ws built an ~n·13-char
    # string per gram position (the dominant per-row allocation; both
    # decontam queries' CPU sat in this transform).  Both sides build
    # grams through this one function, so matching is unchanged;
    # collision odds stay ~2^-64 and can only over-flag.
    grams = F.expr(
        f"if(size(toks) >= {n},"
        f" transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> xxhash64(slice(th, i, {n}))),"
        " array())"
    )
    return (
        df.select(F.col(id_col), _norm_tokens(text_col).alias("toks"))
        .withColumn("th", F.expr("transform(toks, t -> xxhash64(t))"))
        .select(id_col, F.explode(grams).alias("gram_hash"))
    )


def _bench_gram_hashes(
    benchmark: DataFrame, bench_text_col: str, n: int
) -> DataFrame:
    """Distinct normalized n-gram hashes of the benchmark side — the ONE
    definition both the plain and bloom-prefiltered paths build from
    (diverging copies would silently break their same-exact-result
    contract)."""
    return (
        ngram_hash_sets(
            benchmark.select(F.lit(0).alias("__b"), F.col(bench_text_col)),
            "__b",
            bench_text_col,
            n,
        )
        .select("gram_hash")
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination evidence: (doc_id, n_contaminated_grams)
    for every document sharing ≥1 normalized n-gram with the benchmark.
    Clean documents are absent (anti-join against this to keep them).

    ``broadcast_bench=False`` drops the broadcast hint — the regime
    where the benchmark gram set is too large for executor memory and
    the join becomes a shuffle of EVERY corpus gram.  That regime is
    what the bloom prefilter (:func:`contamination_hits_bloom`) exists
    for; tools/bench_bloom_shuffle.py measures the two head-to-head in
    shuffle BYTES."""
    bench_grams = _bench_gram_hashes(benchmark, bench_text_col, n)
    doc_grams = ngram_hash_sets(docs, doc_id_col, text_col, n)
    verify_side = broadcast(bench_grams) if broadcast_bench else bench_grams
    return (
        doc_grams.join(verify_side, "gram_hash")
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


def fuzzy_contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    n_hashes: int = 8,
    bands: int = 4,
    seed: int = 7,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """NEAR-duplicate decontamination: exact n-gram matching misses
    paraphrased or lightly-edited benchmark leaks, so this pass flags
    corpus documents whose shingle-Jaccard similarity to ANY benchmark
    document reaches ``threshold``.

    Plan shape (corpus 100 TB, benchmark megabytes — same asymmetry as
    the exact pass):
    1. both sides -> minhash signatures -> banded LSH keys; the
       benchmark band table is tiny and BROADCAST, so candidate
       generation never shuffles the corpus;
    2. only candidate corpus docs explode to shingles for the verify
       join (pairs-first, same discipline as dedup.jaccard_verify);
       the benchmark shingle side is again broadcast.

    Output: (doc_id, bench_id, jaccard rounded to 6) per flagged pair,
    jaccard >= threshold.
    """
    from flink_rtcef_spark.operators.dedup import (
        _tokens,
        lsh_band_keys,
        minhash_signatures,
        shingles,
    )

    d_bands = lsh_band_keys(
        minhash_signatures(docs, text_col, doc_id_col, n_hashes, shingle_n, seed),
        doc_id_col, n_hashes, bands,
    )
    b_bands = lsh_band_keys(
        minhash_signatures(
            benchmark, bench_text_col, bench_id_col, n_hashes, shingle_n, seed
        ),
        bench_id_col, n_hashes, bands,
    )
    cands = (
        d_bands.alias("d")
        .join(
            broadcast(b_bands.alias("b")),
            (F.col("d.band") == F.col("b.band")) & (F.col("d.bh") == F.col("b.bh")),
        )
        .select(
            F.col(f"d.{doc_id_col}").alias("doc_id"),
            F.col(f"b.{bench_id_col}").alias("bench_id"),
        )
        .distinct()
    )

    def shingle_rows(df: DataFrame, idc: str, txt: str, out_id: str) -> DataFrame:
        return (
            df.select(F.col(idc).alias(out_id), _tokens(txt).alias("tokens"))
            .select(out_id, F.explode(F.array_distinct(shingles(n=shingle_n))).alias("sh"))
        )

    d_sh = shingle_rows(docs, doc_id_col, text_col, "doc_id").join(
        cands.select("doc_id").distinct(), "doc_id", "left_semi"
    )
    b_sh = shingle_rows(benchmark, bench_id_col, bench_text_col, "bench_id")
    d_sizes = d_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
    b_sizes = b_sh.groupBy("bench_id").agg(F.count(F.lit(1)).alias("n_b"))
    common = (
        cands.join(d_sh, "doc_id")
        .join(broadcast(b_sh), ["bench_id", "sh"])
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = (
        common.join(d_sizes, "doc_id")
        .join(broadcast(b_sizes), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def fuzzy_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    **kwargs,
) -> DataFrame:
    """Drop documents near-duplicating any benchmark document (the
    paraphrase-robust complement to :func:`decontaminate`)."""
    hits = fuzzy_contamination_hits(docs, benchmark, threshold, **kwargs)
    return docs.join(
        broadcast(hits.select("doc_id").distinct()), "doc_id", "left_anti"
    )


def contamination_hits_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    bloom_m: int | None = None,
    bloom_k: int = 4,
    broadcast_verify: bool = True,
) -> DataFrame:
    """:func:`contamination_hits` with a Bloom-filter prefilter on the
    corpus side — the SAME exact result (the bloom never drops a true
    match; its false positives are removed by the exact join), reached
    without streaming every corpus gram into the exact-membership
    probe.

    Why this matters at 100 TB: the benchmark gram set can reach tens
    of millions of entries (~GB as a broadcast hash relation), but its
    bloom is m/8 bytes (default sized at 16 bits/gram ≈ 1/Mn fp with
    k=4).  Each task tests its grams against the broadcast BITSET (k
    word lookups, no shuffle, no explode) and only the survivors — true
    hits plus ~fp·|grams| noise — ever reach the exact join.

    ``broadcast_verify=False`` is the bench-set-outgrew-broadcast mode:
    the exact verify becomes a shuffle join, but the bloom has already
    dropped ~(1-fp) of the corpus grams, so the shuffle carries the
    survivors, not the corpus — whereas the plain operator would
    shuffle EVERY corpus gram (win-condition measurement in
    docs/BENCH_SF1.md).  Composition: operators/sketch.py bloom_build /
    bloom_filter_members.
    """
    from flink_rtcef_spark.operators.sketch import (
        bloom_build,
        bloom_filter_members,
    )

    # r10 negative result (recorded in OPTIMIZATION_r10.md): a lazy
    # localCheckpoint here — to stop the bench-gram subtree building
    # twice (bloom build + exact verify side) — measured 9% SLOWER at
    # sf0.1 in a 3-round interleaved A/B: the checkpoint serializes two
    # cheap independent subtrees behind a block materialization.  The
    # duplicate work is o(benchmark) (megabytes by the operator's
    # asymmetry contract), so the un-cut shape stays.
    bench_grams = _bench_gram_hashes(benchmark, bench_text_col, n)
    if bloom_m is None:
        # default 2^20 bits; a production caller sizes m ≈ 16 bits per
        # distinct benchmark gram (fp ≈ 1e-6 at k=4) — a constant the
        # pipeline owner knows without a counting pass
        bloom_m = 1 << 20
    # prehashed: gram_hash IS a well-mixed xxhash64 — the corpus side
    # pays shifts and masks per gram, not a second digest
    bloom = bloom_build(bench_grams, "gram_hash", bloom_m, bloom_k, prehashed=True)
    doc_grams = ngram_hash_sets(docs, doc_id_col, text_col, n)
    # validate=False: build and probe parameters are the same local
    # variables two lines apart, and validation would evaluate the
    # unmaterialized bench-gram sketch plan a second time per query
    maybe = bloom_filter_members(
        doc_grams, "gram_hash", bloom, bloom_m, bloom_k, prehashed=True,
        validate=False,
    )
    verify_side = broadcast(bench_grams) if broadcast_verify else bench_grams
    return (
        maybe.join(verify_side, "gram_hash")
        .groupBy(doc_id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
