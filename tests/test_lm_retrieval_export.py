"""Operator-level semantics for the r3 additions: unigram-LM
perplexity, BM25 retrieval, corpus-wide paragraph dedup, SemDeDup
clustered near-dup, and deterministic shard export.  (Their registered
queries are hash-checked against DuckDB in test_queries_oracle.py;
these tests pin the semantics the oracle can't see — held-out scoring,
ranking order, delimiter mode, the keep rule, write determinism.)"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- lm --
def test_unigram_perplexity_rare_tokens_score_higher(spark):
    from flink_rtcef_spark.operators.lm import unigram_perplexity

    df = _docs(
        spark,
        [(1, "common common common common"), (2, "common rare")],
    )
    out = {r["doc_id"]: r["ppl_bits"] for r in unigram_perplexity(df).collect()}
    # doc 2 contains the rare token -> strictly higher bits/token
    assert out[2] > out[1]


def test_unigram_perplexity_exact_value(spark):
    from flink_rtcef_spark.operators.lm import unigram_perplexity

    # corpus: 3x "a", 1x "b"; N=4, V=2, alpha=0.5
    df = _docs(spark, [(1, "a a a"), (2, "b")])
    p_a = (3 + 0.5) / (4 + 0.5 * 2)
    p_b = (1 + 0.5) / (4 + 0.5 * 2)
    out = {r["doc_id"]: r["ppl_bits"] for r in unigram_perplexity(df).collect()}
    assert out[1] == pytest.approx(round(-math.log2(p_a), 6), abs=1e-6)
    assert out[2] == pytest.approx(round(-math.log2(p_b), 6), abs=1e-6)


def test_unigram_perplexity_heldout_unseen_token(spark):
    from flink_rtcef_spark.operators.lm import unigram_model, unigram_perplexity

    train = _docs(spark, [(1, "a a a b")])
    model = unigram_model(train)
    held = _docs(spark, [(9, "zzz")])
    out = unigram_perplexity(held, model=model).collect()[0]
    # unseen token: p = alpha / (N + alpha*V) — finite, no blow-up
    p_unseen = 0.5 / (4 + 0.5 * 2)
    assert out["ppl_bits"] == pytest.approx(round(-math.log2(p_unseen), 6), abs=1e-6)


def test_perplexity_filter_drops_tail(spark):
    from flink_rtcef_spark.operators.lm import perplexity_filter, unigram_perplexity

    df = _docs(spark, [(1, "x x x x x x x x"), (2, "x weird")])
    bits = {r["doc_id"]: r["ppl_bits"] for r in unigram_perplexity(df).collect()}
    cut = (bits[1] + bits[2]) / 2
    kept = [r["doc_id"] for r in perplexity_filter(df, cut).collect()]
    assert kept == [1]


def test_empty_document_scores_zero(spark):
    from flink_rtcef_spark.operators.lm import unigram_perplexity

    df = _docs(spark, [(1, "a b"), (2, "")])
    out = {r["doc_id"]: r for r in unigram_perplexity(df).collect()}
    assert out[2]["n_tokens"] == 0 and out[2]["ppl_bits"] == 0.0


# ----------------------------------------------------------- retrieval --
def test_bm25_term_frequency_and_idf_ordering(spark):
    from flink_rtcef_spark.operators.retrieval import bm25_topk

    df = _docs(
        spark,
        [
            (1, "cat cat cat dog"),   # 3x cat
            (2, "cat dog dog"),       # 1x cat
            (3, "bird bird"),         # no query terms
            (4, "fish"),
        ],
    )
    out = bm25_topk(df, ["cat"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1 and set(ids) == {1, 2}  # doc 3/4 never match
    assert out[0]["score"] > out[1]["score"]


def test_bm25_length_normalization(spark):
    from flink_rtcef_spark.operators.retrieval import bm25_topk

    # same tf, longer doc scores lower
    df = _docs(
        spark,
        [(1, "q " + "pad " * 50), (2, "q pad")],
    )
    out = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["q"], k=10).collect()}
    assert out[2] > out[1]


def test_bm25_multi_term_sums(spark):
    from flink_rtcef_spark.operators.retrieval import bm25_topk

    df = _docs(spark, [(1, "alpha beta"), (2, "alpha"), (3, "gamma")])
    out = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["alpha", "beta"], k=10).collect()}
    assert out[1] > out[2]  # both terms beat one


# ----------------------------------------------------- paragraph dedup --
def test_dedup_paragraphs_delimiter_mode_keep_first(spark):
    from flink_rtcef_spark.operators.text import dedup_paragraphs

    df = _docs(
        spark,
        [
            (1, "intro text\n\nshared footer"),
            (2, "other body\n\nshared footer"),
            (3, "shared footer"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    # doc 1 (lowest id) keeps the footer; docs 2 and 3 lose it
    assert out[1]["n_kept"] == 2 and out[1]["text"] == "intro text\n\nshared footer"
    assert out[2]["n_kept"] == 1 and out[2]["text"] == "other body"
    assert out[3]["n_kept"] == 0 and out[3]["text"] == ""
    assert out[3]["n_paras"] == 1


def test_dedup_paragraphs_within_doc_repeat(spark):
    from flink_rtcef_spark.operators.text import dedup_paragraphs

    df = _docs(spark, [(1, "same para\n\nsame para\n\nunique")])
    out = dedup_paragraphs(df).collect()[0]
    assert out["n_paras"] == 3 and out["n_kept"] == 2
    assert out["text"] == "same para\n\nunique"


def test_dedup_paragraphs_block_mode_boundaries(spark):
    from flink_rtcef_spark.operators.text import dedup_paragraphs

    # 5 tokens, block 2 -> blocks of 2/2/1
    df = _docs(spark, [(1, "a b a b c")])
    out = dedup_paragraphs(df, block_tokens=2).collect()[0]
    assert out["n_paras"] == 3 and out["n_kept"] == 2
    assert out["text"] == "a b c"


def test_dedup_paragraphs_result_is_input_order_insensitive(spark):
    from flink_rtcef_spark.operators.text import dedup_paragraphs

    rows = [(i, f"body {i}\n\ncommon tail") for i in range(1, 9)]
    df1 = _docs(spark, rows).repartition(8)
    df2 = _docs(spark, rows[::-1]).repartition(2)
    r1 = sorted(map(tuple, dedup_paragraphs(df1).collect()))
    r2 = sorted(map(tuple, dedup_paragraphs(df2).collect()))
    assert r1 == r2  # global keep-first is content-determined, not partition-determined


# ------------------------------------------------------ semantic dedup --
def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_matches_bruteforce(spark):
    from flink_rtcef_spark.operators.dedup import semantic_dedup_pairs

    rng = np.random.RandomState(7)
    base = rng.randn(6, 16)
    vecs = list(base)
    # near-duplicates of rows 2 and 4
    vecs.append(base[2] + 0.01 * rng.randn(16))
    vecs.append(base[4] + 0.01 * rng.randn(16))
    df = _emb(spark, vecs)
    pairs = semantic_dedup_pairs(df, n_clusters=3, threshold=0.95)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # brute force within the SAME clustering
    mat = np.array(vecs)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cents = matn[:3]
    assign = np.argmax(matn @ cents.T, axis=1)
    want = set()
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            if assign[i] == assign[j] and matn[i] @ matn[j] >= 0.95:
                want.add((i, j))
    assert got == want
    assert (2, 6) in got and (4, 7) in got


def test_semantic_dedup_keep_drops_higher_id_twin(spark):
    from flink_rtcef_spark.operators.dedup import semantic_dedup_keep

    rng = np.random.RandomState(3)
    base = rng.randn(5, 8)
    vecs = list(base) + [base[1] * 1.001]  # id 5 duplicates id 1
    df = _emb(spark, vecs)
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup_keep(df, n_clusters=2, threshold=0.99).collect()
    )
    assert 5 not in kept and 1 in kept and len(kept) == 5


# ------------------------------------------------------------- export --
def test_write_shards_deterministic_and_balanced(spark, tmp_path):
    from flink_rtcef_spark.operators.export import shard_manifest, write_shards

    rows = [(i, f"doc number {i} body") for i in range(2000)]
    df1 = _docs(spark, rows).repartition(16)
    df2 = _docs(spark, rows[::-1]).repartition(3)  # different order+partitioning

    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    write_shards(df1, p1, n_shards=8)
    write_shards(df2, p2, n_shards=8)

    r1 = spark.read.parquet(p1)
    r2 = spark.read.parquet(p2)
    # same rows in the same shards regardless of input layout
    a = sorted(map(tuple, r1.select("shard", "doc_id").collect()))
    b = sorted(map(tuple, r2.select("shard", "doc_id").collect()))
    assert a == b
    # exactly one file per shard
    import glob

    for s in range(8):
        files = glob.glob(f"{p1}/shard={s}/*.parquet")
        assert len(files) == 1, (s, files)
    # balance: no shard more than 2x the ideal
    counts = {r["shard"]: r["cnt"] for r in r1.groupBy("shard").agg(F.count("*").alias("cnt")).collect()}
    assert len(counts) == 8 and max(counts.values()) < 2 * (2000 / 8)


def test_shard_rows_sorted_within_file(spark, tmp_path):
    from flink_rtcef_spark.operators.export import write_shards

    rows = [(i, f"t {i}") for i in range(500)]
    p = str(tmp_path / "sorted")
    write_shards(_docs(spark, rows), p, n_shards=4)
    import pyarrow.parquet as pq
    import glob

    f = glob.glob(f"{p}/shard=0/*.parquet")[0]
    t = pq.read_table(f).to_pandas()
    assert list(t["sort_key"]) == sorted(t["sort_key"])


def test_shard_manifest_covers_all_rows(spark):
    from flink_rtcef_spark.operators.export import shard_manifest

    df = _docs(spark, [(i, "a b c") for i in range(300)])
    m = shard_manifest(df, n_shards=5).collect()
    assert sum(r["n_docs"] for r in m) == 300
    assert sum(r["n_tokens"] for r in m) == 900
    assert sorted(r["shard"] for r in m) == [0, 1, 2, 3, 4]


def test_curriculum_export_orders_within_shard(spark, tmp_path):
    from flink_rtcef_spark.operators.export import write_shards

    rows = [(i, f"body {i}", float((i * 37) % 100)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    p = str(tmp_path / "curr")
    write_shards(df, p, n_shards=4, order_col="score")
    import glob

    import pyarrow.parquet as pq

    for s in range(4):
        f = glob.glob(f"{p}/shard={s}/*.parquet")[0]
        t = pq.read_table(f).to_pandas()
        assert list(t["score"]) == sorted(t["score"])
    # shard membership unchanged by the order override
    r = spark.read.parquet(p)
    base = str(tmp_path / "plain")
    write_shards(df, base, n_shards=4)
    a = sorted(map(tuple, r.select("shard", "doc_id").collect()))
    b = sorted(map(tuple, spark.read.parquet(base).select("shard", "doc_id").collect()))
    assert a == b
