"""Keyword retrieval over the corpus: document frequency, IDF, and
BM25 top-k search — the inverted-index workload expressed as Spark
aggregates (quality-filter pipelines use it for boilerplate-query
mining and decontamination triage; analysts use it as plain search).

Scale design (100 TB corpus):
- The term filter runs BEFORE any explode: ``arrays_overlap`` on the
  tokenized row prunes non-matching documents map-side, so only
  matching documents ever produce exploded token rows.  For a q-term
  query the shuffled volume is o(matching docs x q), not o(tokens).
- Corpus stats (N, avgdl) and per-term document frequencies are
  one-row / q-row aggregates -> broadcast joins; the only shuffle
  keyed on the corpus is the per-(doc, term) tf hash-aggregate, which
  combines map-side.
- Top-k is a TakeOrdered (per-partition heap + driver merge of k), not
  a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.text import whitespace_tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 (Robertson/Sparck Jones, the Lucene-default scoring) top-k
    documents for a bag-of-terms query.

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score   = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Output: id_col, score (rounded to 6), ties broken by id ascending.
    """
    terms = [t.lower() for t in terms]

    # r9 (guide §4.2): the corpus-wide work never builds a token ARRAY.
    # dl (the only corpus-wide per-doc value) is regexp_count of
    # non-space runs — the same integer as the filtered-split length
    # without allocating the strings.  Only the matching documents are
    # ever tokenized.  Formerly BOTH the stats scan and the match scan
    # tokenized every document (the dominant CPU: 6.4 CPU-s for a 0.9 s
    # wall at sf0.1).
    # r10 (guide §4.2, per-row work): the match prefilter drops the
    # regex engine — an OR of plain substring ``contains`` per term is
    # a strict SUPERSET of the former token-boundary rlike (a
    # whitespace-delimited token is in particular a substring), and the
    # exact ``isin`` gate on exploded tokens below still decides
    # membership, so the result is unchanged; the only cost of a
    # substring false positive is tokenizing that one document.  At
    # corpus scale the prefilter runs on EVERY document, so per-row
    # cost is the lever: substring search beats the alternation regex.
    dl_expr = F.regexp_count(F.trim(F.col(text_col)), F.lit(r"\S+"))
    contains_any = None
    for t in terms:
        c = F.contains(F.lower(F.col(text_col)), F.lit(t))
        contains_any = c if contains_any is None else (contains_any | c)

    base = df.select(F.col(id_col), F.col(text_col), dl_expr.alias("dl"))
    # corpus stats: one tiny row, broadcast everywhere
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # map-side prune: only documents containing >=1 query term survive
    matched = base.filter(contains_any)
    tf = (
        matched.select(
            id_col, "dl", F.explode(whitespace_tokens(text_col)).alias("tok")
        )
        .filter(F.col("tok").isin(*terms))
        .groupBy(id_col, "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        # tf feeds both the per-term document frequencies and the final
        # scoring; lazy localCheckpoint so the matched-corpus explode
        # runs once per invocation, not once per consumer (o(matching
        # docs x terms) rows) — and, unlike persist, never reuses a
        # previous invocation's cached blocks via plan dedup
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .withColumn(
            "_s",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def bm25_oracle_sql(
    terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The DuckDB twin of :func:`bm25_topk` (driver correctness gate)."""
    terms_sql = ", ".join(f"'{t.lower()}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT {id_col}, tok, dl FROM (
    SELECT {id_col},
           unnest(list_filter(string_split_regex(lower(trim({text_col})), '\\s+'), x -> x <> '')) AS tok,
           len(list_filter(string_split_regex(lower(trim({text_col})), '\\s+'), x -> x <> '')) AS dl
    FROM {table})
),
stats AS (
  -- over ALL documents (incl. token-less ones), matching the Spark
  -- pre-explode aggregate
  SELECT COUNT(*) AS n_docs,
         AVG(len(list_filter(string_split_regex(lower(trim({text_col})), '\\s+'), x -> x <> ''))) AS avgdl
  FROM {table}),
tf AS (
  SELECT {id_col}, dl, tok, COUNT(*) AS tf
  FROM toks WHERE tok IN ({terms_sql})
  GROUP BY {id_col}, dl, tok
),
idf AS (
  SELECT tok, LN(1.0 + (s.n_docs - df_t + 0.5) / (df_t + 0.5)) AS idf, s.avgdl
  FROM (SELECT tok, COUNT(*) AS df_t FROM tf GROUP BY tok), stats s
)
SELECT {id_col}, ROUND(SUM(idf * tf * ({k1} + 1.0) /
         (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))), 6) AS score
FROM tf JOIN idf USING (tok)
GROUP BY {id_col}
ORDER BY score DESC, {id_col} ASC LIMIT {k}
"""
