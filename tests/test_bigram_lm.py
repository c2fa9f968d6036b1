"""Interpolated bigram LM: hand-computed ground truth, lam=0 ==
unigram equivalence, DuckDB oracle parity, and the broadcast-only
scoring plan."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.lm import (
    bigram_model,
    bigram_perplexity,
    unigram_perplexity,
)
from flink_rtcef_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

from tools.check_oracle import compare

_BIGRAM_SQL = """
    WITH arrs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS arr
      FROM documents
    ),
    toks AS (
      SELECT doc_id, u.p[1] AS prev, u.p[2] AS cur
      FROM arrs, unnest(list_zip(list_prepend(NULL, arr[1:len(arr)-1]), arr)) AS u(p)
      WHERE len(arr) >= 1
    ),
    uni AS (SELECT cur AS tok, COUNT(*) AS c FROM toks GROUP BY cur),
    bi AS (SELECT prev, cur, COUNT(*) AS bc FROM toks
           WHERE prev IS NOT NULL GROUP BY prev, cur),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM uni),
    scored AS (
      SELECT t.doc_id,
             -log2(CASE WHEN t.prev IS NULL OR pc.c IS NULL
                   THEN (COALESCE(cc.c, 0) + 0.5) / (tot.n + 0.5 * tot.v)
                   ELSE {lam} * COALESCE(b.bc, 0) * 1.0 / pc.c
                        + (1.0 - {lam}) * (COALESCE(cc.c, 0) + 0.5)
                          / (tot.n + 0.5 * tot.v)
                   END) AS bits
      FROM toks t
      LEFT JOIN uni cc ON cc.tok = t.cur
      LEFT JOIN uni pc ON pc.tok = t.prev
      LEFT JOIN bi b ON b.prev = t.prev AND b.cur = t.cur, tot
    ),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(bits), 6) AS ppl_bits
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens,
           COALESCE(p.ppl_bits, 0.0) AS ppl_bits
    FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""


def test_hand_computed(spark):
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    got = bigram_perplexity(df, lam=0.7, alpha=0.5).collect()[0]
    p_uni = 0.5  # (2 + .5) / (4 + .5 * 2)
    bits = [
        -math.log2(p_uni),                      # first token, no context
        -math.log2(0.7 * (2 / 2) + 0.3 * p_uni),  # a -> b
        -math.log2(0.7 * (1 / 2) + 0.3 * p_uni),  # b -> a
        -math.log2(0.7 * (2 / 2) + 0.3 * p_uni),  # a -> b
    ]
    assert got["n_tokens"] == 4
    assert got["ppl_bits"] == pytest.approx(round(sum(bits) / 4, 6), abs=1e-6)


def test_bigram_model_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b"), (3, "")], "doc_id long, text string"
    )
    counts = {
        (r["prev"], r["cur"]): r["bg_count"]
        for r in bigram_model(df).collect()
    }
    assert counts == {("a", "b"): 2, ("b", "a"): 1}


def test_lam_zero_equals_unigram(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    bi = bigram_perplexity(docs, lam=0.0).toPandas().set_index("doc_id")
    un = unigram_perplexity(docs).toPandas().set_index("doc_id")
    joined = bi.join(un, lsuffix="_b", rsuffix="_u")
    assert (joined["n_tokens_b"] == joined["n_tokens_u"]).all()
    assert (joined["ppl_bits_b"] - joined["ppl_bits_u"]).abs().max() <= 1e-6


def test_oracle_parity(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    sdf = bigram_perplexity(docs, lam=0.7).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    ddf = con.execute(_BIGRAM_SQL.replace("{lam}", "0.7")).df()
    problems = compare("bigram_perplexity", sdf, ddf)
    assert not problems, problems


def test_plan_broadcasts_models_no_window(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        bigram_perplexity(docs, lam=0.7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the three model joins broadcast; the only corpus-sized join is
    # the final empty-doc restore (doc_id left join, same as unigram)
    assert plan.count("BroadcastHashJoin") == 3
    assert plan.count("SortMergeJoin") <= 1
    assert "Window" not in plan  # pair construction is array-local
