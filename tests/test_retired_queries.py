"""Oracle checks for queries rotated OUT of the 50-slot driver registry
(r3: slots given to unigram_perplexity / bm25_topk / dedup_paragraphs /
semantic_dedup; r4: hist_quantiles_value / decontam_bloom_hits; r7:
the registry was curated back DOWN to exactly 50 after r6 grew it to
54 and the driver silently stopped checking the last 4 insertions).

The driver cap is 50 entries; every retired query keeps the same
Spark-vs-DuckDB hash gate here AT THE DRIVER'S SCALE (sf0.01, not the
suite's usual sf0.001) so deregistration never means unverified, and
``test_registry_holds_driver_cap`` fails the suite if the registry
ever outgrows the cap again."""

from __future__ import annotations

import duckdb
import pytest

from flink_rtcef_spark.sources.io import TABLES
from tests.conftest import SF_ORACLE

from tools.check_oracle import compare

# The driver's CORRECTNESS check covers at most this many registry
# entries (observed r6: registry 54, CORRECTNESS_r06.json rows 50 —
# insertion order, last 4 dropped).
#
# DRIVER_CAP is an OBSERVED constant, not a published one.  If the
# driver ever raises its window, this repo would self-limit needlessly
# — re-measure it by growing a scratch registry past 50 in a sandbox
# (register N>50 trivially distinct @query entries in a throwaway
# branch) and counting the rows in the next round's
# CORRECTNESS_r{N}.json; if more than 50 entries are checked, raise
# this constant and promote retired queries back, and note the new
# observed cap in that round's docs/r{N}-notes.md.
DRIVER_CAP = 50


def test_registry_holds_driver_cap():
    """r9 shape: the curated 50 occupy the first DRIVER_CAP insertion
    slots UNCHANGED (so even a still-capped driver checks exactly the
    r8 set), and every entry beyond the cap is a cap-probe entry —
    retired queries gated at sf0.01 in this module (or, for the
    composed ``pagerank_asof_enrich``, pytest-gated in
    tests/test_pipeline_ops.py).  Nothing can sit in the registry
    outside the hard signal."""
    from flink_rtcef_spark import queries as q
    from flink_rtcef_spark.queries.cap_probe import _PROBE

    q.load_all()
    names = list(q.QUERIES)
    probe_names = [n for n, _, _ in _PROBE]
    # probe entries append strictly AFTER the curated cap
    assert names[DRIVER_CAP:] == probe_names, (
        "registry tail is not exactly the cap probe; a new @query landed "
        "beyond the driver cap and would silently lose the per-round hard "
        "correctness signal — retire one into this module instead"
    )
    assert not set(names[:DRIVER_CAP]) & set(probe_names)


TIME_BUCKETING_SQL = """
    SELECT (epoch_ms(ts) // 86400000) * 86400 AS bucket_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1
"""

UNION_ASSEMBLY_SQL = """
    WITH assembled AS (
      SELECT * FROM events WHERE epoch_ms(ts) // 86400000 = 19723
      UNION ALL
      SELECT * FROM events WHERE epoch_ms(ts) // 86400000 = 19724
    )
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM assembled GROUP BY event_type
"""


def test_cap_probe_oracles_match_retired_gates():
    """The cap probe re-registers each retired query with an oracle;
    a drifted copy would make the driver check DIFFERENT SQL than the
    retired gate here.  Pin the two relational SQLs this module also
    owns (the rest are imported from their source modules by both)."""
    from flink_rtcef_spark.queries import cap_probe

    assert cap_probe.TIME_BUCKETING_SQL.split() == TIME_BUCKETING_SQL.split()
    assert cap_probe.UNION_ASSEMBLY_SQL.split() == UNION_ASSEMBLY_SQL.split()
    assert (
        cap_probe.PIVOT_EVENT_COUNTS_SQL.split()
        == PIVOT_EVENT_COUNTS_SQL.split()
    )
    assert cap_probe.LAG_DELTA_SQL.split() == LAG_DELTA_SQL.split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    return con


def _check(spark, duck, fn, sql, name):
    sdf = fn(spark, SF_ORACLE).toPandas()
    ddf = duck.execute(sql).df()
    problems = compare(name, sdf, ddf)
    assert not problems, problems


def test_time_bucketing_oracle(spark, duck):
    from flink_rtcef_spark.queries.relational import time_bucketing

    _check(spark, duck, time_bucketing, TIME_BUCKETING_SQL, "time_bucketing")


def test_union_assembly_oracle(spark, duck):
    from flink_rtcef_spark.queries.relational import union_assembly

    _check(spark, duck, union_assembly, UNION_ASSEMBLY_SQL, "union_assembly")


def test_sample_topk_group_oracle(spark, duck):
    from flink_rtcef_spark.queries.pipeline import (
        _TOPK_GROUP_SQL,
        sample_topk_group,
    )

    _check(spark, duck, sample_topk_group, _TOPK_GROUP_SQL, "sample_topk_group")


def test_embedding_dup_clusters_oracle(spark, duck):
    from flink_rtcef_spark.queries.pipeline import (
        _EMB_COMPONENTS_SQL,
        embedding_dup_clusters,
    )

    _check(
        spark, duck, embedding_dup_clusters, _EMB_COMPONENTS_SQL,
        "embedding_dup_clusters",
    )


PIVOT_EVENT_COUNTS_SQL = """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY user_id
"""


def test_pivot_event_counts_oracle(spark, duck):
    from flink_rtcef_spark.queries.relational import pivot_event_counts

    _check(
        spark, duck, pivot_event_counts, PIVOT_EVENT_COUNTS_SQL,
        "pivot_event_counts",
    )


LAG_DELTA_SQL = """
    SELECT user_id, event_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_events,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_value,
           COALESCE(LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS prev_event_id
    FROM events
"""


def test_lag_delta_reports_oracle(spark, duck):
    from flink_rtcef_spark.queries.relational import lag_delta_reports

    _check(spark, duck, lag_delta_reports, LAG_DELTA_SQL, "lag_delta_reports")


# ---- rotated out in r4 (slots given to hist_quantiles_value /
# ---- decontam_bloom_hits) ----


def test_simhash_16_oracle(spark, duck):
    from flink_rtcef_spark.queries.pipeline import _SIMHASH_SQL, simhash_16

    _check(spark, duck, simhash_16, _SIMHASH_SQL, "simhash_16")


def test_doc_fingerprint_oracle(spark, duck):
    from flink_rtcef_spark.queries.pipeline import (
        _DOC_FINGERPRINT_SQL,
        doc_fingerprint,
    )

    _check(
        spark, duck, doc_fingerprint, _DOC_FINGERPRINT_SQL, "doc_fingerprint"
    )


# ---- rotated out in r7 (curating the registry back to the 50-row
# ---- driver cap so domain_pagerank / hll_distinct_texts /
# ---- hist_quantiles_value / decontam_bloom_hits re-enter the
# ---- driver-checked set) ----


def test_cep_presplit_detect_oracle(spark, duck):
    from flink_rtcef_spark.queries.cep_queries import (
        _SEQ_SQL,
        cep_presplit_detect,
    )

    _check(spark, duck, cep_presplit_detect, _SEQ_SQL, "cep_presplit_detect")


def test_lsh_candidate_pairs_oracle(spark, duck):
    from flink_rtcef_spark.queries.pipeline import (
        _lsh_oracle,
        lsh_candidate_pairs,
    )

    _check(
        spark, duck, lsh_candidate_pairs, _lsh_oracle(), "lsh_candidate_pairs"
    )


def test_ann_pq_topk_oracle(spark, duck):
    from flink_rtcef_spark.queries.pipeline import _pq_oracle_sql, ann_pq_topk

    _check(spark, duck, ann_pq_topk, _pq_oracle_sql(), "ann_pq_topk")


def test_sample_token_budget_oracle(spark, duck):
    from flink_rtcef_spark.queries.pipeline import (
        _TOKEN_BUDGET_SQL,
        sample_token_budget,
    )

    _check(
        spark, duck, sample_token_budget, _TOKEN_BUDGET_SQL,
        "sample_token_budget",
    )
