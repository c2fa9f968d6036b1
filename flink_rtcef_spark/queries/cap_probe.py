"""r9 driver-cap probe: re-register every RETIRED query AFTER the
curated 50 (r8 verdict item 4).

The driver's CORRECTNESS check was observed (r6) to cover only the
first 50 registry entries in insertion order — DRIVER_CAP in
tests/test_retired_queries.py records that observation and its
re-measurement recipe.  This module IS that re-measurement: it appends
the 13 retired/composed queries to the registry LAST, so

- if the driver still checks 50 rows, CORRECTNESS_r09.json is
  byte-identical in coverage to r8 (the curated 50 are registered
  first and unchanged) and the probe entries are simply ignored —
  they keep their sf0.01 hash gates in tests/test_retired_queries.py
  either way, so nothing loses verification;
- if the driver's window is larger, the extra rows appear in
  CORRECTNESS_r09.json and the measured cap (= the row count) goes in
  docs/r9-notes.md; the registry then stays grown in later rounds.

Every probe entry except ``pagerank_asof_enrich`` carries the same
DuckDB oracle its retired-gate test checks; ``pagerank_asof_enrich``
(iterative PageRank feeding an as-of join) is not SQL-expressible, so
it registers with ``oracle=None`` — the driver falls back to a
rows-only check, exactly the contract's documented weaker path.

Import order: loaded LAST by ``load_all`` — the append-position is
the safety property, do not reorder.
"""

from __future__ import annotations

from flink_rtcef_spark.queries import query
from flink_rtcef_spark.queries import cep_queries, pipeline, relational

# Oracles for the four relational retirees live here (single source:
# tests/test_retired_queries.py imports these back), matching the
# Spark implementations in queries/relational.py.
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

PIVOT_EVENT_COUNTS_SQL = """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY user_id
"""

LAG_DELTA_SQL = """
    SELECT user_id, event_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_events,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_value,
           COALESCE(LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS prev_event_id
    FROM events
"""

# Registration order: retired-in-r3 relational first, then the
# pipeline/cep retirees, composed chain last (weakest check last, so a
# cap between 50 and 63 drops the rows-only entry first).
_PROBE = [
    ("time_bucketing", relational.time_bucketing, TIME_BUCKETING_SQL),
    ("union_assembly", relational.union_assembly, UNION_ASSEMBLY_SQL),
    ("pivot_event_counts", relational.pivot_event_counts, PIVOT_EVENT_COUNTS_SQL),
    ("lag_delta_reports", relational.lag_delta_reports, LAG_DELTA_SQL),
    ("sample_topk_group", pipeline.sample_topk_group, pipeline._TOPK_GROUP_SQL),
    (
        "embedding_dup_clusters",
        pipeline.embedding_dup_clusters,
        pipeline._EMB_COMPONENTS_SQL,
    ),
    ("simhash_16", pipeline.simhash_16, pipeline._SIMHASH_SQL),
    ("doc_fingerprint", pipeline.doc_fingerprint, pipeline._DOC_FINGERPRINT_SQL),
    ("cep_presplit_detect", cep_queries.cep_presplit_detect, cep_queries._SEQ_SQL),
    ("lsh_candidate_pairs", pipeline.lsh_candidate_pairs, pipeline._lsh_oracle()),
    ("ann_pq_topk", pipeline.ann_pq_topk, pipeline._pq_oracle_sql()),
    (
        "sample_token_budget",
        pipeline.sample_token_budget,
        pipeline._TOKEN_BUDGET_SQL,
    ),
    ("pagerank_asof_enrich", pipeline.pagerank_asof_enrich, None),
]

for _name, _fn, _oracle in _PROBE:
    query(_name, oracle=_oracle)(_fn)
