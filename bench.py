"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.

Headline set = one query per operator class that dominates cost at
scale (scan+agg, joins, windows, CEP, dedup, similarity).  Each query
is fully materialized via count() (no driver collect of payloads).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from flink_rtcef_spark import queries as q  # noqa: E402
from flink_rtcef_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "tumbling_window_agg",
    "confusion_metrics",
    "interval_join_eval",
    "broadcast_join_enrich",
    "ngram_counts",
    "sessionize",
    "cep_seq_contiguous_sql",
    "cep_sdfa_detect",  # real CEP operator (present from round-1 task 2 on)
    "cep_register_gtattr",  # NSRA register-pattern operator (SREMO)
    "dedup_exact",
    "minhash_signatures",
    "simhash_16",
    "cosine_topk",
    "embedding_near_dup",
    "ann_lsh_topk",
    "text_quality",
    "token_counts_bpe",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    q.load_all()
    spark = get_spark("bench")
    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = q.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    # CEP throughput (the reference's profiler metric:
    # events/s = streamSize / execTime, WtProfiler.scala:207) measured
    # on the full symbolize+shuffle+DFA pipeline over the events table.
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    cep_s = timings.get("cep_sdfa_detect")
    throughput = round(n_events / cep_s) if cep_s else None
    # marginal rate: re-run warm (plans compiled, workers up) — the
    # per-event cost that dominates at scale, mirroring the reference's
    # warm-up-aware harness (ERFOptEngine warmupStreamSize discard)
    marginal = None
    if "cep_sdfa_detect" in q.QUERIES:
        t0 = time.time()
        q.QUERIES["cep_sdfa_detect"](spark, sf_dir).count()
        marginal = round(n_events / (time.time() - t0))

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cep_events_per_sec": throughput,
                "cep_marginal_events_per_sec": marginal,
            }
        )
    )


if __name__ == "__main__":
    main()
