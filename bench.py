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

    hot_plain, hot_split = hotkey_fixture(spark)

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
                "cep_hotkey_plain_sec": hot_plain,
                "cep_hotkey_presplit_sec": hot_split,
            }
        )
    )


def hotkey_fixture(spark, n_events: int = 5_000_000):
    """One pathological key (the keyBy serialization wall — reference
    ERFEngine.scala:199-221 has the same limit): all events on a single
    partition key, so the plain path runs the whole stream in ONE task
    while the time-range pre-split (operators/cep_presplit.py) spreads
    it across shards.  The pattern is *windowed* — the regime where the
    O(1)-per-event loop is the only kernel (composition scans don't
    apply) and per-key serialization genuinely bounds the job; periodic
    RESET control events give every shard its exactness certificate.
    Records both wall times."""
    import time as _t

    from pyspark.sql import functions as F

    from flink_rtcef_spark.operators.cep import BatchCEP
    from flink_rtcef_spark.operators.cep_presplit import presplit_detections
    from flink_rtcef_spark.plans.compiler import compile_pattern

    ev = (
        spark.range(n_events)
        .select(
            F.lit("hot").alias("key"),
            (F.col("id") * 10).alias("ts"),
            F.col("id"),
            F.when(F.col("id") % 500 == 0, F.lit("RESET"))
            .otherwise(
                F.element_at(
                    F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                    ((F.xxhash64("id") % 3 + 3) % 3 + 1).cast("int"),
                )
            )
            .alias("event_type"),
        )
        .cache()
    )
    ev.count()
    compiled = compile_pattern(
        ";(IsEventTypePredicate(view),IsEventTypePredicate(click))"
        "{partitionBy:key}{window:40}",
        "+(IsEventTypePredicate(RESET))\n"
        "~(IsEventTypePredicate(view),IsEventTypePredicate(click),"
        "IsEventTypePredicate(RESET))",
    )
    cep = BatchCEP(compiled, key_col="key", ts_col="ts", id_col="id")
    t0 = _t.time()
    cep.detections(ev).count()
    plain = round(_t.time() - t0, 3)
    span = n_events * 10 // 64  # ~64 shards; resets every 500 events
    t0 = _t.time()
    presplit_detections(
        ev, compiled, shard_span=span, warmup=span // 8, key_col="key",
        ts_col="ts", id_col="id", strict=True,
    ).count()
    split = round(_t.time() - t0, 3)
    ev.unpersist()
    return plain, split


if __name__ == "__main__":
    main()
