"""One measured bite at the streaming per-trigger floor (r6 item 8).

The r6 decomposition (docs/r6-notes.md) pinned 58% of sustained
fast-path wall to Spark's microbatch machinery OUTSIDE foreachBatch
(~0.28 s/trigger on that host): per-trigger planning and the
offset/commit WAL.  This tool measures the same 8-batch sf replay
under runtime-settable config levers aimed at exactly that slice:

- ``aqe_off``: adaptive execution re-plans every microbatch job; the
  driver-routed fast path runs only a bounded limit-collect per batch,
  so AQE buys nothing there and its planning cost is pure overhead;
- ``min_retain_2``: ``spark.sql.streaming.minBatchesToRetain`` (default
  100) sizes offset/commit-log retention + compaction bookkeeping;
- ``nodata_off``: ``spark.sql.streaming.noDataMicroBatches.enabled``
  (default true) — availableNow appends a no-data trigger to advance
  the watermark; the fast path carries its own watermark in the state
  manifest, so that extra trigger is a pure machinery round;
- ``all``: the three combined.

Median of 3 per variant, same pre-written chunks, checkpoint+state
reset per run (bench.py's streaming methodology).  Config is restored
after each variant so the order cannot leak.

Usage: python tools/bench_stream_floor.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_rtcef_spark.session import get_spark

VARIANTS: dict[str, dict[str, str]] = {
    "baseline": {},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "min_retain_2": {"spark.sql.streaming.minBatchesToRetain": "2"},
    "nodata_off": {"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
    "all": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.streaming.minBatchesToRetain": "2",
        "spark.sql.streaming.noDataMicroBatches.enabled": "false",
    },
}


def main() -> None:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from flink_rtcef_spark.plans.compiler import compile_pattern
    from flink_rtcef_spark.streaming.fastpath import start_fastpath_detections

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench_stream_floor")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("k"),
        (F.unix_millis(F.col("ts").cast("timestamp")) / 1000)
        .cast("long")
        .alias("tsec"),
        F.col("event_id").alias("id"),
        "event_type",
        "value",
    )
    n = base.count()
    chunked = base.withColumn("__c", F.ntile(8).over(W.orderBy("tsec", "id")))
    workdir = tempfile.mkdtemp(prefix="bench_floor_")
    for c in range(1, 9):
        (
            chunked.filter(F.col("__c") == c)
            .drop("__c")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{workdir}/src/c{c}")
        )
    compiled = compile_pattern(
        ";(IsEventTypePredicate(view),IsEventTypePredicate(purchase))"
        "{partitionBy:k}",
        "~(IsEventTypePredicate(view),IsEventTypePredicate(purchase))",
    )

    def run() -> None:
        shutil.rmtree(f"{workdir}/ckpt", ignore_errors=True)
        shutil.rmtree(f"{workdir}/state", ignore_errors=True)
        stream = (
            spark.readStream.schema(
                "k string, tsec long, id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{workdir}/src/c*")
        )
        q = start_fastpath_detections(
            stream, compiled,
            state_dir=f"{workdir}/state", checkpoint_dir=f"{workdir}/ckpt",
            key_col="k", ts_col="tsec", id_col="id",
            watermark_delay_ms=60_000, state_ttl_ms=3_600_000,
        )
        assert q.awaitTermination(600), "stream did not drain"

    out: dict = {"sf_dir": sf_dir, "events": n, "batches": 8}
    for name, conf in VARIANTS.items():
        saved = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            run()  # warm-up under this config
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        wall = statistics.median(ts)
        out[name] = {
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n / wall),
            "spread": [round(min(ts), 3), round(max(ts), 3)],
        }
        print(f"# {name}: {out[name]}", flush=True)

    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
