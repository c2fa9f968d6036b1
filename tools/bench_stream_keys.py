"""Streaming fast-path scale bench: key-cardinality scaling + x10/x100.

Two questions the batch-side x100 harness (tools/bench_x100.py) cannot
answer, both raised by the r4 verdict:

1. KEY-CARDINALITY (verdict "what's wrong" #1 done-criterion): with a
   LARGE live-key population and SMALL microbatches (TTL off), is the
   per-batch wall bounded by the buckets the batch touches rather than
   by the live keys?  We seed ``live_keys`` open runs, then stream 8
   microbatches of 10k events in two key patterns:
   - ``clustered``: every batch key hashes into 4 of the 256 logical
     buckets (session/region locality) — per-batch cost should be
     ~FLAT in live_keys, because only those buckets' state is read and
     rewritten;
   - ``uniform``: batch keys spread over every bucket — the documented
     worst case, which degrades to the r4 full-table rewrite (cost
     grows with live_keys).  The uniform row therefore doubles as the
     r4-equivalent baseline the clustered row is compared against.

2. SUSTAINED x10/x100 (verdict item 3): the fast path's sustained
   throughput at 1M and 10M events over 8 microbatches with key
   cardinality scaled like the sf tables (sf0.1 has 1.5k keys per 100k
   events), so the factor between decades is measured, not
   extrapolated.

Methodology matches bench.py: availableNow + maxFilesPerTrigger=1,
warm-up run, then median of 3.  The 8-batch phase is timed through a
checkpoint RESTART over pre-seeded state (so the seed batch's cost
never pollutes the small-batch measurement); the ~0.3 s stream startup
is included in every variant equally.

Both questions are measured for BOTH streaming fast paths: the SDFA
detection path (streaming/fastpath.py — fixed-width automaton state)
and the register/NSRA path (streaming/fastpath_register.py — pickled
configuration-set state, wider per key), sharing the bucketed state
protocol since the r6 refactor.  The register rows answer the r6
verdict's "measure the register path's own key scaling" item.

Usage: python tools/bench_stream_keys.py [--quick] [--detect-only|--register-only]
  --quick drops the 1M-key and 10M-event points (CI-sized smoke).
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

SCHEMA = "k string, ts long, id long, event_type string"
PAT = ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){partitionBy:k}"
DECLS = "~(IsEventTypePredicate(A),IsEventTypePredicate(B))"
# register (SREMO/NSRA) twin: same A-then-B sequence shape, but the
# second step compares against the STORED register (GTAttr), so the
# per-key state is a pickled configuration set (valuations), not a
# fixed-width automaton quintuple — the wider-state path the r6
# verdict asked to measure (streaming/fastpath_register.py)
REG_SCHEMA = SCHEMA + ", value double"
REG_PAT = (
    ';(IsEventTypePredicate(A)["x"],^(IsEventTypePredicate(B),'
    'GTAttr(value,"x"))){partitionBy:k}{window:4}'
)
NUM_BUCKETS = 256
CLUSTER_BUCKETS = 4
BATCHES = 8
BATCH_ROWS = 10_000


def _key(i: int) -> str:
    return f"k{i:08d}"


def _compile(path: str):
    if path == "register":
        from flink_rtcef_spark.plans.nsra import compile_register_pattern

        return compile_register_pattern(REG_PAT)
    from flink_rtcef_spark.plans.compiler import compile_pattern

    return compile_pattern(PAT, DECLS)


def _write_rows(spark, rows, out_path, path="detect"):
    schema = REG_SCHEMA if path == "register" else SCHEMA
    if path == "register":
        rows = [r + (float(r[2] % 10),) for r in rows]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out_path)


def _run_stream(spark, src_glob, state_dir, ckpt_dir, compiled, path="detect"):
    if path == "register":
        from flink_rtcef_spark.streaming.fastpath_register import (
            start_fastpath_register as starter,
        )

        schema = REG_SCHEMA
    else:
        from flink_rtcef_spark.streaming.fastpath import (
            start_fastpath_detections as starter,
        )

        schema = SCHEMA
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
    )
    q = starter(
        stream, compiled,
        state_dir=state_dir, checkpoint_dir=ckpt_dir,
        key_col="k", ts_col="ts", id_col="id",
        watermark_delay_ms=60_000, state_ttl_ms=0,
        num_buckets=NUM_BUCKETS,
    )
    assert q.awaitTermination(1200), "stream did not drain"


def key_cardinality_point(spark, live_keys: int, mode: str, path: str = "detect") -> dict:
    """Seed ``live_keys`` open runs, then time 8 x 10k-event batches
    whose keys are bucket-clustered or uniform.  The phase is re-run
    (median of 3) by restoring the post-seed state dir + checkpoint
    from a copy, so every run advances the same 8 batches over the
    same seeded state."""
    from flink_rtcef_spark.streaming import state_table as stt

    compiled = _compile(path)
    work = tempfile.mkdtemp(prefix=f"skey_{path}_{mode}_{live_keys}_")
    src = f"{work}/src"

    # seed: one A per key — every key carries an open partial match
    seed = [(_key(i), 1_000_000 + (i % 977), i, "A") for i in range(live_keys)]
    _write_rows(spark, seed, f"{src}/c0", path)
    _run_stream(spark, f"{src}/c*", f"{work}/state", f"{work}/ckpt", compiled, path)
    with open(f"{work}/state/v1/meta.json") as f:
        m1 = json.load(f)
    assert m1["state_rows"] == live_keys, m1["state_rows"]

    # batch keys: clustered = only keys hashing into CLUSTER_BUCKETS
    # buckets; uniform = a deterministic stride over the whole space
    if mode == "clustered":
        pool = [
            _key(i) for i in range(live_keys)
            if stt.bucket_of_key(_key(i), NUM_BUCKETS) < CLUSTER_BUCKETS
        ]
    else:
        pool = [_key((i * 2654435761) % live_keys) for i in range(BATCH_ROWS)]
    for b in range(BATCHES):
        rows = [
            (pool[(b * BATCH_ROWS + j) % len(pool)],
             1_001_000 + b * 10 + j % 10,
             live_keys + b * BATCH_ROWS + j, "C")
            for j in range(BATCH_ROWS)
        ]
        _write_rows(spark, rows, f"{src}/c{b + 1}", path)

    # snapshot post-seed state+checkpoint; each timed run starts fresh
    shutil.copytree(f"{work}/state", f"{work}/state0")
    shutil.copytree(f"{work}/ckpt", f"{work}/ckpt0")

    def run():
        shutil.rmtree(f"{work}/state", ignore_errors=True)
        shutil.rmtree(f"{work}/ckpt", ignore_errors=True)
        shutil.copytree(f"{work}/state0", f"{work}/state")
        shutil.copytree(f"{work}/ckpt0", f"{work}/ckpt")
        _run_stream(
            spark, f"{src}/c*", f"{work}/state", f"{work}/ckpt", compiled, path
        )

    run()  # warm-up
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    wall = statistics.median(ts)

    with open(f"{work}/state/v{BATCHES + 1}/meta.json") as f:
        m_last = json.load(f)
    touched = len({
        stt.bucket_of_key(k, NUM_BUCKETS) for k in pool[:BATCH_ROWS]
    })
    out = {
        "path": path,
        "mode": mode,
        "live_keys": live_keys,
        "batches": BATCHES,
        "batch_rows": BATCH_ROWS,
        "touched_buckets_per_batch": touched,
        "phase_wall_sec": round(wall, 3),
        "per_batch_sec": round(wall / BATCHES, 3),
        "engine_last_batch": m_last.get("engine_used"),
        "state_rows_final": m_last["state_rows"],
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def sustained_point(spark, n_events: int, n_keys: int, path: str = "detect") -> dict:
    """Sustained fast-path throughput: n_events over 8 microbatches,
    key cardinality scaled with the data (sf-table shape)."""
    from pyspark.sql import functions as F

    compiled = _compile(path)
    work = tempfile.mkdtemp(prefix=f"ssust_{path}_{n_events}_")
    src = f"{work}/src"
    per = n_events // BATCHES
    base = spark.range(n_events).select(
        F.concat(
            F.lit("k"), (F.col("id") % n_keys).cast("string")
        ).alias("k"),
        (F.lit(1_000_000) + F.col("id") % 100_000).alias("ts"),
        F.col("id").alias("id"),
        F.when(F.col("id") % 3 == 0, "A")
        .when(F.col("id") % 3 == 1, "B")
        .otherwise("C").alias("event_type"),
    )
    if path == "register":
        base = base.withColumn("value", (F.col("id") % 10).cast("double"))
    for b in range(BATCHES):
        base.filter(
            (F.col("id") >= b * per) & (F.col("id") < (b + 1) * per)
        ).coalesce(max(1, per // 500_000 + 1)).write.mode(
            "overwrite"
        ).parquet(f"{src}/c{b}")

    def run():
        shutil.rmtree(f"{work}/state", ignore_errors=True)
        shutil.rmtree(f"{work}/ckpt", ignore_errors=True)
        _run_stream(
            spark, f"{src}/c*", f"{work}/state", f"{work}/ckpt", compiled, path
        )

    run()  # warm-up
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    wall = statistics.median(ts)
    out = {
        "path": path,
        "events": n_events,
        "keys": n_keys,
        "batches": BATCHES,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall),
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    quick = "--quick" in sys.argv
    spark = get_spark("bench_stream_keys")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"num_buckets": NUM_BUCKETS}

    if "--detect-only" in sys.argv and "--register-only" in sys.argv:
        raise SystemExit("--detect-only and --register-only are mutually exclusive")
    paths = ("detect", "register")
    if "--detect-only" in sys.argv:
        paths = ("detect",)
    if "--register-only" in sys.argv:
        paths = ("register",)

    key_points = [100_000] if quick else [100_000, 1_000_000]
    out["key_cardinality"] = []
    for path in paths:
        for lk in key_points:
            for mode in ("clustered", "uniform"):
                p = key_cardinality_point(spark, lk, mode, path)
                out["key_cardinality"].append(p)
                print(f"# {p}", flush=True)

    sus_points = [(1_000_000, 15_000)] if quick else [
        (1_000_000, 15_000), (10_000_000, 150_000)
    ]
    out["sustained"] = []
    for path in paths:
        for n_ev, n_k in sus_points:
            p = sustained_point(spark, n_ev, n_k, path)
            out["sustained"].append(p)
            print(f"# {p}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
