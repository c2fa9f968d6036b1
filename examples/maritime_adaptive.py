"""Adaptive maritime run: the FULL closed loop (engine -> reports ->
observer -> controller/factory -> model swap) over the reference's
committed AIS sample — the docker/Kafka-free analogue of `make run` +
`make results`.

Emits metrics.csv in the reference's shape (baseline_metrics.csv
columns) so its plotting/parsing tooling applies unchanged.

Run: python examples/maritime_adaptive.py [--batch-days 14]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_rtcef_spark.models.spst import train_spst
from flink_rtcef_spark.operators.cep import BatchCEP
from flink_rtcef_spark.plans.compiler import compile_pattern
from flink_rtcef_spark.session import get_spark
from flink_rtcef_spark.sources.io import read_maritime_csv
from flink_rtcef_spark.streaming.collector import BucketCollector
from flink_rtcef_spark.streaming.factory import ModelFactory
from flink_rtcef_spark.streaming.loop import RTCEFLoop
from flink_rtcef_spark.streaming.observer import Observer

MARITIME_CSV = "/root/reference/data/maritime.csv"
PATTERN = Path("/root/reference/data/pattern.sre").read_text().strip()
DECLARATIONS = Path("/root/reference/data/declarations.sre").read_text()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-days", type=int, default=14)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    spark = get_spark("maritime_adaptive")
    t0 = time.time()
    events = (
        read_maritime_csv(spark, MARITIME_CSV)
        .withColumn("id", F.monotonically_increasing_id())
        .cache()
    )
    compiled = compile_pattern(PATTERN + "{partitionBy:mmsi}", DECLARATIONS)

    # initial model on the first bucket's worth of data (the reference
    # trains its first model offline before starting the loop)
    ts_split = events.approxQuantile("timestamp", [0.15], 0.01)[0]
    warmup = events.filter(F.col("timestamp") <= ts_split)
    cep = BatchCEP(compiled, key_col="mmsi", ts_col="timestamp", id_col="id")
    initial = train_spst(
        cep.symbolized(warmup), compiled, max_order=2,
        pmin=1e-6, gamma_min=0.001, r=1.05, horizon=10,
    )
    print(f"# initial model: {initial.n_virtual} virtual states ({time.time() - t0:.0f}s)")

    factory = ModelFactory(
        compiled, key_col="mmsi", ts_col="timestamp", id_col="id",
        max_order=2, horizon=10, method="classify_nextk",
        confidence_threshold=0.1, spread=5,
    )
    collector = BucketCollector(
        base_path=tempfile.mkdtemp(prefix="maritime_lake_"),
        bucket_size=86400, last_k=7,
    )
    loop = RTCEFLoop(
        spark=spark,
        compiled=compiled,
        initial_model=initial,
        collector=collector,
        factory=factory,
        observer=Observer(train_diff=0.3, opt_diff=0.10, low_score=0.1, grace_period=3),
        key_col="mmsi",
        ts_col="timestamp",
        id_col="id",
        n_opt_evals=10,
        n_initial=5,
        seed=42,
    )
    points = loop.replay(events, batch_seconds=args.batch_days * 86400)
    csv = loop.metrics_csv()
    if args.out:
        Path(args.out).write_text(csv)
    print(csv, end="")
    adaptations = [p for p in points if p.event]
    print(
        f"# {len(points)} reports, {len(adaptations)} adaptation events "
        f"({', '.join(p.event for p in adaptations) or 'none'}); "
        f"final runtime MCC {points[-1].runtime_mcc:.3f}; wall {time.time() - t0:.0f}s"
    )


if __name__ == "__main__":
    main()
