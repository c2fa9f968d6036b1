"""The adaptation loop attached to a real Structured Streaming query
(foreachBatch wiring)."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from flink_rtcef_spark.models.spst import train_spst
from flink_rtcef_spark.operators.cep import BatchCEP
from flink_rtcef_spark.plans.compiler import compile_pattern
from flink_rtcef_spark.streaming.collector import BucketCollector
from flink_rtcef_spark.streaming.factory import ModelFactory
from flink_rtcef_spark.streaming.loop import RTCEFLoop
from flink_rtcef_spark.streaming.observer import Observer


def test_loop_on_structured_streaming(spark, tmp_path):
    rng = random.Random(8)
    rows = [
        ("u1", t + 1, t, "B" if rng.random() < 0.4 else "A") for t in range(400)
    ]
    pdf = pd.DataFrame(rows, columns=["k", "timestamp", "id", "event_type"])
    src = tmp_path / "loopsrc"
    for c, chunk in enumerate(np.array_split(pdf, 4)):
        spark.createDataFrame(chunk).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"c{c}")
        )
    compiled = compile_pattern(
        ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){order:1}{partitionBy:k}",
        "~(IsEventTypePredicate(A),IsEventTypePredicate(B))",
    )
    cep = BatchCEP(compiled, key_col="k", ts_col="timestamp", id_col="id")
    warmup = spark.createDataFrame(pdf[pdf.timestamp <= 100])
    initial = train_spst(cep.symbolized(warmup), compiled, max_order=1, horizon=5)
    loop = RTCEFLoop(
        spark=spark,
        compiled=compiled,
        initial_model=initial,
        collector=BucketCollector(
            base_path=str(tmp_path / "lake"), bucket_size=100, last_k=3
        ),
        factory=ModelFactory(
            compiled, key_col="k", ts_col="timestamp", id_col="id",
            max_order=1, horizon=5,
        ),
        observer=Observer(low_score=0.05, opt_diff=0.2, grace_period=1),
        key_col="k",
        ts_col="timestamp",
        id_col="id",
        n_opt_evals=2,
        n_initial=1,
    )
    stream = (
        spark.readStream.schema("k string, timestamp long, id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "c*"))
    )
    q = loop.run_streaming(
        stream, checkpoint_dir=str(tmp_path / "ckpt"), trigger={"availableNow": True}
    )
    assert q.awaitTermination(600), "stream did not drain"
    # one report per microbatch; metrics carry plausible values
    assert len(loop.metrics) == 4
    assert all(-1.0 <= p.batch_mcc <= 1.0 for p in loop.metrics)
    # collector persisted all buckets from the stream
    assert len(loop.collector.seen_buckets) >= 3
    csv = loop.metrics_csv()
    assert csv.startswith("timestamp,human_time,")
