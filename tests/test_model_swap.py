"""G4 synchronized model swap: per-key event-time swap with run-state
migration, plus the streaming watermark+tumbling-window checklist items
(A6/A14) as a real streaming query."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.models.spst import train_spst
from flink_rtcef_spark.operators.cep import BatchCEP
from flink_rtcef_spark.operators.forecast import ForecastCEP, swap_mapping
from flink_rtcef_spark.plans.compiler import compile_pattern

PAT = ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){order:1}{partitionBy:k}"
DECLS = "~(IsEventTypePredicate(A),IsEventTypePredicate(B))"


@pytest.fixture(scope="module")
def swap_setup(spark):
    rng = random.Random(9)
    rows = [
        ("u1", t + 1, t, "B" if rng.random() < 0.3 else "A") for t in range(400)
    ] + [("u2", t + 1, 1000 + t, "B" if rng.random() < 0.5 else "A") for t in range(400)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "timestamp", "id", "event_type"])
    )
    compiled = compile_pattern(PAT, DECLS)
    cep = BatchCEP(compiled, ts_col="timestamp", id_col="id")
    m1 = train_spst(cep.symbolized(df.filter("timestamp <= 200")), compiled,
                    max_order=1, horizon=5, cutoff=0.0)
    m2 = train_spst(cep.symbolized(df.filter("timestamp > 200")), compiled,
                    max_order=1, horizon=5, cutoff=0.0)
    return df, compiled, m1, m2


def test_swap_mapping_covers_all_states(swap_setup):
    _, _, m1, m2 = swap_setup
    mapping = swap_mapping(m1, m2)
    assert len(mapping) == m1.n_virtual
    assert all(0 <= v < m2.n_virtual for v in mapping)
    # identical sdfa+buffer structure -> mapping preserves sdfa state
    for v in range(m1.n_virtual):
        assert m1.v_sdfa[v] == m2.v_sdfa[int(mapping[v])]
        assert m1.v_buffer[v] == m2.v_buffer[int(mapping[v])]


def test_swap_preserves_detections_and_switches_forecasts(spark, swap_setup):
    df, compiled, m1, m2 = swap_setup
    fcep = ForecastCEP(m1, key_col="k", ts_col="timestamp", id_col="id",
                       method="classify_nextk", confidence_threshold=0.3, spread=3)
    # sync_time uses the stream's own ts unit (long passthrough here)
    sync_ms = 200
    base = fcep.forecasts(df).toPandas()
    swapped = fcep.forecasts(df, new_model=m2, sync_time=sync_ms).toPandas()
    # detections (pattern semantics) are model-independent
    bd = base[base.is_detection].sort_values(["key", "counter"])
    sd = swapped[swapped.is_detection].sort_values(["key", "counter"])
    assert list(bd.counter) == list(sd.counter)
    # forecasts before the swap are identical
    bf = base[~base.is_detection & (base.ts < sync_ms)]
    sf = swapped[~swapped.is_detection & (swapped.ts < sync_ms)]
    assert len(bf) == len(sf)
    # models trained on different slices differ after the swap
    bafter = base[~base.is_detection & (base.ts >= sync_ms)]
    safter = swapped[~swapped.is_detection & (swapped.ts >= sync_ms)]
    assert not bafter.prob.reset_index(drop=True).equals(
        safter.prob.reset_index(drop=True)
    )


def test_streaming_watermark_tumbling_window(spark, tmp_path):
    """A6+A14 streaming checklist: event-time watermark + tumbling
    window aggregation in append mode through a real streaming query."""
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [1_700_000_000 + x for x in [10, 20, 3700, 3800, 7300]], unit="s"
            ),
            "event_type": ["a", "a", "b", "a", "b"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    src = tmp_path / "wsrc"
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src / "f0"))
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(
        str(src / "f*")
    )
    agg = (
        stream.withWatermark("ts", "60 seconds")
        .groupBy(F.window("ts", "3600 seconds"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not drain"
    out = spark.sql(
        "select window.start as ws, event_type, n, s from winagg order by ws, event_type"
    ).toPandas()
    # append mode emits only windows sealed by the watermark: the first
    # two tumbling windows (the last event holds the watermark at ~7240)
    assert len(out) >= 2
    first = out.iloc[0]
    assert first.event_type == "a" and first.n == 2 and first.s == 3.0
