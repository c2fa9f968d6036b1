"""Quantitative gate on the closed adaptive loop's MCC trajectory.

PARITY_BASELINE.md / ADAPTIVE_BASELINE.md reproduce the reference's
committed ~0.51 baseline shape, but until r7 nothing automated failed
if a refactor degraded the adaptive loop's MCC path (r6 verdict item
5).  This test replays the committed maritime sample through the FULL
closed loop — engine -> local/global reports -> Observer -> controller
(Bayesian optimize) -> ModelFactory retrain -> synchronized swap, the
exact examples/maritime_adaptive.py setup with its pinned seed — and
asserts the trajectory stays inside a stated band.

The reference's committed data/baseline_metrics.csv is a ~54-minute
slice of a run over the full (uncommitted) Brest corpus, so
point-for-point window alignment is impossible (ADAPTIVE_BASELINE.md,
"Why exact window-count equality is NOT reproducible").  The band is
therefore on the trajectory's summary shape, with the reference slice
supplying the floor:

- >= 10 report windows over the committed sample (13 at 14-day
  batches since r4 — fewer means the replay lost coverage);
- the FINAL runtime MCC beats the reference slice's final runtime MCC
  (0.545, read from the committed file, reference formulas
  java/.../utils/Scores.java:20-68) with margin: committed repo runs
  have measured 0.63-0.67 since r4, gated at >= 0.60 to absorb
  data-order jitter without letting a real regression (e.g. a swap
  that stops deploying retrained models) pass;
- after a 5-window warm-up the runtime MCC never dips below 0.55 —
  above the whole reference band (its slice spans 0.478-0.545), so a
  mid-run collapse fails even if the endpoint recovers;
- every report's MCCs are valid Scores.java outputs (in [-1, 1]).
"""

from __future__ import annotations

import csv
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

MARITIME_CSV = "/root/reference/data/maritime.csv"
BASELINE_CSV = "/root/reference/data/baseline_metrics.csv"
PATTERN_SRE = "/root/reference/data/pattern.sre"
DECLS_SRE = "/root/reference/data/declarations.sre"

# every reference artifact the module reads must exist, or a partially
# present /root/reference would ERROR the fixture instead of skipping
pytestmark = pytest.mark.skipif(
    not all(
        Path(p).exists()
        for p in (MARITIME_CSV, BASELINE_CSV, PATTERN_SRE, DECLS_SRE)
    ),
    reason="reference sample/baseline artifacts not present",
)


@pytest.fixture(scope="module")
def trajectory(spark):
    from flink_rtcef_spark.models.spst import train_spst
    from flink_rtcef_spark.operators.cep import BatchCEP
    from flink_rtcef_spark.plans.compiler import compile_pattern
    from flink_rtcef_spark.sources.io import read_maritime_csv
    from flink_rtcef_spark.streaming.collector import BucketCollector
    from flink_rtcef_spark.streaming.factory import ModelFactory
    from flink_rtcef_spark.streaming.loop import RTCEFLoop
    from flink_rtcef_spark.streaming.observer import Observer

    pattern = Path(PATTERN_SRE).read_text().strip()
    decls = Path(DECLS_SRE).read_text()
    events = (
        read_maritime_csv(spark, MARITIME_CSV)
        .withColumn("id", F.monotonically_increasing_id())
        .cache()
    )
    compiled = compile_pattern(pattern + "{partitionBy:mmsi}", decls)
    ts_split = events.approxQuantile("timestamp", [0.15], 0.01)[0]
    warmup = events.filter(F.col("timestamp") <= ts_split)
    cep = BatchCEP(compiled, key_col="mmsi", ts_col="timestamp", id_col="id")
    initial = train_spst(
        cep.symbolized(warmup), compiled, max_order=2,
        pmin=1e-6, gamma_min=0.001, r=1.05, horizon=10,
    )
    factory = ModelFactory(
        compiled, key_col="mmsi", ts_col="timestamp", id_col="id",
        max_order=2, horizon=10, method="classify_nextk",
        confidence_threshold=0.1, spread=5,
    )
    lake = tempfile.mkdtemp(prefix="traj_lake_")
    loop = RTCEFLoop(
        spark=spark,
        compiled=compiled,
        initial_model=initial,
        collector=BucketCollector(
            base_path=lake, bucket_size=86400, last_k=7,
        ),
        factory=factory,
        observer=Observer(
            train_diff=0.3, opt_diff=0.10, low_score=0.1, grace_period=3
        ),
        key_col="mmsi", ts_col="timestamp", id_col="id",
        n_opt_evals=10, n_initial=5, seed=42,
    )
    points = loop.replay(events, batch_seconds=14 * 86400)
    events.unpersist()
    shutil.rmtree(lake, ignore_errors=True)
    return points


def _reference_band():
    with open(BASELINE_CSV) as f:
        rows = list(csv.DictReader(f))
    vals = [float(r["runtime_mcc"]) for r in rows]
    return min(vals), vals[-1]


def test_trajectory_beats_reference_band(trajectory):
    ref_lo, ref_final = _reference_band()
    # the file we think it is: the committed slice spans 0.478-0.545
    assert ref_lo == pytest.approx(0.478, abs=0.01)
    assert ref_final == pytest.approx(0.545, abs=0.01)
    assert len(trajectory) >= 10, f"only {len(trajectory)} report windows"
    final = trajectory[-1].runtime_mcc
    assert final >= max(0.60, ref_final + 0.05), (
        f"final runtime MCC {final:.3f} fell out of the committed band "
        f"(>= 0.60; reference slice final {ref_final:.3f}) — the adaptive "
        f"loop's quality path regressed"
    )


def test_trajectory_no_midrun_collapse(trajectory):
    post_warmup = trajectory[5:]
    floor = 0.55
    dips = [
        (p.timestamp, p.runtime_mcc)
        for p in post_warmup
        if p.runtime_mcc < floor
    ]
    assert not dips, (
        f"runtime MCC dipped below {floor} after warm-up: {dips} — above "
        f"the whole reference band (0.478-0.545) is the committed floor"
    )


def test_trajectory_mccs_are_valid_scores(trajectory):
    for p in trajectory:
        assert -1.0 <= p.runtime_mcc <= 1.0
        assert -1.0 <= p.batch_mcc <= 1.0
