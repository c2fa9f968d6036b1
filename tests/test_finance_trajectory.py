"""Quantitative gate on the FINANCE domain's closed-loop quality — the
r7 verdict's one domain asymmetry in the parity story.

The reference's second domain is credit-card fraud
(`Makefile:31-42` selects it with ``DATASET=finance``: id field
``pan``, generic ``json`` parse via `JsonEventParser.java`; pattern
`Wayeb/patterns/finance/fraud/pattern.sre`:
``;(EQ(is_fraud,0.0),EQ(is_fraud,1.0)){order:2}{partitionBy:pan}{window:1000}``).
Unlike maritime, the reference commits NO finance data or baseline
metrics, so this gate replays a SEEDED SYNTHETIC transaction stream —
a per-card hidden clean/compromised regime (Markov-modulated fraud
bursts) whose legit->fraud transitions are genuinely forecastable from
order-3 symbol context — through the FULL closed loop
(train -> detect -> forecast -> interval-join metrics -> Observer ->
Bayesian optimize -> retrain -> synchronized swap), mirroring
tests/test_adaptive_trajectory.py's structure with the band pinned
from committed runs instead of a reference CSV.

Two fixtures:

- ``trajectory`` (stationary dynamics): committed runs measure runtime
  MCC 0.51 -> 0.577 over 12 windows, post-warm-up minimum 0.57.  Gated
  at final >= 0.52 with a post-warm-up floor of 0.48 — the same ~0.05
  margin discipline as the maritime gate.
- ``drift_trajectory`` (in-burst fraud density drops 0.6 -> 0.35 at
  60% of each card's stream): the Observer must FIRE (at least one
  optimize/retrain+deploy event) — pinning that the finance loop
  doesn't just score well on stationary data but actually reacts to
  drift — and the post-drift batch MCC must not collapse (the new
  dynamics are intrinsically less predictable; committed runs settle
  ~0.41-0.42, gated at >= 0.30).

The stream is deterministic (seeded numpy; per-key symbolization
orders by (ts, id) with unique ids; the optimizer is seeded), so the
bands have no run-to-run jitter to absorb — the margins cover future
intentional model/loop changes, not noise.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

# Wayeb/patterns/finance/fraud/pattern.sre + declarations.sre, inlined
# so the gate runs without the reference checkout
PATTERN = (
    ";(EQ(is_fraud,0.0),EQ(is_fraud,1.0))"
    "{order:2}{partitionBy:pan}{window:1000}"
)
DECLS = "~(EQ(is_fraud,0.0),EQ(is_fraud,1.0))"


def synth_finance(
    n_cards: int = 120,
    n_events: int = 320,
    seed: int = 202,
    p_comp: float = 0.02,
    p_heal: float = 0.03,
    pf_clean: float = 0.002,
    pf_comp: float = 0.6,
    drift_at: float | None = None,
    pf_comp_drifted: float = 0.35,
) -> pd.DataFrame:
    """Markov-modulated fraud stream: each card walks a hidden
    clean/compromised regime (enter ``p_comp``, heal ``p_heal`` per
    event) and emits ``is_fraud`` with the regime's density.  Long
    bursts (mean 1/p_heal = 33 events) at moderate density (0.6) make
    legit->fraud detections both frequent INSIDE a burst and
    anticipatable from recent symbols — the structure the SPST learns.
    ``drift_at`` switches the in-burst density to ``pf_comp_drifted``
    at that fraction of each card's stream (concept drift)."""
    rng = np.random.default_rng(seed)
    rows = []
    t0 = 1_600_000_000
    for c in range(n_cards):
        regime = 0
        t = t0
        for i in range(n_events):
            t += int(rng.integers(30, 90))
            dense = pf_comp
            if drift_at is not None and i >= n_events * drift_at:
                dense = pf_comp_drifted
            if regime == 0 and rng.random() < p_comp:
                regime = 1
            elif regime == 1 and rng.random() < p_heal:
                regime = 0
            fr = 1.0 if rng.random() < (pf_clean if regime == 0 else dense) else 0.0
            rows.append((f"pan{c:04d}", t, fr))
    df = pd.DataFrame(rows, columns=["pan", "timestamp", "is_fraud"])
    df = df.sort_values(["timestamp", "pan"]).reset_index(drop=True)
    df["id"] = np.arange(len(df))
    return df


def _replay(spark, pdf: pd.DataFrame):
    from flink_rtcef_spark.models.spst import train_spst
    from flink_rtcef_spark.operators.cep import BatchCEP
    from flink_rtcef_spark.plans.compiler import compile_pattern
    from flink_rtcef_spark.streaming.collector import BucketCollector
    from flink_rtcef_spark.streaming.factory import ModelFactory
    from flink_rtcef_spark.streaming.loop import RTCEFLoop
    from flink_rtcef_spark.streaming.observer import Observer

    compiled = compile_pattern(PATTERN, DECLS)
    events = spark.createDataFrame(pdf).cache()
    ts_split = events.approxQuantile("timestamp", [0.15], 0.01)[0]
    warmup = events.filter(F.col("timestamp") <= ts_split)
    cep = BatchCEP(compiled, key_col="pan", ts_col="timestamp", id_col="id")
    initial = train_spst(
        cep.symbolized(warmup), compiled, max_order=3,
        pmin=1e-4, gamma_min=0.001, r=1.05, horizon=10,
    )
    factory = ModelFactory(
        compiled, key_col="pan", ts_col="timestamp", id_col="id",
        max_order=3, horizon=10, method="classify_nextk",
        confidence_threshold=0.3, spread=5,
    )
    lake = tempfile.mkdtemp(prefix="fin_lake_")
    span = int(pdf.timestamp.max() - pdf.timestamp.min())
    batch_seconds = span // 12 + 1
    loop = RTCEFLoop(
        spark=spark,
        compiled=compiled,
        initial_model=initial,
        collector=BucketCollector(
            base_path=lake, bucket_size=batch_seconds, last_k=7,
        ),
        factory=factory,
        observer=Observer(
            train_diff=0.3, opt_diff=0.10, low_score=0.1, grace_period=3
        ),
        key_col="pan", ts_col="timestamp", id_col="id",
        n_opt_evals=10, n_initial=5, seed=42,
    )
    points = loop.replay(events, batch_seconds=batch_seconds)
    events.unpersist()
    shutil.rmtree(lake, ignore_errors=True)
    return points


@pytest.fixture(scope="module")
def trajectory(spark):
    return _replay(spark, synth_finance())


@pytest.fixture(scope="module")
def drift_trajectory(spark):
    return _replay(spark, synth_finance(drift_at=0.6))


def test_finance_trajectory_band(trajectory):
    assert len(trajectory) >= 10, f"only {len(trajectory)} report windows"
    final = trajectory[-1].runtime_mcc
    assert final >= 0.52, (
        f"final runtime MCC {final:.3f} fell out of the committed band "
        f"(committed runs: 0.577) — the finance forecasting path regressed"
    )


def test_finance_trajectory_no_midrun_collapse(trajectory):
    post_warmup = trajectory[3:]
    dips = [
        (p.timestamp, p.runtime_mcc)
        for p in post_warmup
        if p.runtime_mcc < 0.48
    ]
    assert not dips, (
        f"runtime MCC dipped below 0.48 after warm-up: {dips} "
        f"(committed runs hold >= 0.57 post-warm-up)"
    )


def test_finance_trajectory_mccs_valid(trajectory):
    for p in trajectory:
        assert -1.0 <= p.runtime_mcc <= 1.0
        assert -1.0 <= p.batch_mcc <= 1.0


def test_finance_drift_triggers_adaptation(drift_trajectory):
    """Concept drift (in-burst density 0.6 -> 0.35) degrades batch MCC
    enough that the Observer must react with at least one deploy —
    pinning the finance loop's G1-G7 path end-to-end, not just its
    stationary score."""
    events = [p.event for p in drift_trajectory if p.event]
    assert any("deploy" in e for e in events), (
        f"no adaptation event fired under drift; events={events}, "
        f"batch MCCs={[round(p.batch_mcc, 3) for p in drift_trajectory]}"
    )


def test_finance_drift_no_collapse(drift_trajectory):
    """Post-drift the dynamics are intrinsically less predictable
    (committed runs settle at batch MCC ~0.41-0.42); the gate is that
    the loop keeps forecasting meaningfully rather than collapsing."""
    tail = drift_trajectory[-3:]
    for p in tail:
        assert p.batch_mcc >= 0.30, (
            f"batch MCC collapsed to {p.batch_mcc:.3f} at {p.timestamp} "
            f"after drift"
        )
