"""Alternative forecasters (SURVEY.md §2.E E10).

The engine's primary path is the SPST + waiting-time-distribution
forecaster; these are the reference's secondary estimators:

- NextForecaster (model/forecaster/next/NextForecaster.scala:25): the
  most-likely next symbol given the current context (a VMM next-step
  classifier rather than an interval forecaster).
- RandomForecaster (model/forecaster/random/RandomForecaster.scala):
  seeded random intervals — the sanity baseline any real forecaster
  must beat.
- MeanEstimator (estimator/RemainingTimeEstimator/MeanEstimator.scala):
  expected remaining time to completion per state = the conditional
  expectation of the waiting-time distribution.
"""

from __future__ import annotations

import numpy as np

from flink_rtcef_spark.models.pst import PredictionSuffixTree
from flink_rtcef_spark.models.wt import Forecast, WtDistribution


class NextForecaster:
    """Most-likely next symbol from the PST context distribution."""

    def __init__(self, pst: PredictionSuffixTree):
        self.pst = pst

    def predict_next(self, context: tuple[int, ...]) -> tuple[int, float]:
        dist = self.pst.walk(context).dist
        sym = max(dist, key=dist.get)
        return sym, dist[sym]

    def top_k(self, context: tuple[int, ...], k: int = 3) -> list[tuple[int, float]]:
        dist = self.pst.walk(context).dist
        return sorted(dist.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


class RandomForecaster:
    """Seeded random interval forecasts over the horizon — baseline."""

    def __init__(self, horizon: int, spread: int, seed: int = 42):
        self.horizon = horizon
        self.spread = spread
        self.rng = np.random.RandomState(seed)

    def forecast(self) -> Forecast:
        start = int(self.rng.randint(1, max(self.horizon - self.spread, 1) + 1))
        end = start + self.spread
        return Forecast(
            start=start,
            end=end,
            middle=(start + end) / 2.0,
            prob=float(self.rng.uniform(0, 1)),
            positive=bool(self.rng.uniform(0, 1) >= 0.5),
        )


class MeanEstimator:
    """Expected remaining steps to completion per state: E[T | T <= horizon]
    from the waiting-time distribution (completion mass only)."""

    def __init__(self, wt_dists: dict[int, WtDistribution]):
        self.wt_dists = wt_dists

    def remaining(self, state: int) -> float:
        wt = self.wt_dists.get(state)
        if wt is None or wt.is_empty():
            return -1.0
        return wt.conditional_expectation(1, wt.horizon)

    def table(self) -> dict[int, float]:
        return {s: self.remaining(s) for s in self.wt_dists}
