"""Waiting-time distributions and forecast-interval builders.

Matches model/waitingTime/WtDistribution.scala:98-360 — the six
interval methods surfaced by the reference CLI/engine
(ForecastMethod.scala:1-22; the Flink job hardcodes CLASSIFY_NEXTK,
WayebEngine.java:176):

- ARGMAX: grow an interval around the mode until the confidence
  threshold is met; reject if wider than maxSpread.
- FULLSCAN: smallest interval with P >= threshold by exhaustive scan
  (test oracle for SMARTSCAN).
- SMARTSCAN: expand/shrink two-pointer scan for the same objective.
- FIXEDSPREAD: best window of exactly the given spread.
- CLASSIFY_NEXTK: interval [1, spread]; positive iff P >= threshold.
- CLASSIFY_WIN: window of given length centered on a point.

``middle`` is the conditional expectation of the interval except for
ARGMAX (the mode).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Forecast:
    start: int = -1
    end: int = -1
    middle: float = -1.0
    prob: float = -1.0
    positive: bool = False

    @property
    def valid(self) -> bool:
        return self.start != -1


class WtDistribution:
    """wt[t] = P(first final-state visit happens exactly t events ahead),
    t in 1..horizon (WtDistribution.scala:32-43)."""

    def __init__(self, wt: dict[int, float]):
        self.wt = dict(wt)

    @property
    def horizon(self) -> int:
        return max(self.wt) if self.wt else 0

    def is_empty(self) -> bool:
        return not self.wt or all(v == 0.0 for v in self.wt.values())

    def slice_prob(self, start: int, end: int) -> float:
        return sum(v for k, v in self.wt.items() if start <= k <= end)

    def conditional_expectation(self, start: int, end: int) -> float:
        mass = self.slice_prob(start, end)
        if mass == 0:
            return (start + end) / 2.0
        return sum(k * v for k, v in self.wt.items() if start <= k <= end) / mass

    # ------------------------------------------------------------ builders
    def forecast(
        self,
        method: str,
        confidence_threshold: float,
        spread: int,
        center: int = 0,
    ) -> Forecast:
        if self.is_empty():
            return Forecast()
        method = method.lower()
        if method == "argmax":
            return self._argmax(confidence_threshold, spread)
        if method == "fullscan":
            return self._fullscan(confidence_threshold, spread)
        if method == "smartscan":
            return self._smartscan(confidence_threshold, spread)
        if method == "fixedspread":
            return self._fixed_spread(confidence_threshold, spread)
        if method == "classify_nextk":
            return self._classify_nextk(confidence_threshold, spread)
        if method == "classify_win":
            return self._classify_win(center, confidence_threshold, spread)
        raise ValueError(f"unknown forecast method {method}")

    def _argmax(self, threshold: float, max_spread: int) -> Forecast:
        # getForecastArgMax:249-283
        maxprob, mode = 0.0, 0
        for k, v in self.wt.items():
            if v > maxprob:
                maxprob, mode = v, k
        area, left, right = maxprob, mode, mode
        while area < threshold:
            grew = False
            if (left - 1) in self.wt:
                left -= 1
                area += self.wt[left]
                grew = True
            if (right + 1) in self.wt:
                right += 1
                area += self.wt[right]
                grew = True
            if not grew:
                break
        if max_spread >= (right - left):
            return Forecast(start=left, end=right, middle=float(mode), prob=area)
        return Forecast()

    def _fullscan(self, threshold: float, max_spread: int) -> Forecast:
        # exhaustive smallest-interval-with-P>=threshold; ties -> higher prob
        h = self.horizon
        best: Forecast = Forecast()
        for s in range(1, h + 1):
            for e in range(s, h + 1):
                p = self.slice_prob(s, e)
                if p >= threshold:
                    spread = e - s
                    if (
                        not best.valid
                        or spread < (best.end - best.start)
                        or (spread == (best.end - best.start) and p > best.prob)
                    ):
                        best = Forecast(
                            start=s,
                            end=e,
                            middle=self.conditional_expectation(s, e),
                            prob=p,
                        )
                    break  # longer e only grows spread
        if best.valid and (best.end - best.start) <= max_spread:
            return best
        return Forecast()

    def _smartscan(self, threshold: float, max_spread: int) -> Forecast:
        # getForecastSmartScan:315-355 — two-pointer scan for the same
        # objective as _fullscan: for each start s the minimal end e(s)
        # with P(s,e) >= threshold; interval mass is monotone in s, so
        # e(s) never moves left and the end pointer advances O(h) times
        # total.  Every threshold comparison evaluates slice_prob (the
        # SAME fresh left-to-right summation _fullscan uses) instead of
        # an incrementally add/subtract-maintained running mass: float
        # addition is not associative, and a running mass can disagree
        # with _fullscan about >= threshold exactly at the boundary,
        # making the two builders pick different intervals (caught by
        # tests/test_property.py::test_interval_builders_invariants).
        h = self.horizon
        best = Forecast()
        e = 0
        for s in range(1, h + 1):
            if e < s - 1:
                e = s - 1
            while e < h and self.slice_prob(s, e) < threshold:
                e += 1
            p = self.slice_prob(s, e)
            if p < threshold:
                # P(s,h) < threshold implies P(s',h) < threshold for all
                # s' > s: no later start can reach the mass either
                break
            spread = e - s
            if (
                not best.valid
                or spread < (best.end - best.start)
                or (spread == (best.end - best.start) and p > best.prob)
            ):
                best = Forecast(
                    start=s,
                    end=e,
                    middle=self.conditional_expectation(s, e),
                    prob=p,
                )
        if best.valid and (best.end - best.start) <= max_spread:
            return best
        return Forecast()

    def _fixed_spread(self, threshold: float, spread: int) -> Forecast:
        # getForecastFixedSpread:209-238 sliding window
        h = self.horizon
        if spread >= h:
            return Forecast()
        best = Forecast()
        s, e = 1, 1 + spread
        p = self.slice_prob(s, e)
        if p > threshold:
            best = Forecast(start=s, end=e, middle=self.conditional_expectation(s, e), prob=p)
        while e < h:
            p -= self.wt.get(s, 0.0)
            s += 1
            e += 1
            p += self.wt.get(e, 0.0)
            if p > threshold and p > best.prob:
                best = Forecast(
                    start=s, end=e, middle=self.conditional_expectation(s, e), prob=p
                )
        return best

    def _classify_nextk(self, threshold: float, window: int) -> Forecast:
        # getClassNextKForecast:186-206
        p = self.slice_prob(1, window)
        return Forecast(
            start=1,
            end=window,
            middle=self.conditional_expectation(1, window),
            prob=p,
            positive=p >= threshold,
        )

    def _classify_win(self, center: int, threshold: float, window: int) -> Forecast:
        # getClassWinForecast:159-184
        left = max(1, center - window // 2)
        right = center + window // 2
        p = self.slice_prob(left, right)
        return Forecast(
            start=left,
            end=right,
            middle=self.conditional_expectation(left, right),
            prob=p,
            positive=p >= threshold,
        )
