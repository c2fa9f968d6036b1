"""Observer: score-drop detection over the global report stream.

Decision logic matches ObserverProcess.java:72-163 (G1):
- silent windows (tp+fp+fn == 0) are skipped entirely;
- during a grace period after an instruction, reports are ignored;
- mcc < low_score  -> optimize (safety net);
- prev - curr > train_diff -> retrain (big drop);
- prev - curr > opt_diff   -> optimize (small drop);
history keeps the last k=2 scores.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Instruction:
    instruction_type: str  # optimize | retrain
    timestamp: int
    mcc: float

    @property
    def f_val(self) -> float:
        # the optimizer minimizes -MCC (ObserverProcess.java:149-151)
        return -self.mcc


@dataclass
class Observer:
    train_diff: float = 0.3
    opt_diff: float = 0.1
    low_score: float = 0.1
    grace_period: int = 2
    history: list[float] = field(default_factory=list)
    grace_left: int = 0

    def on_report(
        self, timestamp: int, mcc: float, tp: int, fp: int, fn: int
    ) -> Instruction | None:
        if tp + fp + fn == 0:  # silent window (MetricsAggregator.java:60-66)
            return None
        if self.grace_left > 0:
            self.grace_left -= 1
            self.history = (self.history + [mcc])[-2:]
            return None
        decision: str | None = None
        if mcc < self.low_score:
            decision = "optimize"
        elif self.history:
            drop = self.history[-1] - mcc
            if drop > self.train_diff:
                decision = "retrain"
            elif drop > self.opt_diff:
                decision = "optimize"
        self.history = (self.history + [mcc])[-2:]
        if decision:
            self.grace_left = self.grace_period
            return Instruction(decision, timestamp, mcc)
        return None
