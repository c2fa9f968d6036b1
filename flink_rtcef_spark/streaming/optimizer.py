"""Ask/tell hyperparameter optimizer for the adaptation loop.

The reference uses skopt's GP optimizer (EI acquisition, 5 random
initial points, 10 evaluations, seed 42 — optimizer.py:78-117).  skopt
is not available in this environment, so this is a dependency-free
numpy surrogate with the same ask/tell interface and session shape:
seeded random exploration for the initial points, then an RBF-kernel
interpolation surrogate with an exploration bonus (distance-to-nearest
-weighted), minimizing f_val = -MCC.  If skopt IS importable it is
used instead (same seed/space), keeping exact reference parity where
possible.
"""

from __future__ import annotations

import numpy as np

try:  # reference parity path
    from skopt import Optimizer as _SkOptimizer  # type: ignore

    HAVE_SKOPT = True
except ImportError:
    HAVE_SKOPT = False


class BayesLiteOptimizer:
    """space: list of (low, high) float bounds.  Minimizes told values."""

    def __init__(
        self,
        space: list[tuple[float, float]],
        n_initial: int = 5,
        seed: int = 42,
        exploration: float = 0.1,
    ):
        self.space = space
        self.n_initial = n_initial
        self.rng = np.random.RandomState(seed)
        self.exploration = exploration
        self.xs: list[np.ndarray] = []
        self.ys: list[float] = []
        self._sk = None
        if HAVE_SKOPT:  # pragma: no cover - environment-dependent
            self._sk = _SkOptimizer(
                dimensions=space, random_state=seed, n_initial_points=n_initial
            )

    def _random_point(self) -> np.ndarray:
        return np.array([self.rng.uniform(lo, hi) for lo, hi in self.space])

    def ask(self) -> list[float]:
        if self._sk is not None:  # pragma: no cover
            return list(self._sk.ask())
        if len(self.xs) < self.n_initial:
            return list(self._random_point())
        # surrogate: evaluate candidates by RBF interpolation minus an
        # exploration bonus for being far from evaluated points
        X = np.array(self.xs)
        y = np.array(self.ys)
        widths = np.array([hi - lo for lo, hi in self.space])
        scale = np.maximum(widths, 1e-12)
        candidates = np.array([self._random_point() for _ in range(256)])
        d = np.linalg.norm(
            (candidates[:, None, :] - X[None, :, :]) / scale, axis=2
        )  # [cand, seen]
        w = np.exp(-((d / 0.3) ** 2))
        wsum = w.sum(axis=1)
        interp = np.where(wsum > 1e-12, (w @ y) / np.maximum(wsum, 1e-12), y.mean())
        nearest = d.min(axis=1)
        acq = interp - self.exploration * (y.std() + 1e-9) * nearest
        return list(candidates[int(np.argmin(acq))])

    def tell(self, x: list[float], y: float) -> None:
        if self._sk is not None:  # pragma: no cover
            self._sk.tell(list(x), float(y))
        self.xs.append(np.asarray(x, dtype=float))
        self.ys.append(float(y))

    @property
    def best(self) -> tuple[list[float], float]:
        i = int(np.argmin(self.ys))
        return list(self.xs[i]), self.ys[i]

    @property
    def best_i(self) -> int:
        return int(np.argmin(self.ys))
