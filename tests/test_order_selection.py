"""Order selection must recover the true order of a synthetic
higher-order Markov source."""

from __future__ import annotations

import random

import pandas as pd

from flink_rtcef_spark.models.order_selection import select_order


def test_selects_true_order(spark):
    """Source: s_t depends on s_{t-2} (order 2): alphabet {0,1},
    P(s_t = s_{t-2}) = 0.9.  Order 0/1 models can't capture it; order 2
    should win on held-out log-loss."""
    rng = random.Random(13)
    rows = []
    for key in ("k1", "k2"):
        seq = [rng.randint(0, 1), rng.randint(0, 1)]
        for t in range(2, 3000):
            if rng.random() < 0.9:
                seq.append(seq[t - 2])
            else:
                seq.append(1 - seq[t - 2])
        rows += [(key, t + 1, t, s) for t, s in enumerate(seq)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "ts", "event_id", "symbol"])
    )
    best, losses = select_order(df, n_symbols=2, orders=[0, 1, 2, 3])
    assert best in (2, 3)  # order 3 can match 2; orders 0/1 must lose
    assert losses[2] < losses[1] - 0.05
    assert losses[2] < losses[0] - 0.05
    # order 3 shouldn't be much better than 2 (no extra structure)
    assert abs(losses[3] - losses[2]) < 0.05
