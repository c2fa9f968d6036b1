"""Markov-order selection by held-out likelihood
(estimator/OrderEstimator/CrossValEstimator.scala analogue, E10).

Candidate orders share ONE distributed counting pass: a CST built at
max(orders)+1 contains the counts for every lower order, so each
candidate only re-runs the (driver-side, cheap) PST learner.  Scoring
is the held-out per-symbol log-loss of each PST over the validation
slice — computed distributed via the same lag-window contexts used for
training.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from flink_rtcef_spark.models.cst import cst_from_spark
from flink_rtcef_spark.models.pst import PredictionSuffixTree, learn_pst


def _heldout_logloss(
    val_df: DataFrame,
    pst: PredictionSuffixTree,
    order: int,
    key_col: str = "key",
    ts_col: str = "ts",
    id_col: str = "event_id",
    sym_col: str = "symbol",
) -> float:
    """Mean -log P(sym | context) over the validation stream.  Contexts
    come from lag windows; the (small) PST travels in the closure and
    scoring is a vectorized pandas pass per partition."""
    import numpy as np
    import pandas as pd

    w = W.partitionBy(key_col).orderBy(ts_col, id_col)
    cols = [F.col(sym_col).cast("int").alias("s0")] + [
        F.lag(F.col(sym_col).cast("int"), i).over(w).alias(f"s{i}")
        for i in range(1, order + 1)
    ]
    ctx_df = val_df.select(*cols)

    names = [f"s{i}" for i in range(order + 1)]

    def score(batches):
        for pdf in batches:
            arr = pdf[names].to_numpy()
            out = np.zeros(len(arr))
            for r in range(len(arr)):
                sym = int(arr[r, 0])
                ctx = tuple(
                    int(v) for v in arr[r, 1:] if not pd.isna(v)
                )
                p = pst.prob(sym, ctx)
                out[r] = -math.log(max(p, 1e-12))
            yield pd.DataFrame({"nll": out})

    scored = ctx_df.mapInPandas(score, schema="nll double")
    row = scored.agg(F.avg("nll").alias("m")).collect()[0]
    return float(row["m"])


def select_order(
    sym_df: DataFrame,
    n_symbols: int,
    orders: list[int],
    train_frac: float = 0.7,
    pmin: float = 1e-4,
    alpha: float = 0.0,
    gamma_min: float = 1e-3,
    r: float = 1.05,
    ts_col: str = "ts",
    **cols,
) -> tuple[int, dict[int, float]]:
    """Pick the order minimizing held-out log-loss.  Returns
    (best_order, {order: logloss})."""
    max_order = max(orders)
    split = sym_df.approxQuantile(ts_col, [train_frac], 0.01)[0]
    train = sym_df.filter(F.col(ts_col) <= split)
    val = sym_df.filter(F.col(ts_col) > split)
    cst = cst_from_spark(train, max_order, ts_col=ts_col, **cols)
    symbols = list(range(n_symbols))
    losses: dict[int, float] = {}
    for order in orders:
        pst = learn_pst(
            cst, symbols, order, pmin, alpha, gamma_min, r, with_missing=True
        )
        losses[order] = _heldout_logloss(val, pst, order, ts_col=ts_col)
    best = min(losses, key=losses.get)
    return best, losses
