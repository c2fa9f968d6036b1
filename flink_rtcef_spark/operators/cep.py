"""The CEP physical operator: per-key ordered SDFA execution.

This is the one operator Spark genuinely lacks (SURVEY.md §4 "what must
be custom").  Semantics follow the reference's deterministic runtime
(fsm/runtime/Run.scala:161-297, processEventDet/emitForecasts):

- one run per partition-key, state persists across events;
- each event advances the automaton by its (JVM-computed) symbol;
- a TAKE transition adds the event to the current match;
- entering a final state emits a detection and clears the match
  (state itself is NOT reset — the streaming self-loop/count-policy
  transform governs continuation);
- a window violation (count: counter span; time: timestamp span —
  Run.checkRuntimeWindow:221-238) kills the run: state restarts and
  the violating event is re-processed from the start state.

Spark shape: symbolization is a Column (operators stay JVM-side until
the int symbol is computed), then ``groupBy(key).applyInPandas`` runs
the int-array DFA loop per key.  At scale this is one hash shuffle on
the partition key — the same distribution Flink's keyBy performs — and
the per-group payload is a single int column, not the full event row.

Scale note: the Python loop is per-key linear and allocation-free on
numpy int arrays; state is 3 machine words per key.  Skewed keys are
the same problem Flink has; AQE skew handling does not apply inside a
group, so extremely hot keys should be pre-split upstream when the
pattern allows (documented limitation, as in the reference).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_rtcef_spark.plans.compiler import CompiledPattern, transition_tables

DETECTION_SCHEMA_SUFFIX = (
    "detection_event_id long, detection_ts long, counter long, min_counter long, n_matched int"
)


def _run_sdfa(
    symbols: np.ndarray,
    ts: np.ndarray,
    event_ids: np.ndarray,
    delta: np.ndarray,
    take: np.ndarray,
    finals: np.ndarray,
    window: int,
    window_type: str,
    reset_symbols: frozenset = frozenset(),
) -> list[tuple[int, int, int, int, int]]:
    """The deterministic run loop.  Returns detections as
    (event_id, ts, counter, min_counter, n_matched)."""
    out: list[tuple[int, int, int, int, int]] = []
    state = 0
    min_counter = -1
    min_ts = -1
    n_matched = 0
    counter = 0
    n = len(symbols)
    i = 0
    while i < n:
        sym = symbols[i]
        counter += 1
        if sym in reset_symbols:
            # ResetEvent: clear FSM state and match, consume the event
            # without a transition (Run.scala:309-323)
            state = 0
            min_counter, min_ts, n_matched = -1, -1, 0
            i += 1
            continue
        # window check before the transition (Run.scala:221-238): span
        # counted from the first matched event; violation kills the run.
        if window > 0 and min_counter != -1:
            span = (counter - min_counter) if window_type == "count" else (ts[i] - min_ts)
            if span >= window:
                state = 0
                min_counter = -1
                min_ts = -1
                n_matched = 0
                # fall through: event is processed by the fresh run
        nxt = int(delta[state, sym])
        if take[state, sym]:
            if min_counter == -1:
                min_counter = counter
                min_ts = ts[i]
            n_matched += 1
        if finals[nxt]:
            out.append((int(event_ids[i]), int(ts[i]), counter, min_counter, n_matched))
            # full match: clear the match, keep the state
            # (Run.emitForecasts: matchedEvents.clear(), counter runs on)
            min_counter = -1
            min_ts = -1
            n_matched = 0
        state = nxt
        i += 1
    return out


class BatchCEP:
    """Batch Complex Event Recognition over a DataFrame.

    >>> cep = BatchCEP(compiled, key_col="user_id", ts_col="ts", id_col="event_id")
    >>> detections = cep.detections(events_df)
    """

    def __init__(
        self,
        compiled: CompiledPattern,
        key_col: str | None = None,
        ts_col: str = "timestamp",
        id_col: str = "id",
    ):
        self.compiled = compiled
        self.key_col = key_col or compiled.partition_by
        if not self.key_col:
            raise ValueError("pattern needs {partitionBy:...} or an explicit key_col")
        self.ts_col = ts_col
        self.id_col = id_col

    def symbolized(self, df: DataFrame) -> DataFrame:
        """Project to (key, ts_millis, id, symbol) — everything heavier
        stays JVM-side and the shuffle payload is minimal."""
        ts = F.col(self.ts_col)
        ts_ms = (
            F.unix_millis(ts)
            if dict(df.dtypes).get(self.ts_col) in ("timestamp", "timestamp_ntz")
            else ts.cast("long")
        )
        return df.select(
            F.col(self.key_col).alias("key"),
            ts_ms.alias("ts"),
            F.col(self.id_col).alias("event_id"),
            self.compiled.symbol_column().alias("symbol"),
        )

    def detections(self, df: DataFrame) -> DataFrame:
        """(key, detection_event_id, detection_ts, counter, min_counter,
        n_matched) — one row per full match, per key."""
        sym_df = self.symbolized(df)
        delta, take, finals = transition_tables(self.compiled.sdfa)
        window = self.compiled.window
        window_type = self.compiled.window_type
        resets = self.compiled.reset_symbols()
        key_type = dict(df.dtypes)[self.key_col]
        schema = f"key {key_type}, {DETECTION_SCHEMA_SUFFIX}"

        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            rows = _run_sdfa(
                pdf["symbol"].to_numpy(),
                pdf["ts"].to_numpy(),
                pdf["event_id"].to_numpy(),
                delta,
                take,
                finals,
                window,
                window_type,
                resets,
            )
            key = pdf["key"].iloc[0]
            return pd.DataFrame(
                [(key, *r) for r in rows],
                columns=[
                    "key",
                    "detection_event_id",
                    "detection_ts",
                    "counter",
                    "min_counter",
                    "n_matched",
                ],
            )

        return sym_df.groupBy("key").applyInPandas(run_group, schema=schema)
