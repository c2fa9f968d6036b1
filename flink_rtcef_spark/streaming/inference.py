"""Streaming CEP: the keyed engine path as a Structured Streaming
stateful operator.

The Flink reference keeps 12 ValueStates per key inside a
KeyedBroadcastProcessFunction (WayebEngine.java:102-118, 307-313); the
run state that actually crosses checkpoints is the quintuple
(configuration/state, buffer, match, counter, paused).  Here the same
state rides in ``applyInPandasWithState``: per key a tuple
(dfa_state, counter, min_counter, min_ts, n_matched), advanced by the
same int-array loop the batch operator uses.

Ordering semantics: Flink guarantees per-key order; Spark orders within
a microbatch by explicit sort, and the event-time watermark bounds
cross-batch disorder (late rows beyond the watermark are dropped by the
engine) — the A6-parity note of SURVEY.md §7.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_rtcef_spark.plans.compiler import CompiledPattern, transition_tables

STATE_SCHEMA = (
    "state int, counter long, min_counter long, min_ts long, n_matched int, "
    "last_ts long"
)
OUTPUT_SCHEMA = (
    "key string, detection_event_id long, detection_ts long, counter long, "
    "min_counter long, n_matched int"
)


_DETECT_COLUMNS = [
    "key",
    "detection_event_id",
    "detection_ts",
    "counter",
    "min_counter",
    "n_matched",
]


def _with_event_time(stream_df: DataFrame, ts_col: str):
    """(df, event_time_col) with a watermark-able TIMESTAMP column.

    TIMESTAMP passes through; TIMESTAMP_NTZ is re-tagged
    wall-clock-as-UTC via the tz-free interval expression
    (sources.io.ntz_as_utc — a plain cast would shift on non-UTC
    sessions); numeric epoch-seconds get ``timestamp_seconds``.
    """
    from flink_rtcef_spark.sources.io import ntz_as_utc

    dtype = dict(stream_df.dtypes).get(ts_col)
    if dtype == "timestamp":
        return stream_df, ts_col
    if dtype == "timestamp_ntz":
        converted = stream_df.withColumn(
            "__event_time", ntz_as_utc(ts_col, stream_df.sparkSession)
        )
    else:
        converted = stream_df.withColumn("__event_time", F.timestamp_seconds(F.col(ts_col)))
    return converted, "__event_time"


def _make_detect_runner(compiled: CompiledPattern):
    """One key's run over a sequence of pandas batches using the SAME
    kernels as BatchCEP (operators/cep.py): the vectorized
    prefix-composition scan for windowless small automata, the
    O(1)-per-event segment loop otherwise.  Tables are built once per
    worker (closure), not per key.  The runner returns (rows, carry)
    with carry = (state, counter, min_counter, min_ts, n_matched)."""
    import numpy as np

    from flink_rtcef_spark.operators.cep import (
        _run_sdfa_batch_vectorized,
        _run_sdfa_segment,
    )

    delta, take, finals = transition_tables(compiled.sdfa)
    window = compiled.window
    window_type = compiled.window_type
    resets = compiled.reset_symbols()
    vectorized = window == 0 and delta.shape[0] <= 64

    def run(key, pdf_iter, carry):
        out: list[tuple] = []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            syms = pdf["symbol"].to_numpy()
            tss = pdf["ts"].to_numpy()
            ids = pdf["event_id"].to_numpy()
            if vectorized:
                keys = np.full(len(syms), key, dtype=object)
                rows, (_, carry) = _run_sdfa_batch_vectorized(
                    keys, syms, tss, ids, delta, take, finals, resets,
                    carry_key=key if carry is not None else None, carry=carry,
                )
                out.extend(rows)
            else:
                rows, carry = _run_sdfa_segment(
                    syms, tss, ids, delta, take, finals, window, window_type,
                    resets, carry,
                )
                out.extend((key, *r) for r in rows)
        return out, (carry or (0, 0, -1, -1, 0))

    return run


def _arm_ttl(state: GroupState, ttl_ms: int, clock: str, max_ts: int) -> None:
    """Arm the key's expiry: event clock (default — Flink timer parity,
    the reference reclaims runs when the EVENT time advances past
    last-event + ttl, ERFEngine.scala:213-216) or wall clock."""
    if clock == "event":
        # the timeout must sit strictly after the current watermark or
        # Spark rejects it; an idle key with a stale max_ts expires on
        # the very next microbatch, which is exactly Flink's semantics
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts + ttl_ms, wm + 1))
    else:
        state.setTimeoutDuration(ttl_ms)


def _expired_on_event_clock(
    state: GroupState, ttl_ms: int, clock: str, last_ts: int
) -> bool:
    """Spark's EventTimeTimeout only fires for keys with NO data in the
    firing batch; a key whose next event arrives in that same batch
    would wrongly see its stale state as live.  Flink's timer fires on
    watermark passage regardless, so the semantic expiry is enforced
    here: state whose last event is more than ttl behind the current
    watermark is dead before the new rows are processed.  The timeout
    mechanism still reclaims memory for keys that never return."""
    if ttl_ms <= 0 or clock != "event" or last_ts < 0:
        return False
    return state.getCurrentWatermarkMs() > last_ts + ttl_ms


def make_stateful_fn(
    compiled: CompiledPattern, state_ttl_ms: int = 0, ttl_clock: str = "event"
):
    runner = _make_detect_runner(compiled)

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # run expiration (F3, RunPool.runsCollect / ERFEngine.scala
        # :213-216): idle keys are reclaimed when the chosen clock
        # passes last-event + ttl
        if state_ttl_ms > 0 and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=_DETECT_COLUMNS)
            return
        carry, last_ts = None, -1
        if state.exists:
            *carry5, last_ts = state.get
            carry = tuple(carry5)
            if _expired_on_event_clock(state, state_ttl_ms, ttl_clock, last_ts):
                carry, last_ts = None, -1
        max_ts = [last_ts]

        def observed(it):
            for pdf in it:
                if len(pdf):
                    max_ts[0] = max(max_ts[0], int(pdf["ts"].max()))
                yield pdf

        out, carry = runner(key[0], observed(pdf_iter), carry)
        state.update((*(int(x) for x in carry), int(max_ts[0])))
        if state_ttl_ms > 0:
            _arm_ttl(state, state_ttl_ms, ttl_clock, max_ts[0])
        yield pd.DataFrame(out, columns=_DETECT_COLUMNS)

    return fn


FORECAST_STATE_SCHEMA = "state int, counter long, last_ts long"
FORECAST_OUTPUT_SCHEMA = (
    "key string, ts long, event_id long, counter long, is_detection boolean, "
    "prob double, start_ctr long, end_ctr long, positive boolean"
)


def make_forecast_stateful_fn(
    spst,
    method: str,
    confidence_threshold: float,
    spread: int,
    state_ttl_ms: int = 0,
    ttl_clock: str = "event",
):
    """Streaming twin of ForecastCEP: per-key virtual state + counter in
    GroupState, forecasts via the SAME _run_forecast_segment kernel the
    batch operator uses — the reference's online inference path
    (WayebEngine.processElement:225-316) as a Structured Streaming
    operator.  Run expiry follows the same event-clock TTL as the
    detection path (the reference expires the run the forecaster rides,
    ERFEngine.scala:213-216 — forecast state is run state)."""
    from flink_rtcef_spark.operators.forecast import (
        FORECAST_COLUMNS,
        _run_forecast_segment,
    )

    main_tables = (
        spst.delta,
        spst.finals,
        spst.started,
        spst.forecast_table(method, confidence_threshold, spread),
        spst.compiled.reset_symbols(),
    )

    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state_ttl_ms > 0 and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=FORECAST_COLUMNS)
            return
        if state.exists:
            st, counter, last_ts = state.get
            if _expired_on_event_clock(state, state_ttl_ms, ttl_clock, last_ts):
                st, counter, last_ts = 0, 0, -1
        else:
            st, counter, last_ts = 0, 0, -1
        frames = []
        max_ts = last_ts
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            max_ts = max(max_ts, int(pdf["ts"].max()))
            frame, (st, counter, _) = _run_forecast_segment(
                key[0],
                pdf["symbol"].to_numpy(),
                pdf["ts"].to_numpy(),
                pdf["event_id"].to_numpy(),
                (st, counter, True),
                main_tables,
            )
            frames.append(frame)
        state.update((int(st), int(counter), int(max_ts)))
        if state_ttl_ms > 0:
            _arm_ttl(state, state_ttl_ms, ttl_clock, max_ts)
        yield (
            pd.concat(frames)
            if frames
            else pd.DataFrame(columns=FORECAST_COLUMNS)
        )

    return fn


def streaming_forecasts(
    stream_df: DataFrame,
    spst,
    key_col: str | None = None,
    ts_col: str = "timestamp",
    id_col: str = "id",
    watermark: str = "60 seconds",
    method: str = "classify_nextk",
    confidence_threshold: float = 0.5,
    spread: int = 5,
    state_ttl_ms: int = 0,
    ttl_clock: str = "event",
) -> DataFrame:
    """Streaming recognition + forecasting (detections and forecasts in
    one append stream, split by is_detection).  ``state_ttl_ms`` > 0
    expires idle run/forecast state — event clock by default, as in
    streaming_detections."""
    compiled = spst.compiled
    key = key_col or compiled.partition_by
    with_event_time, et_col = _with_event_time(stream_df, ts_col)
    cols = [
        F.col(key).cast("string").alias("key"),
        F.unix_millis(F.col(et_col)).alias("ts"),
        F.col(id_col).alias("event_id"),
        compiled.symbol_column().alias("symbol"),
    ]
    if state_ttl_ms > 0 and ttl_clock == "event":
        # EventTimeTimeout requires the watermarked column to survive
        cols.append(F.col(et_col).alias("__watermark_time"))
    sym = with_event_time.withWatermark(et_col, watermark).select(*cols)
    return sym.groupBy("key").applyInPandasWithState(
        make_forecast_stateful_fn(
            spst, method, confidence_threshold, spread, state_ttl_ms, ttl_clock
        ),
        outputStructType=FORECAST_OUTPUT_SCHEMA,
        stateStructType=FORECAST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_timeout_conf(state_ttl_ms, ttl_clock),
    )


def streaming_detections_event_ttl(
    stream_df: DataFrame,
    compiled: CompiledPattern,
    key_col: str | None = None,
    ts_col: str = "timestamp",
    id_col: str = "id",
    watermark: str = "60 seconds",
    state_ttl_ms: int = 0,
) -> DataFrame:
    """streaming_detections on the Spark 4.1 transformWithStateInPandas
    runtime: the same shared batch kernel, with run expiration on EVENT
    time via explicit timers.  The exercised default
    (streaming_detections with ttl_clock="event", i.e.
    applyInPandasWithState + EventTimeTimeout) already has the
    reference's event-clock semantics; this variant exists for the
    newer arbitrary-state runtime (multiple named states, timer lists).

    Each microbatch re-arms one event-time timer per key at
    (max event ts + state_ttl_ms); when the watermark passes it the
    key's run state is dropped.  Requires the RocksDB state store
    (set spark.sql.streaming.stateStore.providerClass to
    ...state.RocksDBStateStoreProvider) and the ``protobuf`` package
    (the runtime's state-server protocol — absent in this sandbox, so
    the equivalence test skips; the applyInPandasWithState path above
    remains the exercised default)."""
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    key = key_col or compiled.partition_by
    with_event_time, et_col = _with_event_time(stream_df, ts_col)
    sym = (
        with_event_time.withWatermark(et_col, watermark)
        .select(
            F.col(key).cast("string").alias("key"),
            (F.unix_millis(F.col(et_col))).alias("ts"),
            F.col(id_col).alias("event_id"),
            compiled.symbol_column().alias("symbol"),
        )
    )

    class DetectProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("run", STATE_SCHEMA)
            self._runner = _make_detect_runner(compiled)

        def handleInputRows(
            self, key_, rows, timerValues: TimerValues
        ) -> Iterator[pd.DataFrame]:
            carry, last_ts = None, -1
            if self._state.exists():
                *carry5, last_ts = self._state.get()
                carry = tuple(carry5)
                # same in-function expiry as the default runtime: the
                # timer only fires for keys without data in the batch
                wm = timerValues.getCurrentWatermarkInMs()
                if state_ttl_ms > 0 and last_ts >= 0 and wm > last_ts + state_ttl_ms:
                    carry, last_ts = None, -1
            max_ts = [last_ts]

            def observed(it):
                for pdf in it:
                    if len(pdf):
                        max_ts[0] = max(max_ts[0], int(pdf["ts"].max()))
                    yield pdf

            out, carry = self._runner(key_[0], observed(rows), carry)
            self._state.update((*(int(x) for x in carry), int(max_ts[0])))
            if state_ttl_ms > 0 and max_ts[0] >= 0:
                # re-arm the key's single event-time timer at
                # last-event-ts + ttl (Flink timer semantics)
                for t in self._handle.listTimers():
                    self._handle.deleteTimer(t)
                self._handle.registerTimer(max_ts[0] + state_ttl_ms)
            yield pd.DataFrame(out, columns=_DETECT_COLUMNS)

        def handleExpiredTimer(
            self, key_, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            self._state.clear()
            yield pd.DataFrame([], columns=_DETECT_COLUMNS)

        def close(self) -> None:
            pass

    return sym.groupBy("key").transformWithStateInPandas(
        statefulProcessor=DetectProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime" if state_ttl_ms > 0 else "none",
    )


REGISTER_STATE_SCHEMA = "configs binary, counter long, last_ts long"


def make_register_stateful_fn(
    compiled_register, state_ttl_ms: int = 0, ttl_clock: str = "event"
):
    """Streaming twin of RegisterCEP (SREMO/NSRA): the configuration
    set — (state, valuation, window accounting) per live run — is the
    cross-batch state, pickled into a binary GroupState column.  The
    mandatory SREMO window bounds its size (at most `window` concurrent
    runs per key), so the state stays small regardless of stream length."""
    import pickle

    from flink_rtcef_spark.operators.cep_register import _run_nsra_segment

    cp = compiled_register
    table = cp.table
    finals = frozenset(cp.nsra.finals)
    start_states = cp.start_states
    window, window_type = cp.window, cp.window_type
    attrs = cp.register_attrs
    columns = [
        "key",
        "detection_event_id",
        "detection_ts",
        "counter",
        "min_counter",
        "n_matched",
    ]

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_ms > 0 and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=columns)
            return
        init, last_ts = None, -1
        if state.exists:
            blob, counter, last_ts = state.get
            init = (pickle.loads(bytes(blob)), int(counter))
            if _expired_on_event_clock(state, state_ttl_ms, ttl_clock, last_ts):
                init, last_ts = None, -1
        out = []
        max_ts = last_ts
        for pdf in pdf_iter:
            if len(pdf):
                max_ts = max(max_ts, int(pdf["ts"].max()))
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            attr_arrays = {a: pdf[a].to_numpy() for a in attrs}
            rows, init = _run_nsra_segment(
                pdf["bits"].to_numpy(),
                pdf["ts"].to_numpy(),
                pdf["event_id"].to_numpy(),
                attr_arrays, table, finals, start_states,
                window, window_type, init,
            )
            out.extend((key[0], *r) for r in rows)
        configs, counter = init if init is not None else ({}, 0)
        state.update((pickle.dumps(configs), int(counter), int(max_ts)))
        if state_ttl_ms > 0:
            _arm_ttl(state, state_ttl_ms, ttl_clock, max_ts)
        yield pd.DataFrame(out, columns=columns)

    return fn


def streaming_register_detections(
    stream_df: DataFrame,
    compiled_register,
    key_col: str | None = None,
    ts_col: str = "timestamp",
    id_col: str = "id",
    watermark: str = "60 seconds",
    state_ttl_ms: int = 0,
    ttl_clock: str = "event",
) -> DataFrame:
    """Streaming recognition for register (SREMO) patterns.  Static
    predicates fold into the JVM-side ``bits`` column exactly as in
    batch; only register comparisons run in the stateful Python loop.
    Expiry defaults to the event clock (see streaming_detections)."""
    cp = compiled_register
    key = key_col or cp.partition_by
    with_event_time, et_col = _with_event_time(stream_df, ts_col)
    cols = [
        F.col(key).cast("string").alias("key"),
        F.unix_millis(F.col(et_col)).alias("ts"),
        F.col(id_col).alias("event_id"),
        cp.bits_column().alias("bits"),
    ]
    cols += [F.col(a) for a in cp.register_attrs]
    if state_ttl_ms > 0 and ttl_clock == "event":
        cols.append(F.col(et_col).alias("__watermark_time"))
    sym = with_event_time.withWatermark(et_col, watermark).select(*cols)
    return sym.groupBy("key").applyInPandasWithState(
        make_register_stateful_fn(cp, state_ttl_ms, ttl_clock),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=REGISTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_timeout_conf(state_ttl_ms, ttl_clock),
    )


def streaming_detections(
    stream_df: DataFrame,
    compiled: CompiledPattern,
    key_col: str | None = None,
    ts_col: str = "timestamp",
    id_col: str = "id",
    watermark: str = "60 seconds",
    state_ttl_ms: int = 0,
    ttl_clock: str = "event",
) -> DataFrame:
    """Build the streaming detection DataFrame from a streaming source.

    Symbolization stays a JVM Column (identical to batch); only the
    per-key run loop is stateful Python.  The watermark mirrors the
    reference's 60 s bounded out-of-orderness (InferenceJob.java:134-137).
    ``state_ttl_ms`` > 0 reclaims idle keys (the reference's
    run-expiration, F3) — by default on the EVENT clock, matching
    Flink's event-time timers (ERFEngine.scala:213-216: a run expires
    when event time, not wall time, advances past last-event + ttl);
    ``ttl_clock="processing"`` opts into wall-clock expiry instead.
    """
    key = key_col or compiled.partition_by
    with_event_time, et_col = _with_event_time(stream_df, ts_col)
    cols = [
        F.col(key).cast("string").alias("key"),
        (F.unix_millis(F.col(et_col))).alias("ts"),
        F.col(id_col).alias("event_id"),
        compiled.symbol_column().alias("symbol"),
    ]
    if state_ttl_ms > 0 and ttl_clock == "event":
        # EventTimeTimeout requires the watermarked column to survive
        # into the stateful operator's input (4 extra bytes/row beats
        # losing the event clock)
        cols.append(F.col(et_col).alias("__watermark_time"))
    sym = with_event_time.withWatermark(et_col, watermark).select(*cols)
    return sym.groupBy("key").applyInPandasWithState(
        make_stateful_fn(compiled, state_ttl_ms, ttl_clock),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_timeout_conf(state_ttl_ms, ttl_clock),
    )


def _timeout_conf(state_ttl_ms: int, ttl_clock: str):
    """ttl_clock="processing" caveat: under trigger(availableNow=True)
    a pending ProcessingTimeTimeout keeps the query alive after the
    input is exhausted, spinning ~1 EMPTY microbatch per second of pure
    overhead until the wall timer fires — so the drain takes about as
    long as the TTL itself (measured: no-data batch 158 at t=150s with
    a 10-minute TTL).  Use the event clock (the default, and the Flink
    parity semantics — ERFEngine.scala:213-216) with availableNow
    replays; reserve the processing clock for continuously-triggered
    production streams where the query never waits to terminate."""
    if state_ttl_ms <= 0:
        return GroupStateTimeout.NoTimeout
    if ttl_clock == "event":
        return GroupStateTimeout.EventTimeTimeout
    return GroupStateTimeout.ProcessingTimeTimeout


MULTI_STATE_SCHEMA = "carries binary, last_ts long"
MULTI_OUTPUT_SCHEMA = (
    "pattern_id int, key string, detection_event_id long, detection_ts long, "
    "counter long, min_counter long, n_matched int"
)
_MULTI_COLUMNS = [
    "pattern_id", "key", "detection_event_id", "detection_ts", "counter",
    "min_counter", "n_matched",
]


def make_multi_stateful_fn(
    compiled_list, state_ttl_ms: int = 0, ttl_clock: str = "event"
):
    """All patterns advance together per key; the carry vector (one
    5-tuple per pattern) pickles into one binary GroupState column —
    the same cross-batch encoding the register path uses."""
    import pickle

    from flink_rtcef_spark.operators.cep import _run_sdfa_segment
    from flink_rtcef_spark.plans.compiler import transition_tables

    tables = [transition_tables(c.sdfa) for c in compiled_list]
    windows = [(c.window, c.window_type) for c in compiled_list]
    resets = [c.reset_symbols() for c in compiled_list]
    n_pat = len(compiled_list)

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_ms > 0 and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=_MULTI_COLUMNS)
            return
        carries: list = [None] * n_pat
        last_ts = -1
        if state.exists:
            blob, last_ts = state.get
            if _expired_on_event_clock(state, state_ttl_ms, ttl_clock, last_ts):
                last_ts = -1
            else:
                carries = pickle.loads(bytes(blob))
        out = []
        max_ts = last_ts
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            tss = pdf["ts"].to_numpy()
            ids = pdf["event_id"].to_numpy()
            max_ts = max(max_ts, int(tss.max()))
            for p in range(n_pat):
                delta, take, finals = tables[p]
                window, wtype = windows[p]
                rows, carries[p] = _run_sdfa_segment(
                    pdf[f"symbol{p}"].to_numpy(), tss, ids,
                    delta, take, finals, window, wtype, resets[p], carries[p],
                )
                out.extend((p, key[0], *r) for r in rows)
        state.update((pickle.dumps(carries), int(max_ts)))
        if state_ttl_ms > 0:
            _arm_ttl(state, state_ttl_ms, ttl_clock, max_ts)
        yield pd.DataFrame(out, columns=_MULTI_COLUMNS)

    return fn


def streaming_multi_detections(
    stream_df: DataFrame,
    compiled_list,
    key_col: str | None = None,
    ts_col: str = "timestamp",
    id_col: str = "id",
    watermark: str = "60 seconds",
    state_ttl_ms: int = 0,
    ttl_clock: str = "event",
) -> DataFrame:
    """Streaming twin of MultiPatternCEP (operators/multi_cep.py): the
    reference feeds every event to ALL loaded FSMs
    (ERFEngine.scala:204); here every pattern contributes its own
    JVM-side symbol column, the stream shuffles ONCE on the shared key,
    and one stateful pass advances all automata — detections tagged
    with pattern_id.  Run expiry follows the event clock as in
    streaming_detections."""
    if not compiled_list:
        raise ValueError("need at least one pattern")
    keys = {c.partition_by for c in compiled_list if c.partition_by}
    if key_col is None:
        if len(keys) != 1:
            raise ValueError(
                f"patterns disagree on partitionBy ({keys}); pass key_col"
            )
        key_col = keys.pop()
    with_event_time, et_col = _with_event_time(stream_df, ts_col)
    cols = [
        F.col(key_col).cast("string").alias("key"),
        F.unix_millis(F.col(et_col)).alias("ts"),
        F.col(id_col).alias("event_id"),
    ]
    cols += [
        c.symbol_column().alias(f"symbol{p}") for p, c in enumerate(compiled_list)
    ]
    if state_ttl_ms > 0 and ttl_clock == "event":
        # EventTimeTimeout requires the watermarked column to survive
        cols.append(F.col(et_col).alias("__watermark_time"))
    sym = with_event_time.withWatermark(et_col, watermark).select(*cols)
    return sym.groupBy("key").applyInPandasWithState(
        make_multi_stateful_fn(compiled_list, state_ttl_ms, ttl_clock),
        outputStructType=MULTI_OUTPUT_SCHEMA,
        stateStructType=MULTI_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_timeout_conf(state_ttl_ms, ttl_clock),
    )
