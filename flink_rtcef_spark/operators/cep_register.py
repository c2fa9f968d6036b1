"""CEP over register patterns (SREMO/NSRA, B14): per-key ordered
nondeterministic execution with configurations (state, valuation).

Reference semantics: fsm/symbolic/sra/SRA.scala
(yieldsSuccessorConfigWithEpsilon — configuration sets advanced per
event), Configuration.scala (state + valuation), Valuation.scala
(register -> stored event), with the SREMO window mandatory
(docs/lang.md:129-135).  A run terminates when it reaches a final
state (full match) or when its window expires.

Physical strategy mirrors operators/cep.py: hash-repartition on the
key + sortWithinPartitions + ONE mapInPandas pass walking key segments,
carrying open-key configurations across Arrow batches.  The shuffle
payload is (key, ts, id, bits, <register attrs>): every register-free
predicate is folded JVM-side into the bit-encoded ``bits`` column, so
Python evaluates only the register comparisons.

Scale: live configurations per key are window-bounded (count window w
-> at most w concurrent runs), so per-key state is O(w·|registers|)
regardless of stream length; the shuffle is the same single hash
exchange as the deterministic operator.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_rtcef_spark.operators.cep import ts_millis
from flink_rtcef_spark.plans.nsra import CompiledRegisterPattern

DETECTION_COLUMNS = [
    "key",
    "detection_event_id",
    "detection_ts",
    "counter",
    "min_counter",
    "n_matched",
]


def _val_key(valuation: dict) -> tuple:
    return tuple(
        (reg, tuple(sorted((k, v) for k, v in stored.items())))
        for reg, stored in sorted(valuation.items())
    )


def _run_nsra_segment(
    bits,
    ts,
    event_ids,
    attr_arrays: dict,
    table: dict,
    finals: frozenset,
    start_states: tuple,
    window: int,
    window_type: str,
    init=None,
    enumerate_matches: bool = False,
):
    """Config-set run over one key segment.  ``init`` carries the
    previous batch's (configs, counter) for the same key.  Returns
    (detections, carry).  configs: {(state, val_key, min_counter,
    matched): (valuation, min_ts, n_matched)} — ``matched`` is the
    tuple of TAKE-event ids (Match.scala:17-54's events list) and is
    always () unless ``enumerate_matches``.

    Detection rows: (event_id, ts, counter, min_counter, n_matched)
    — one per event with >=1 full match, earliest-start first; with
    ``enumerate_matches``, one row PER full match with its matched-id
    list appended (the reference's nondeterministic run path,
    ERFEngine.processEventAtRunNonDet:295, enumerates every match)."""
    out = []
    configs, counter = init if init is not None else ({}, 0)
    attr_names = list(attr_arrays)
    n = len(bits)
    for i in range(n):
        counter += 1
        b = int(bits[i])
        t = int(ts[i])
        eid = int(event_ids[i])
        ev = {a: attr_arrays[a][i] for a in attr_names}
        # seed a fresh run at every event (streaming Sigma*;f semantics)
        for s in start_states:
            configs.setdefault((s, (), -1, ()), ({}, -1, 0))
        nxt: dict = {}
        best = None  # (min_counter, -n_matched) of accepting configs
        emitted: set = set()  # matched tuples emitted at this event
        for (state, vkey, min_counter, matched), (
            valuation,
            min_ts,
            n_matched,
        ) in configs.items():
            # window check (Run.checkRuntimeWindow:221-238 analogue):
            # an expired run simply dies — nondeterministic runs don't
            # restart, the per-event seeding covers that.
            if window > 0 and min_counter != -1:
                span = (counter - min_counter) if window_type == "count" else (t - min_ts)
                if span >= window:
                    continue
            for guard, dst_closure, take, writes in table.get(state, ()):
                if not guard(b, ev, valuation):
                    continue
                if writes:
                    stored = {a: ev[a] for a in attr_names}
                    new_val = dict(valuation)
                    for r in writes:
                        new_val[r] = stored
                else:
                    new_val = valuation
                if take:
                    nmc = min_counter if min_counter != -1 else counter
                    nmt = min_ts if min_counter != -1 else t
                    nnm = n_matched + 1
                    nmatched = matched + (eid,) if enumerate_matches else ()
                else:
                    nmc, nmt, nnm = min_counter, min_ts, n_matched
                    nmatched = matched
                for dst in dst_closure:
                    if dst in finals:
                        if enumerate_matches:
                            if nmatched not in emitted:
                                emitted.add(nmatched)
                                out.append(
                                    (eid, t, counter, int(nmc), int(nnm), list(nmatched))
                                )
                        else:
                            cand = (nmc, -nnm)
                            if best is None or cand < best:
                                best = cand
                        continue  # full match: the run terminates
                    k = (dst, _val_key(new_val) if writes else vkey, nmc, nmatched)
                    prev = nxt.get(k)
                    if prev is None or nnm > prev[2]:
                        nxt[k] = (new_val, nmt, nnm)
        configs = nxt
        if not enumerate_matches and best is not None:
            out.append((eid, t, counter, int(best[0]), int(-best[1])))
    return out, (configs, counter)


class RegisterCEP:
    """Batch recognition for register (SREMO) patterns.

    >>> cp = compile_register_pattern(';(IsEventTypePredicate(view)["x"],'
    ...     '^(IsEventTypePredicate(click),GTAttr(value,"x")))'
    ...     '{partitionBy:user_id}{window:2}')
    >>> RegisterCEP(cp, ts_col="ts", id_col="event_id").detections(events)
    """

    def __init__(
        self,
        compiled: CompiledRegisterPattern,
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
        ts_ms = ts_millis(df, self.ts_col)
        cols = [
            F.col(self.key_col).alias("key"),
            ts_ms.alias("ts"),
            F.col(self.id_col).alias("event_id"),
            self.compiled.bits_column().alias("bits"),
        ]
        cols += [F.col(a) for a in self.compiled.register_attrs]
        return df.select(*cols)

    def detections(self, df: DataFrame) -> DataFrame:
        """One row per event completing >=1 full match (earliest start
        reported) — mirrors the deterministic path's output shape."""
        return self._run(df, enumerate_matches=False)

    def matches(self, df: DataFrame) -> DataFrame:
        """Match ENUMERATION (F2, the nondeterministic run path): one
        row per full match with ``matched_event_ids`` = the TAKE-event
        id list (Match.scala events list).  Combinatorial under
        skip-till selection — same inherent cost as the reference's
        non-det runs; the window bounds it."""
        return self._run(df, enumerate_matches=True)

    def _run(self, df: DataFrame, enumerate_matches: bool) -> DataFrame:
        sym_df = self.symbolized(df)
        cp = self.compiled
        table = cp.table
        finals = frozenset(cp.nsra.finals)
        start_states = cp.start_states
        window, window_type = cp.window, cp.window_type
        attrs = cp.register_attrs
        key_type = dict(df.dtypes)[self.key_col]
        schema = (
            f"key {key_type}, detection_event_id long, detection_ts long, "
            "counter long, min_counter long, n_matched int"
        )
        columns = list(DETECTION_COLUMNS)
        if enumerate_matches:
            schema += ", matched_event_ids array<long>"
            columns = columns + ["matched_event_ids"]

        def run_partition(batches):
            open_key = None
            carry = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                keys = pdf["key"].to_numpy()
                bits = pdf["bits"].to_numpy()
                tss = pdf["ts"].to_numpy()
                ids = pdf["event_id"].to_numpy()
                attr_arrays = {a: pdf[a].to_numpy() for a in attrs}
                out = []
                start = 0
                n = len(keys)
                while start < n:
                    end = start
                    k = keys[start]
                    while end < n and keys[end] == k:
                        end += 1
                    init = carry if (open_key is not None and k == open_key) else None
                    seg_attrs = {a: arr[start:end] for a, arr in attr_arrays.items()}
                    rows, carry = _run_nsra_segment(
                        bits[start:end], tss[start:end], ids[start:end],
                        seg_attrs, table, finals, start_states,
                        window, window_type, init,
                        enumerate_matches=enumerate_matches,
                    )
                    out.extend((k, *r) for r in rows)
                    open_key = k
                    start = end
                yield pd.DataFrame(out, columns=columns)

        return (
            sym_df.repartition("key")
            .sortWithinPartitions("key", "ts", "event_id")
            .mapInPandas(run_partition, schema=schema)
        )
