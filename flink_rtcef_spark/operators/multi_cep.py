"""Single-pass multi-pattern CEP.

The reference feeds every event to ALL loaded FSMs
(ERFEngine.scala:204); a naive Spark mapping runs one operator per
pattern = N scans + N shuffles of the same stream.  This operator runs
all patterns in ONE pass: each pattern contributes its own (small int)
symbol column, the stream shuffles once on the shared partition key,
and the per-key walk advances all N automata together, emitting
detections tagged with pattern_id.

Constraint: patterns must share the partition key (the reference's
engine has the same constraint per job — keyBy happens once).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_rtcef_spark.plans.compiler import CompiledPattern, transition_tables
from flink_rtcef_spark.operators.cep import _run_sdfa_segment, ts_millis


class MultiPatternCEP:
    def __init__(
        self,
        compiled: list[CompiledPattern],
        key_col: str | None = None,
        ts_col: str = "timestamp",
        id_col: str = "id",
    ):
        if not compiled:
            raise ValueError("need at least one pattern")
        keys = {c.partition_by for c in compiled if c.partition_by}
        if key_col is None:
            if len(keys) != 1:
                raise ValueError(
                    f"patterns disagree on partitionBy ({keys}); pass key_col"
                )
            key_col = keys.pop()
        self.compiled = compiled
        self.key_col = key_col
        self.ts_col = ts_col
        self.id_col = id_col

    def symbolized(self, df: DataFrame) -> DataFrame:
        ts_ms = ts_millis(df, self.ts_col)
        cols = [
            F.col(self.key_col).alias("key"),
            ts_ms.alias("ts"),
            F.col(self.id_col).alias("event_id"),
        ]
        cols += [
            c.symbol_column().alias(f"symbol{p}") for p, c in enumerate(self.compiled)
        ]
        return df.select(*cols)

    def detections(self, df: DataFrame) -> DataFrame:
        """(pattern_id, key, detection_event_id, detection_ts, counter,
        min_counter, n_matched) — all patterns, one scan, one shuffle."""
        sym_df = self.symbolized(df)
        tables = [transition_tables(c.sdfa) for c in self.compiled]
        windows = [(c.window, c.window_type) for c in self.compiled]
        resets = [c.reset_symbols() for c in self.compiled]
        n_pat = len(self.compiled)
        key_type = dict(df.dtypes)[self.key_col]
        schema = (
            f"pattern_id int, key {key_type}, detection_event_id long, "
            "detection_ts long, counter long, min_counter long, n_matched int"
        )
        columns = [
            "pattern_id",
            "key",
            "detection_event_id",
            "detection_ts",
            "counter",
            "min_counter",
            "n_matched",
        ]

        def run_partition(batches):
            open_key = None
            carries: list = [None] * n_pat
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                keys = pdf["key"].to_numpy()
                tss = pdf["ts"].to_numpy()
                ids = pdf["event_id"].to_numpy()
                sym_arrays = [pdf[f"symbol{p}"].to_numpy() for p in range(n_pat)]
                out = []
                start, n = 0, len(keys)
                while start < n:
                    end = start
                    k = keys[start]
                    while end < n and keys[end] == k:
                        end += 1
                    fresh = not (open_key is not None and k == open_key)
                    for p in range(n_pat):
                        delta, take, finals = tables[p]
                        window, wtype = windows[p]
                        init = None if fresh else carries[p]
                        rows, carry = _run_sdfa_segment(
                            sym_arrays[p][start:end],
                            tss[start:end],
                            ids[start:end],
                            delta, take, finals, window, wtype, resets[p],
                            init,
                        )
                        out.extend((p, k, *r) for r in rows)
                        carries[p] = carry
                    open_key = k
                    start = end
                yield pd.DataFrame(out, columns=columns)

        return (
            sym_df.repartition("key")
            .sortWithinPartitions("key", "ts", "event_id")
            .mapInPandas(run_partition, schema=schema)
        )
